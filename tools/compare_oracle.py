#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name> subdir (Spark result parquet) with an entry in
oracle_sql.json, runs the oracle SQL in DuckDB over the same fixture
tables, then compares row count, column names, and a canonical hash
(columns sorted by name, rows sorted, doubles rounded to 6 digits,
NULLs normalized).
"""
import sys, json, os, math
import duckdb

def canon(rows, cols):
    # sort columns by name, normalize values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{round(v, 6):.6f}"
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return hash(tuple(out)), out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        path = os.path.join(out_dir, name)
        try:
            s_cols, s_rows = None, None
            rel = con.execute(f"SELECT * FROM '{path}/*.parquet'")
            s_cols = [d[0] for d in rel.description]
            s_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1; continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(s_rows)})")
            continue
        try:
            rel = con.execute(oracles[name])
            o_cols = [d[0] for d in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1; continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
        if not problems:
            h1, c1 = canon(s_rows, s_cols)
            h2, c2 = canon(o_rows, o_cols)
            if h1 != h2:
                diff = [(a, b) for a, b in zip(c1, c2) if a != b][:3]
                problems.append(f"hash mismatch, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} PASS, {n_fail} FAIL, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
