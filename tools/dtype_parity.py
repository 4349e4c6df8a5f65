#!/usr/bin/env python3
"""Driver-parity dtype check between Spark verify output and DuckDB oracles.

Usage: python3 tools/dtype_parity.py <sfDir> <verifyOutDir> [prefix]
       [--artifact <path>]

--artifact writes {"flags":N,"checked":M} to <path> (e.g.
bench_results/dtype_r13.json) so graft.Bench can surface the result in
the round artifact's "dtype" field; Bench marks it stale when checked
is below the registry size, so a prefix-filtered artifact can't
masquerade as a full sweep.

The driver's comparator goes through pandas. Integer-valued columns can
silently change KIND on one side only — e.g. DuckDB's sum(INTEGER) /
sum(BIGINT) returns HUGEINT, which pandas has no integer dtype for, so
`.df()` converts it to float64; the Spark parquet side stays int64. A
value-identical pair then formats as "3.000000" vs "3" and hash-fails
in the driver while fetchall()-based compares (tools/compare_oracle.py)
see Python ints on both sides and pass.

This tool loads BOTH sides the pandas way and flags any column whose
dtype KIND (int / float / object / datetime / bool) differs, plus any
hash mismatch under a pandas-string canonicalization. Run it after
Verify; zero output lines = driver-safe.
"""
import sys, os, json, math
import duckdb
import pandas as pd

KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
        "M": "datetime", "O": "object", "m": "timedelta"}


def kind(dtype):
    return KIND.get(dtype.kind, dtype.kind)


def canon_df(df):
    cols = sorted(df.columns)
    out = []
    for _, r in df[cols].iterrows():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{round(v, 6):.6f}")
            elif v is None or v is pd.NaT:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    args = list(sys.argv[1:])
    artifact = None
    if "--artifact" in args:
        i = args.index("--artifact")
        artifact = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    prefix = args[2] if len(args) > 2 else ""
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and d.startswith(prefix))
    n_flag = 0
    for name in names:
        if name not in oracles:
            continue
        try:
            s_df = con.execute(
                f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'").df()
            o_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FLAG {name}: load error: {str(e)[:200]}")
            n_flag += 1
            continue
        problems = []
        s_kinds = {c: kind(s_df[c].dtype) for c in s_df.columns}
        o_kinds = {c: kind(o_df[c].dtype) for c in o_df.columns}
        for c in sorted(set(s_kinds) & set(o_kinds)):
            if s_kinds[c] != o_kinds[c]:
                problems.append(f"col {c}: spark={s_kinds[c]} oracle={o_kinds[c]}")
        if sorted(s_kinds) != sorted(o_kinds):
            problems.append(f"cols {sorted(s_kinds)} vs {sorted(o_kinds)}")
        elif not problems:
            c1, c2 = canon_df(s_df), canon_df(o_df)
            if c1 != c2:
                diff = [(a, b) for a, b in zip(c1, c2) if a != b][:2]
                problems.append(f"pandas-hash mismatch, first diffs: {diff}")
        if problems:
            print(f"FLAG {name}: {'; '.join(problems)}")
            n_flag += 1
    print(f"\n{len(names)} checked, {n_flag} flagged")
    if artifact:
        # "checked" counts result dirs that had an oracle to compare
        # against — the number Bench's staleness check reads
        n_checked = sum(1 for n in names if n in oracles)
        with open(artifact, "w") as f:
            # compact separators: Bench.readDtype parses with regexes
            json.dump({"flags": n_flag, "checked": n_checked}, f,
                      separators=(",", ":"))
        print(f"artifact -> {artifact}")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
