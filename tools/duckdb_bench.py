#!/usr/bin/env python3
"""Time oracle SQL in DuckDB over the fixture tables — the external
comparator for the bench (the reference publishes no perf figures, so
DuckDB wall-clock on the SAME queries and data is the one externally
meaningful anchor available in-sandbox).

Usage: python3 tools/duckdb_bench.py <sfDir> <sqlJsonFile> [reps]

<sqlJsonFile> is {"name": "SELECT ...", ...}. Each query is run `reps`
times (default 3) and the MIN wall (fetchall included) is reported.
Prints ONE JSON line: {"queries":{name:sec,...},"reps":N,"errors":[...]}.
DuckDB is single-node columnar with a native optimizer — the point is
an order-of-magnitude sanity anchor, not a race.
"""
import sys, os, json, time

def main():
    sf_dir, sql_file = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # fixtures are single parquet files; Spark-written amplified
        # tables (graft.AmpBench write) are part-file DIRECTORIES
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    with open(sql_file) as f:
        sqls = json.load(f)
    out, errors = {}, []
    for name in sorted(sqls):
        best = None
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(sqls[name]).fetchall()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            # 6 decimals: dq/pl oracles run in well under a millisecond,
            # and 4-decimal rounding collapsed them toward 0 (breaking
            # any per-query ratio taken against them)
            out[name] = round(best, 6)
        except Exception as e:
            errors.append(f"{name}: {str(e)[:120]}")
    print(json.dumps({"queries": out, "reps": reps, "errors": errors}))

if __name__ == "__main__":
    main()
