#!/usr/bin/env python3
"""Seed/deepen per-query DuckDB floors for oracle sets too slow to time
inside every graft.Bench run.

The in-run comparator (Bench.runDuckdb) times the core/tpch/pl/dq
oracles — seconds per pass. The ext compute oracles replay sketch/graph
internals via unrolled CTEs and cost >10 minutes per DuckDB pass at
sf0.1, which would starve the Spark floor depth if paid per run. This
tool times an arbitrary oracle subset standalone and MIN-MERGES the
results into bench_results/duckdb_floors.json — same floor semantics,
same per-query `runs` depth bump, same flock (bench_results/.bench.lock)
Bench's own read-modify-write runs under, so concurrent bench_loop runs
can't interleave and lose floors.

Each query gets a watchdog (duckdb connection.interrupt()) so one
pathological replay can't wedge the pass; timed-out queries get NO
floor (a truncated timing is not a floor) and are listed on stderr.

Usage: python3 tools/duckdb_floor_seed.py <sfDir> <sqlJsonFile> \
           [reps=2] [per_query_timeout_s=120]
<sqlJsonFile> is {"name": "SELECT ...", ...} (e.g. filtered from a
Verify dump's oracle_sql.json).
"""
import sys, os, json, time, fcntl, threading

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def time_queries(sf_dir, sqls, reps, timeout_s):
    import duckdb

    def fresh():
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        return con

    con = fresh()
    out, errors = {}, []
    for name in sorted(sqls):
        best = None
        try:
            for _ in range(reps):
                timer = threading.Timer(timeout_s, con.interrupt)
                timer.start()
                t0 = time.perf_counter()
                try:
                    con.execute(sqls[name]).fetchall()
                finally:
                    timer.cancel()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            out[name] = round(best, 6)
            print(f"[seed] {name} {best:.3f}s", flush=True)
        except Exception as e:
            errors.append(f"{name}: {str(e)[:120]}")
            print(f"[seed] {name} ERROR {str(e)[:80]}", file=sys.stderr,
                  flush=True)
            # an interrupted parallel pipeline can keep its worker
            # threads spinning on the old connection (observed: hours of
            # residual CPU after the pass) — drop it and start clean
            try:
                con.close()
            except Exception:
                pass
            con = fresh()
    try:
        con.close()
    except Exception:
        pass
    return out, errors


def merge_floors(floors_path, lock_path, timed, reps):
    """Min-merge under the bench flock; bump per-query run depth by
    `reps`. Preserves every field it doesn't own (constants, sf,
    merged_runs — those belong to Bench's in-run comparator)."""
    with open(lock_path, "a+") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        d = {}
        if os.path.exists(floors_path):
            with open(floors_path) as f:
                d = json.load(f)
        qs = d.get("queries", {})
        runs = d.get("runs", {})
        for k, v in timed.items():
            # pre-r12 floors stored at 3 decimals collapsed sub-ms
            # values to a sticky 0.000 — treat zeros as absent
            prior = qs.get(k)
            qs[k] = min(prior, v) if prior else v
            runs[k] = runs.get(k, 0) + reps
        d["queries"] = dict(sorted(qs.items()))
        d["runs"] = dict(sorted(runs.items()))
        d["n_queries"] = len(qs)
        with open(floors_path, "w") as f:
            # COMPACT separators are load-bearing: Bench.readFloors scans
            # for the exact token `"queries":{` — json.dump's default
            # colon-space would make the prior floors invisible and the
            # next bench run would rewrite the file without them
            json.dump(d, f, separators=(",", ":"))
        fcntl.flock(lock, fcntl.LOCK_UN)


def main():
    sf_dir, sql_file = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    with open(sql_file) as f:
        sqls = json.load(f)
    timed, errors = time_queries(sf_dir, sqls, reps, timeout_s)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_dir = os.path.join(repo, "bench_results")
    os.makedirs(bench_dir, exist_ok=True)
    merge_floors(os.path.join(bench_dir, "duckdb_floors.json"),
                 os.path.join(bench_dir, ".bench.lock"), timed, reps)
    print(json.dumps({"seeded": len(timed), "reps": reps,
                      "errors": errors}))


if __name__ == "__main__":
    main()
