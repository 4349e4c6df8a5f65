#!/usr/bin/env python3
"""Seed/deepen per-query DuckDB floors for oracle sets too slow to time
inside every graft.Bench run.

The in-run comparator (Bench.runDuckdb) times the core/tpch/pl/dq
oracles — seconds per pass. The ext compute oracles replay sketch/graph
internals via unrolled CTEs and cost >10 minutes per DuckDB pass at
sf0.1, which would starve the Spark floor depth if paid per run. This
tool times an arbitrary oracle subset standalone and MIN-MERGES the
results into bench_results/duckdb_floors.json — same floor semantics,
same per-query `runs` depth bump, same POSIX record lock
(fcntl.lockf on bench_results/.bench.lock) graft.Bench's own
read-modify-write acquires via java FileLock, so concurrent runs can't
interleave and lose floors. (lockf, NOT flock: Java FileLock is a
POSIX fcntl record lock, and Linux's flock(2) family is invisible to
it — a flock here would serialize against bench_loop.sh only.)

Each query gets a watchdog (duckdb connection.interrupt()) so one
pathological replay can't wedge the pass. Timed-out REPS contribute no
floor (a truncated timing is not a floor), but a rep that COMPLETED is
recorded the moment it finishes — a later rep's timeout never discards
an earlier genuine full pass. Every query runs on its OWN connection:
the Timer can fire in the window after execute() returns but before
cancel(), and on a shared connection that stray interrupt would void
the NEXT query's measurement.

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

    out, runs_done, errors = {}, {}, []
    for name in sorted(sqls):
        # fresh connection per query: isolates any late-firing watchdog
        # interrupt (and any worker threads an interrupted parallel
        # pipeline leaves spinning — observed: hours of residual CPU)
        con = fresh()
        best, done, err = None, 0, None
        for _ in range(reps):
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:
                err = str(e)[:120]
                break
            finally:
                timer.cancel()
            sec = time.perf_counter() - t0
            # record the completed rep IMMEDIATELY — only a rep that was
            # itself interrupted is an untrusted timing
            best = sec if best is None else min(best, sec)
            done += 1
        if best is not None:
            out[name] = round(best, 6)
            runs_done[name] = done
            suffix = f" ({done}/{reps} reps)" if done < reps else ""
            print(f"[seed] {name} {best:.3f}s{suffix}", flush=True)
        if err is not None:
            errors.append(f"{name}: {err}")
            print(f"[seed] {name} ERROR {err[:80]}", file=sys.stderr,
                  flush=True)
        try:
            con.close()
        except Exception:
            pass
    return out, runs_done, errors


def merge_floors(floors_path, lock_path, timed, runs_done):
    """Min-merge under the bench flock; bump per-query run depth by the
    reps that actually COMPLETED for that query. Preserves every field
    it doesn't own (constants, sf, merged_runs — those belong to
    Bench's in-run comparator)."""
    with open(lock_path, "a+") as lock:
        fcntl.lockf(lock, fcntl.LOCK_EX)
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
            runs[k] = runs.get(k, 0) + runs_done.get(k, 0)
        d["queries"] = dict(sorted(qs.items()))
        d["runs"] = dict(sorted(runs.items()))
        d["n_queries"] = len(qs)
        with open(floors_path, "w") as f:
            # COMPACT separators are load-bearing: Bench.readFloors scans
            # for the exact token `"queries":{` — json.dump's default
            # colon-space would make the prior floors invisible and the
            # next bench run would rewrite the file without them
            json.dump(d, f, separators=(",", ":"))
        fcntl.lockf(lock, fcntl.LOCK_UN)


def main():
    sf_dir, sql_file = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    with open(sql_file) as f:
        sqls = json.load(f)
    timed, runs_done, errors = time_queries(sf_dir, sqls, reps, timeout_s)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_dir = os.path.join(repo, "bench_results")
    os.makedirs(bench_dir, exist_ok=True)
    merge_floors(os.path.join(bench_dir, "duckdb_floors.json"),
                 os.path.join(bench_dir, ".bench.lock"), timed, runs_done)
    print(json.dumps({"seeded": len(timed), "reps": reps,
                      "errors": errors}))


if __name__ == "__main__":
    main()
