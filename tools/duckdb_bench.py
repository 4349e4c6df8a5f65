#!/usr/bin/env python3
"""Time oracle SQL in DuckDB over the fixture tables — the external
comparator for the bench (the reference publishes no perf figures, so
DuckDB wall-clock on the SAME queries and data is the one externally
meaningful anchor available in-sandbox).

Usage: python3 tools/duckdb_bench.py <sfDir> <sqlJsonFile> [reps] \
           [timeout_s] [mergeOut]

<sqlJsonFile> is {"name": "SELECT ...", ...}. Each query is run `reps`
times (default 3) and the MIN wall (fetchall included) is reported.
Prints ONE JSON line: {"queries":{name:sec,...},"reps":N,"errors":[...]}.
DuckDB is single-node columnar with a native optimizer — the point is
an order-of-magnitude sanity anchor, not a race.

r14 hardening (the duckdb_floor_seed.py discipline): an optional
per-query watchdog (`timeout_s`, default 600; 0 disables) interrupts a
pathological replay; a rep that COMPLETED is recorded the moment it
finishes (a later rep's timeout never discards a genuine full pass);
every query runs on its OWN connection so a late-firing interrupt (or
an interrupted pipeline's still-spinning workers) can't bleed into the
next measurement. Timed-out queries with no completed rep get NO
timing and are listed in errors — a truncation is not a floor.

If `mergeOut` is given, the timings MIN-MERGE into that JSON file
(floor-file shape: queries/runs/n_queries/merged_runs) under the
shared fcntl.lockf on bench_results/.bench.lock — the durable-artifact
path AmpBench's duck side uses (amp_r{N}_duck.json).
"""
import sys, os, json, time, fcntl, threading

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_file = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0
    merge_out = sys.argv[5] if len(sys.argv) > 5 else None
    import duckdb

    def fresh():
        con = duckdb.connect()
        # bounded resources (r14, learned the hard way: an amplified
        # graph-oracle cross join grew the process to 126 GB RSS and
        # the kernel OOM-killed the whole pass, losing every completed
        # timing): cap memory so a monster query errors INSIDE DuckDB
        # (recorded as an error row) instead of taking the process
        # down, and point spill at a bounded temp dir.
        con.execute("SET memory_limit='24GB'")
        con.execute("SET temp_directory='/tmp/graft_duck_spill'")
        try:
            con.execute("SET max_temp_directory_size='40GB'")
        except Exception:
            pass  # older DuckDB: no such setting
        for t in TABLES:
            # fixtures are single parquet files; Spark-written amplified
            # tables (graft.AmpBench write) are part-file DIRECTORIES
            p = f"{sf_dir}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        return con

    with open(sql_file) as f:
        sqls = json.load(f)
    out, runs_done, errors = {}, {}, []
    for name in sorted(sqls):
        con = fresh()
        best, done, err = None, 0, None
        for _ in range(reps):
            timer = (threading.Timer(timeout_s, con.interrupt)
                     if timeout_s > 0 else None)
            if timer:
                timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sqls[name]).fetchall()
            except Exception as e:
                err = str(e)[:120]
                break
            finally:
                if timer:
                    timer.cancel()
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
            done += 1
        if best is not None:
            # 6 decimals: dq/pl oracles run in well under a millisecond,
            # and 4-decimal rounding collapsed them toward 0 (breaking
            # any per-query ratio taken against them)
            out[name] = round(best, 6)
            runs_done[name] = done
            if merge_out:
                # merge INCREMENTALLY: a crash (or an OOM kill) later in
                # the pass must not lose this completed timing
                merge(merge_out, {name: out[name]}, {name: done},
                      quiet=True)
        if err is not None:
            errors.append(f"{name}: {err}")
            print(f"[duck] {name} ERROR {err[:80]}", file=sys.stderr,
                  flush=True)
        try:
            con.close()
        except Exception:
            pass
    if merge_out:
        print(f"[duck] merged into {merge_out}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": out, "reps": reps, "errors": errors}))


def merge(path, timed, runs_done, quiet=False):
    """Min-merge into a floor-shaped JSON under the bench fcntl lock.
    `quiet` marks the incremental per-query calls: no stderr line and
    no merged_runs bump (merged_runs counts PASSES, and a pass makes
    many incremental calls — it is bumped once by the first query)."""
    bench_dir = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(bench_dir, exist_ok=True)
    lock_path = os.path.join(bench_dir, ".bench.lock")
    with open(lock_path, "a+") as lock:
        fcntl.lockf(lock, fcntl.LOCK_EX)
        d = {}
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
        qs, runs = d.get("queries", {}), d.get("runs", {})
        for k, v in timed.items():
            prior = qs.get(k)
            qs[k] = min(prior, v) if prior else v
            runs[k] = runs.get(k, 0) + runs_done.get(k, 0)
        d["queries"] = dict(sorted(qs.items()))
        d["runs"] = dict(sorted(runs.items()))
        d["n_queries"] = len(qs)
        if not merge._bumped:
            d["merged_runs"] = d.get("merged_runs", 0) + 1
            merge._bumped = True
        with open(path, "w") as f:
            # compact separators: Bench.readFloors scans for `"queries":{`
            json.dump(d, f, separators=(",", ":"))
        fcntl.lockf(lock, fcntl.LOCK_UN)
    if not quiet:
        print(f"[duck] merged into {path}", file=sys.stderr, flush=True)


merge._bumped = False


if __name__ == "__main__":
    main()
