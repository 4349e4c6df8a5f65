#!/usr/bin/env python3
"""Bench-floor comparison, host-normalized, with a standing watch-list.

Usage:
  python3 tools/floor_diff.py bench_results/r11.json
      — compare the round's floors against the CROSS-ROUND cumulative
        floors (bench_results/floors_cum.json), the default posture: a
        query is on the watch-list when its calib-normalized ratio vs
        the best floor EVER exceeds 1.2 at equal-or-greater run depth.
  python3 tools/floor_diff.py bench_results/r09.json bench_results/r10.json
      — explicit two-file round-over-round comparison (old, new).

Each floor is divided by its file's calib_min_sec (the single-thread
host fingerprint) so host-speed shifts cancel. The run depth behind
each side's floor is printed with every regression — a floor from 3
runs is not evidence against a floor from 19.
"""
import os, sys, json, statistics

WATCH_RATIO = 1.2


def load(path):
    d = json.load(open(path))
    cal = d.get("calib_min_sec") or d.get("host", {}).get("calib_sec") or 1.0
    runs = d.get("runs") or {}
    mr = d.get("merged_runs", 1)
    qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
    return qs, {k: runs.get(k, mr) for k in qs}, cal


def main():
    if len(sys.argv) == 2:
        b_path = sys.argv[1]
        a_path = os.path.join(os.path.dirname(b_path) or ".",
                              "floors_cum.json")
        mode = "vs cumulative floors"
    else:
        a_path, b_path = sys.argv[1], sys.argv[2]
        mode = "round-over-round"
    qa, ra, ca = load(a_path)
    qb, rb, cb = load(b_path)
    common = sorted(set(qa) & set(qb))
    ratios = {k: (qb[k] / cb) / (qa[k] / ca) for k in common if qa[k] > 0}
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    p75 = vals[int(len(vals) * 0.75)]
    print(f"mode: {mode}")
    print(f"calib: {a_path} {ca:.3f}  {b_path} {cb:.3f}  "
          f"(host factor {cb / ca:.2f}x)")
    print(f"common queries {len(common)}  normalized ratio "
          f"median {med:.2f}x  p75 {p75:.2f}x  max {vals[-1]:.2f}x")
    print(f"added: {sorted(set(qb) - set(qa))}")
    print(f"removed: {sorted(set(qa) - set(qb))}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
    print("largest normalized regressions (query, ratio, "
          "old s/runs, new s/runs):")
    for k, r in worst:
        print(f"  {k:36s} {r:5.2f}x  {qa[k]:8.3f}/{ra[k]:<3d} "
              f"{qb[k]:8.3f}/{rb[k]:<3d}")
    # standing watch-list: normalized ratio > 1.2 where the new side's
    # floor rests on AT LEAST as many runs as the old side's — i.e. the
    # regression cannot be explained away as a run-depth deficit
    watch = sorted((k for k, r in ratios.items()
                    if r > WATCH_RATIO and rb[k] >= ra[k]))
    if watch:
        print(f"WATCH-LIST (> {WATCH_RATIO}x at equal-or-greater depth):")
        for k in watch:
            print(f"  {k:36s} {ratios[k]:5.2f}x  "
                  f"{qa[k]:8.3f}/{ra[k]:<3d} {qb[k]:8.3f}/{rb[k]:<3d}  "
                  f"abs +{(qb[k] / cb - qa[k] / ca) * ca:.2f}s")
    else:
        print(f"WATCH-LIST: empty (no query > {WATCH_RATIO}x at "
              "equal-or-greater depth)")


if __name__ == "__main__":
    main()
