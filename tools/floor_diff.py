#!/usr/bin/env python3
"""Round-over-round bench-floor comparison, host-normalized.

Usage: python3 tools/floor_diff.py bench_results/r09.json bench_results/r10.json

Loads two floor files (Bench's per-round merged minima), divides each
floor by its file's calib_min_sec (the single-thread host fingerprint)
so host-speed shifts cancel, and prints the ratio distribution plus the
largest regressions with the run depth behind each side's floor — a
floor from 3 runs is not evidence against a floor from 19.
"""
import sys, json, statistics


def load(path):
    d = json.load(open(path))
    cal = d.get("calib_min_sec") or d.get("host", {}).get("calib_sec") or 1.0
    runs = d.get("runs") or {}
    mr = d.get("merged_runs", 1)
    qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
    return qs, {k: runs.get(k, mr) for k in qs}, cal


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    qa, ra, ca = load(a_path)
    qb, rb, cb = load(b_path)
    common = sorted(set(qa) & set(qb))
    ratios = {k: (qb[k] / cb) / (qa[k] / ca) for k in common if qa[k] > 0}
    vals = sorted(ratios.values())
    med = statistics.median(vals)
    p75 = vals[int(len(vals) * 0.75)]
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


if __name__ == "__main__":
    main()
