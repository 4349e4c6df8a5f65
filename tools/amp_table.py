#!/usr/bin/env python3
"""Aggregate the x10 (sf1-equivalent) scale-point measurements into the
SCALE.md table.

Inputs (ALL optional since r14 — defaults are the DURABLE artifacts,
so the quoted table always reflects final-depth floors):
  --amp-spark  AmpBench bench-mode JSON lines or the min-merged durable
               artifact; default: the latest bench_results/amp_r*_spark
               .json (AmpBench min-merges every run into it)
  --amp-duck   duckdb_bench.py output (or merged artifact) over the
               SAME amplified dir; default: the latest
               bench_results/amp_r*_duck.json
  --ref-spark  a round floors file at sf0.1; default: the latest
               bench_results/r*.json
  --ref-duck   sf0.1 DuckDB floors; default bench_results/duckdb_floors
               .json
  --mult       amplification factor (default 10)

Prints a markdown section: per-query slope (t_sf1 / t_sf0.1) for the
adjudicated tail, the core-family totals on both engines at both
scales, and every query whose Spark slope exceeds the amplification
factor (the superlinear suspects — the thing this scale point exists
to catch). Write-side queries (s-family) are excluded from the
vs-DuckDB ratios by the standing named-exclusion convention but still
shown in the slope list (their slope is real work).
"""
import argparse, glob, json, os, re


def latest(pattern):
    files = sorted(glob.glob(pattern))
    return files[-1] if files else None


def load_queries(path):
    d = json.load(open(path))
    qs = d.get("queries", d)
    return {k: v for k, v in qs.items() if isinstance(v, (int, float))}, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp-spark", nargs="+")
    ap.add_argument("--amp-duck")
    ap.add_argument("--ref-spark")
    ap.add_argument("--ref-duck")
    ap.add_argument("--mult", type=int, default=10)
    a = ap.parse_args()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    br = os.path.join(here, "bench_results")
    if not a.amp_spark:
        a.amp_spark = [latest(os.path.join(br, "amp_r*_spark.json"))]
        assert a.amp_spark[0], "no bench_results/amp_r*_spark.json yet"
    if not a.amp_duck:
        a.amp_duck = latest(os.path.join(br, "amp_r*_duck.json"))
        assert a.amp_duck, "no bench_results/amp_r*_duck.json yet"
    if not a.ref_spark:
        a.ref_spark = latest(os.path.join(br, "r[0-9]*.json"))
        assert a.ref_spark, "no bench_results/r*.json yet"
    if not a.ref_duck:
        a.ref_duck = os.path.join(br, "duckdb_floors.json")
    print(f"# inputs: amp_spark={a.amp_spark} amp_duck={a.amp_duck} "
          f"ref_spark={a.ref_spark} ref_duck={a.ref_duck}")

    amp_s = {}
    calib = None
    for p in a.amp_spark:
        qs, d = load_queries(p)
        for k, v in qs.items():
            amp_s[k] = min(amp_s.get(k, v), v)
        c = d.get("calib_sec") or d.get("calib_min_sec")
        if c:
            calib = min(calib, c) if calib else c
    amp_d, _ = load_queries(a.amp_duck)
    ref_s, ref_meta = load_queries(a.ref_spark)
    ref_d, _ = load_queries(a.ref_duck)
    ref_calib = ref_meta.get("calib_min_sec")

    common = sorted(set(amp_s) & set(ref_s))
    write_side = lambda n: bool(re.match(r"s\d+", n))
    tail = ["a25_heavy_hitters", "j8_bucketed_join",
            "ext_jaccard_prefix_join", "dq_gini_concentration"]

    print(f"amp calib {calib}, ref calib {ref_calib} "
          f"(host factor {calib / ref_calib:.2f}x)" if calib and ref_calib
          else "no calib")
    print()
    print("| query | spark sf0.1 | spark sf1 | slope (x{}) | duckdb sf0.1 |"
          " duckdb sf1 | vs_duckdb sf0.1 | vs_duckdb sf1 |".format(a.mult))
    print("| --- | --- | --- | --- | --- | --- | --- | --- |")
    for q in tail:
        if q not in amp_s or q not in ref_s:
            continue
        s0, s1 = ref_s[q], amp_s[q]
        d0, d1 = ref_d.get(q), amp_d.get(q)
        r0 = f"{s0 / d0:.1f}x" if d0 else "-"
        r1 = f"{s1 / d1:.1f}x" if d1 else "-"
        print(f"| {q} | {s0:.2f} | {s1:.2f} | {s1 / s0:.1f}x |"
              f" {d0 if d0 is not None else '-'} |"
              f" {d1 if d1 is not None else '-'} | {r0} | {r1} |")

    for fam_name, members in [
            ("core", [q for q in common
                      if not re.match(r"(tpch|pl|st|ext|dq)_", q)]),
            ("tpch", [q for q in common if q.startswith("tpch_")]),
            ("ext", [q for q in common if q.startswith("ext_")])]:
        if not members:
            continue
        ratio_set = [q for q in members if not write_side(q)
                     and q in amp_d and q in ref_d and ref_d[q] > 0]
        s0 = sum(ref_s[q] for q in members)
        s1 = sum(amp_s[q] for q in members)
        print()
        print(f"{fam_name} family ({len(members)} queries): spark {s0:.1f}s "
              f"sf0.1 -> {s1:.1f}s sf1 (slope {s1 / s0:.2f}x at x{a.mult} data)")
        if ratio_set:
            cs0 = sum(ref_s[q] for q in ratio_set)
            cs1 = sum(amp_s[q] for q in ratio_set)
            cd0 = sum(ref_d[q] for q in ratio_set)
            cd1 = sum(amp_d[q] for q in ratio_set)
            print(f"{fam_name} compute subset ({len(ratio_set)}): "
                  f"vs_duckdb {cs0 / cd0:.2f}x at sf0.1 -> "
                  f"{cs1 / cd1:.2f}x at sf1 "
                  f"(spark {cs0:.1f}->{cs1:.1f}s, duckdb {cd0:.1f}->{cd1:.1f}s)")

    print()
    over = [(amp_s[q] / ref_s[q], q) for q in common if ref_s[q] > 0.05
            and amp_s[q] / ref_s[q] > a.mult]
    if over:
        print(f"SUPERLINEAR SUSPECTS (slope > x{a.mult}, floors > 50 ms):")
        for r, q in sorted(over, reverse=True):
            print(f"  {q}: {ref_s[q]:.2f}s -> {amp_s[q]:.2f}s ({r:.1f}x)")
    else:
        print(f"no query exceeds the x{a.mult} amplification slope "
              f"(floors > 50 ms) — no superlinear term detected")
    slopes = sorted(((amp_s[q] / ref_s[q], q) for q in common
                     if ref_s[q] > 0.05), reverse=True)[:10]
    print("\nsteepest 10 slopes (floors > 50 ms):")
    for r, q in slopes:
        print(f"  {q}: {ref_s[q]:.2f}s -> {amp_s[q]:.2f}s ({r:.1f}x)")


if __name__ == "__main__":
    main()
