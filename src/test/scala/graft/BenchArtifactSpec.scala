package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The Bench artifact CONTRACT, pinned without running Spark: the slim
 * stdout line must stay under the driver's ~2 KB stdout-tail window at
 * full registry size (going over made BENCH_r07–r09 unparseable), and
 * the floors parser must survive nested values by brace DEPTH (a
 * first-'}' scan silently truncated the queries map — ADVICE r10).
 */
class BenchArtifactSpec extends AnyFunSuite {

  private val hostJson =
    """{"cpu":"Intel(R) Xeon(R) Processor @ 2.10GHz","calib_sec":0.397}"""

  test("slim JSON stays under 2 KB at full registry size with every field present") {
    // worst-case realistic shape: long query names, 4-digit walls,
    // full duckdb coverage, stale planaudit, 7 errors
    val results = (1 to 400).map(i =>
      (f"ext_very_long_query_name_family_$i%03d", 9.876 + i * 0.001, i % 97 != 0))
    val errors = results.filterNot(_._3)
      .map(r => s"${r._1}: IllegalStateException").toList
    // all three fully-SQL families covered -> three duckdb field pairs
    val sqlFam = (1 to 22).map(i => f"tpch_q$i") ++
      (1 to 10).map(i => f"pl_mart_$i") ++ (1 to 16).map(i => f"dq_check_$i")
    val duckdb = sqlFam.map(_ -> 0.1234).toMap
    val withTpch = results ++ sqlFam.map(n => (n, 0.55, true))
    val slim = Bench.slimJson(withTpch, errors, "/root/testdata/sf0.1",
      hostJson, duckdb, Some((349, 352)),
      Some(0.231), Some(0.000577), Some(0.456),
      Set("pl_mart_1"), Some((0, 460)))
    assert(slim.length < 2000,
      s"slim must fit the driver's stdout-tail window: ${slim.length}")
    assert(!slim.contains("\n"), "slim must be ONE line")
    for (field <- Seq("\"queries_are\":\"round_floor_sec_slowest12\"",
        "\"duckdb_sec\":", "\"vs_duckdb\":", "\"vs_duckdb_worst10\":",
        "\"vs_duckdb_excluded\":",
        "\"dtype\":{\"flags\":0,\"checked\":460,\"stale\":false}",
        "\"constant_sec\":{\"spark\":0.231,\"duckdb\":0.0006,\"spark_2stage\":0.456}",
        "\"planaudit\":{\"n\":349,\"registry\":352,\"stale\":true}",
        "\"n_failed\":", "\"full\":\"bench_results/\""))
      assert(slim.contains(field), s"slim must carry $field: $slim")
    // a missing dtype artifact must read as "never ran", not "clean"
    val noDtype = Bench.slimJson(withTpch, errors, "sf", hostJson, duckdb)
    assert(noDtype.contains("\"dtype\":{\"flags\":-1,\"checked\":0,\"stale\":true}"))
  }

  test("slim worst10 excludes named-exclusion queries and caps at 10 entries") {
    // write-side/streaming rows with extreme ratios must NOT appear in
    // the tail; compute-side queries rank by ratio, capped at 10. The
    // exclusion set comes from the REAL derivation (ratioExclusions).
    val results = Seq(("s14_compact", 9.0, true),
        ("pl_scd2_roundtrip", 9.0, true), ("st_dedup_ingest", 9.0, true)) ++
      (1 to 14).map(i => (f"a$i%02d_compute", 1.0 + i, true))
    val excl = Bench.ratioExclusions(results.map(_._1))
    assert(excl.keySet === Set("s14_compact", "pl_scd2_roundtrip",
      "st_dedup_ingest"))
    val duckdb = (results.map(_._1) :+ "x").map(_ -> 0.01).toMap
    val slim = Bench.slimJson(results, Nil, "sf", hostJson, duckdb, None,
      Some(0.2), Some(0.001), None, excl.keySet)
    val tail10 = slim.substring(slim.indexOf("vs_duckdb_worst10"))
      .takeWhile(_ != '}')
    assert(!tail10.contains("s14_compact") && !tail10.contains("st_dedup"),
      s"named-exclusion rows must not pollute the ratio tail: $slim")
    assert(slim.contains("\"vs_duckdb_excluded\":{\"n\":3,\"ratioed_anyway\":3"),
      slim)
    assert(slim.contains("\"a14_compute\":1500.0"),
      s"the worst compute ratio must lead: $slim")
    assert(!slim.contains("a04_compute"),
      s"the list must cap at the 10 worst: $slim")
  }

  test("ratioExclusions: every class carries a reason; compute rows stay out") {
    val names = Seq("s1_csv_scan", "pl_scd2_roundtrip", "pl_mart_daily",
      "st_bm25_ingest", "st_session_window", "ext_bm25_persisted",
      "ext_dedup_index_growth", "ext_edit_join", "a1_group_percentiles",
      "tpch_q1", "dq_three_sigma")
    val m = Bench.ratioExclusions(names)
    assert(m.keySet === Set("s1_csv_scan", "pl_scd2_roundtrip",
      "st_bm25_ingest", "st_session_window", "ext_bm25_persisted",
      "ext_dedup_index_growth"))
    assert(m.values.forall(_.nonEmpty))
    // st ingest rows carry the additional write-side clause
    assert(m("st_bm25_ingest").contains("writes per trigger"))
    assert(!m("st_session_window").contains("writes per trigger"))
  }

  test("slim duckdb ratio covers the intersection with coverage exposed") {
    val results = (1 to 22).map(i => (f"tpch_q$i", 0.5, true))
    val partial = (1 to 10).map(i => f"tpch_q$i" -> 0.1).toMap
    val slim = Bench.slimJson(results, Nil, "sf", hostJson, partial, None)
    // both sums restricted to the 10 covered queries: 5.0 s vs 1.0 s
    assert(slim.contains("\"duckdb_n\":10"),
      s"partial coverage must be exposed, not silently dropped: $slim")
    assert(slim.contains("\"duckdb_sec\":1.0") &&
      slim.contains("\"vs_duckdb\":5.00"),
      s"ratio must compare the same covered set on both sides: $slim")
  }

  test("readFloors brace-depth scan survives nested values and trailing objects") {
    val f = java.io.File.createTempFile("graft_floors_spec", ".json")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      // a FUTURE nested per-query object before plain scalars, plus a
      // trailing host object that must not leak into the maps
      try w.println("""{"metric":"total","queries":{"a_nested":{"sec":1.5,"deep":{"x":2}},"b_plain":2.25,"c_plain":3.5},"runs":{"b_plain":7,"c_plain":9},"merged_runs":4,"calib_min_sec":0.351,"host":{"cpu":"x","calib_sec":0.4}}""")
      finally w.close()
      val fl = Bench.readFloors(f)
      assert(fl.queries.get("b_plain").contains(2.25) &&
             fl.queries.get("c_plain").contains(3.5),
        s"scalars AFTER a nested value must survive: ${fl.queries}")
      assert(!fl.queries.contains("cpu") && !fl.runs.contains("cpu"),
        "trailing host object must not leak into the maps")
      assert(fl.runs.get("b_plain").contains(7) && fl.mergedRuns == 4)
      assert(fl.calibMin.contains(0.351))
    } finally f.delete()
  }

  test("readFloors tolerates a missing file and a pre-runs legacy file") {
    val missing = Bench.readFloors(new java.io.File("/nonexistent/x.json"))
    assert(missing.queries.isEmpty && missing.mergedRuns == 0)
    val f = java.io.File.createTempFile("graft_floors_legacy", ".json")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println("""{"queries":{"a":1.0,"b":2.0},"merged_runs":6}""")
      finally w.close()
      val fl = Bench.readFloors(f)
      // pre-r10 files carry no per-query runs: global depth attributed
      assert(fl.runs == Map("a" -> 6, "b" -> 6))
    } finally f.delete()
  }
}
