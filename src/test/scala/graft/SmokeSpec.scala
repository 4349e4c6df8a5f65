package graft

import graft.queries.Registry

/**
 * t1 smoke (SURVEY §5.2): every registered query plans and executes on
 * the sf0.001 fixtures. Row-level correctness is the DuckDB oracle's job
 * (tools/compare_oracle.py at sf0.01); this guards against regressions
 * that break planning, resolution, or execution.
 */
class SmokeSpec extends SparkSpec {

  for (q <- Registry.all) {
    test(s"query ${q.name} executes") {
      val df = q.run(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle belongs to a registered query") {
    val names = Registry.queries.keySet
    assert(Registry.oracleSql.keySet.subsetOf(names))
  }
}
