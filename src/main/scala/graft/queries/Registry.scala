package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered, driver-checkable query per SURVEY §2 operator.
 *
 * Contract (see SparkEntry): `run(spark, sfDir)` computes the result with
 * this library's operators; `oracle` is equivalent ANSI SQL the driver
 * executes in DuckDB over the same parquet tables, then hash-compares.
 *
 * Determinism rules applied to every entry (SURVEY §7.4):
 *  - every computed column is aliased identically on both sides (the
 *    driver sorts columns BY NAME before hashing);
 *  - every floating-point aggregate is `round()`ed to the same digits on
 *    both sides, so summation-order ulps can't flip the hash;
 *  - every top-k has a unique tiebreak column in BOTH orderings;
 *  - integer-valued derivations are cast to BIGINT on the Spark side
 *    (DuckDB's hour/year/count/… return BIGINT, Spark's return INT);
 *  - no current_timestamp/current_date in compared output.
 */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ JoinAggQueries.defs ++ WindowQueries.defs ++
      QualityQueries.defs ++ ExtQueries.defs ++ PipelineQueries.defs ++
      StreamingQueries.defs ++ TpchQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
