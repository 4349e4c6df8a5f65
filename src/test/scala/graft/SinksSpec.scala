package graft

import org.apache.spark.sql.functions._

/**
 * The JDBC sink path (SURVEY §2.1 S4/S5 warehouse form), tested against
 * the in-process Derby engine that ships on the Spark classpath — a real
 * `format("jdbc")` round-trip: Spark JDBC writer → Derby → Spark JDBC
 * reader, append and replace modes mirroring the reference's
 * `to_sql(if_exists=...)`.
 */
class SinksSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graft_sinks;create=true"

  test("appendJdbc accumulates rows across loads; overwriteJdbc replaces") {
    import spark.implicits._
    val day1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "v")
    val day2 = Seq((3L, "c", 30.0)).toDF("id", "tag", "v")

    graft.core.Sinks.overwriteJdbc(day1, url, "graft_fact", numPartitions = 2)
    graft.core.Sinks.appendJdbc(day2, url, "graft_fact", numPartitions = 2)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_fact").load()
      .select(col("id"), col("tag").cast("string"), col("v"))
    assert(back.count() == 3L, "append after overwrite must accumulate")
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))

    // replace: the reference's if_exists='replace' — old rows gone
    graft.core.Sinks.overwriteJdbc(day2, url, "graft_fact", numPartitions = 1)
    val replaced = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_fact").load()
    assert(replaced.count() == 1L, "overwrite must replace, not accumulate")
  }

  test("numPartitions caps the writer's concurrent connections") {
    import spark.implicits._
    // 64 input partitions must not reach the database as 64 connections:
    // the writer coalesces to numPartitions tasks (1 here), and the load
    // still lands complete
    val wide = spark.range(0, 1000, 1, 64)
      .select(col("id"), (col("id") % 7).as("g"))
    graft.core.Sinks.overwriteJdbc(wide, url, "graft_wide", numPartitions = 1)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_wide").load()
    assert(back.count() == 1000L)
    assert(back.agg(sum("id")).head().getLong(0) == 499500L)
  }
}
