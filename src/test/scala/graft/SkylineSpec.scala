package graft

import org.apache.spark.sql.functions._
import graft.ops.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2D: hand-checkable frontier, dominated rows dropped") {
    // frontier maximizing (x, y): (5,1), (3,4), (1,6).
    // (3,3) is dominated by (3,4); (2,4) by (3,4); (1,5) by (1,6).
    val df = Seq((1, 5, 1), (2, 3, 4), (3, 1, 6), (4, 3, 3), (5, 2, 4),
      (6, 1, 5)).toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("skyline2D: ties on both axes are mutually non-dominating, all kept") {
    val df = Seq((1, 4, 4), (2, 4, 4), (3, 4, 3), (4, 3, 4))
      .toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2), "duplicate frontier points both kept, " +
      "same-x/lower-y and same-y/lower-x both dominated")
  }

  test("skyline2D equals brute-force dominance test, bucket-count invariant") {
    // deterministic pseudo-random points with deliberate duplicates
    val pts = (0 until 400).map { i =>
      val x = (i * 2654435761L % 97).toInt
      val y = (i * 40503L % 89).toInt
      (i.toLong, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).sorted
    for (buckets <- Seq(1, 7, 64)) {
      val got = Skyline.skyline2D(df, "x", "y", buckets = buckets)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == brute, s"buckets=$buckets must match brute force")
    }
  }

  test("skyline2D: minimization via negation, nulls excluded") {
    // minimize x, maximize y -> negate x at the call site
    val df = Seq((1L, Some(10), Some(1)), (2L, Some(5), Some(3)),
      (3L, Some(7), Some(2)), (4L, None, Some(9)), (5L, Some(1), None))
      .toDF("id", "x", "y")
      .select(col("id"), (col("x") * -1).as("nx"), col("y"))
    val got = Skyline.skyline2D(df, "nx", "y")
      .select("id").as[Long].collect().sorted.toSeq
    // (5,3) beats (7,2) and (10,1) on both (smaller x, larger y)
    assert(got == Seq(2L))
  }
}
