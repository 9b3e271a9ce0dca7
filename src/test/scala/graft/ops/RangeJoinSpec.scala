package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  lazy val points = (1 to 500)
    .map(i => (i.toLong, (i % 97) * 0.37 - 5.0)).toDF("pid", "v")
  lazy val intervals = (1 to 80).map { i =>
    val lo = (i % 31) * 0.61 - 4.0
    (i.toLong, lo, lo + (i % 5) * 0.4) // widths 0..1.6, all ≤ maxWidth 2
  }.toDF("iid", "lo", "hi")

  test("banded interval join equals the naive inequality join") {
    val banded = RangeJoin.bandedIntervalJoin(points, intervals,
        "v", "lo", "hi", maxWidth = 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive && naive.nonEmpty)
  }

  test("banding plans an equi-join, not a nested loop") {
    val p = RangeJoin.bandedIntervalJoin(points, intervals,
      "v", "lo", "hi", maxWidth = 2.0).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("negative values band correctly (floor, not truncate)") {
    val pts = Seq((1L, -3.1), (2L, -0.1)).toDF("pid", "v")
    val ivs = Seq((10L, -3.5, -2.5), (20L, -0.5, 0.5)).toDF("iid", "lo", "hi")
    val got = RangeJoin.bandedIntervalJoin(pts, ivs, "v", "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }
}
