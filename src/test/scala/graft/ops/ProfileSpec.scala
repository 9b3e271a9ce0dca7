package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class ProfileSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("tableProfile counts rows, non-nulls, distincts, and string ranges") {
    val df = Seq((Some("a"), 1L), (Some("b"), 2L), (None, 2L), (Some("a"), 3L))
      .toDF("s", "k")
    val got = Profile.tableProfile(df, Seq("s", "k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("s") == (4L, 3L, 2L, "a", "b"))
    assert(got("k") == (4L, 4L, 3L, "1", "3"))
  }

  test("histogram buckets by floor(v/w), drops nulls, handles negatives") {
    val df = Seq[java.lang.Double](0.0, 24.99, 25.0, 49.0, -1.0, null)
      .toDF("v")
    val got = Profile.histogram(df, col("v"), width = 25.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // floor semantics: -1.0/25 → bucket -1 (not 0); the boundary 25.0
    // opens bucket 1; the null contributes nowhere
    assert(got == Map(-1L -> 1L, 0L -> 2L, 1L -> 2L))
  }

  test("benford digits: 1-9 coverage, shares sum to ~1e6, expectation pinned") {
    val rows = StatsQueries.benfordDigits(spark, "/root/testdata/sf0.001")
      .collect()
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.toSet.subsetOf((1L to 9L).toSet) && digits.nonEmpty)
    val shares = rows.map(_.getAs[Long]("share_micro")).sum
    // integer floor division loses < 1 micro per digit
    assert(shares > 1000000L - 9 && shares <= 1000000L)
    // the Benford expectation column is the known constant table
    val ben = rows.map(r =>
      r.getAs[Long]("digit") -> r.getAs[Long]("benford_micro")).toMap
    assert(ben.get(1L).forall(_ == 301029L))
    assert(ben.get(9L).forall(_ == 45757L))
  }
}
