package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class EventQueriesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("cohort retention: offset 0 exists for every cohort and users never " +
      "exceed the cohort's day-0 population") {
    val rows = EventQueries.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.foreach { case (_, rs) =>
      val offsets = rs.map(_.getAs[Long]("day_offset"))
      assert(offsets.contains(0L)) // first-active day is active by definition
      assert(offsets.forall(_ >= 0L))
      val day0 = rs.find(_.getAs[Long]("day_offset") == 0L).get
        .getAs[Long]("users")
      rs.foreach(r => assert(r.getAs[Long]("users") <= day0))
    }
    // every user appears in exactly one cohort: cohort day-0 populations
    // sum to the distinct-user count
    val users = graft.Tables.table(spark, sf, "events")
      .select(countDistinct($"user_id")).head().getLong(0)
    val day0Sum = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("users")).sum
    assert(day0Sum == users)
  }

  test("equi-depth histogram: buckets partition all values with ~equal mass " +
      "and ordered, non-overlapping ranges") {
    val rows = EventQueries.equidepthHistogram(spark, sf).collect()
    val total = graft.Tables.table(spark, sf, "events")
      .filter($"value".isNotNull).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to rows.length))
    // equi-depth: discrete boundaries make buckets within ~1% of n/10 here
    val target = total / 10.0
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("n") - target) <= target * 0.2,
        s"bucket ${r.getAs[Long]("bucket")} has ${r.getAs[Long]("n")} rows " +
          s"vs target $target")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      case _ =>
    }
  }
}
