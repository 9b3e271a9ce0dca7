package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class FunnelSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1: view→click→purchase in order (full conversion)
  // user 2: click BEFORE view, then purchase — click must not count
  // user 3: view only
  // user 4: view→click, purchase missing
  lazy val events = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
    (3L, "view", 10L),
    (4L, "view", 10L), (4L, "click", 15L)
  ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")

  test("ordered funnel: out-of-order steps don't count") {
    val got = Funnel.conversionCounts(events, Seq("view", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // views: users 1,2,3,4; ordered clicks: 1,4 (user 2's click precedes
    // the view); ordered purchases: just 1 (user 2 never ordered-clicked)
    assert(got == Seq((1L, "view", 4L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("userSteps carries earliest qualifying timestamps, null when missed") {
    val per = Funnel.userSteps(events, Seq("view", "click"))
      .orderBy("user_id").collect()
    assert(per.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val u1 = per(0); val u3 = per(2)
    assert(u1.getTimestamp(1) == ts(10) && u1.getTimestamp(2) == ts(20))
    assert(u3.getTimestamp(1) == ts(10) && u3.isNullAt(2))
  }

  test("a strictly-later same-type event is picked when the first is too early") {
    val e = Seq((7L, "click", 1L), (7L, "view", 5L), (7L, "click", 9L))
      .map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val row = Funnel.userSteps(e, Seq("view", "click")).head()
    assert(row.getTimestamp(1) == ts(5) && row.getTimestamp(2) == ts(9))
  }
}
