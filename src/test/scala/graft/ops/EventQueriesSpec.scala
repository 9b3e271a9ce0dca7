package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class EventQueriesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("cusum: a step change alarms, a flat series never does") {
    // flat type: 10 events/day for 20 days → d = -slack every day → S=0.
    // step type: 10/day for 10 days then 30/day — S grows ~(30-20-2)=8
    // micro-million/day after the step, crossing h=10 on day 2 of the step
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def day(i: Int): Long = base + i.toLong * 86400_000L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long, Double)]()
    var id = 0L
    for (i <- 0 until 20; _ <- 0 until 10) {
      rows += ((id, 1L, "flat", day(i) * 1000000L, 1.0)); id += 1
    }
    for (i <- 0 until 20; _ <- 0 until (if (i < 10) 10 else 30)) {
      rows += ((id, 1L, "step", day(i) * 1000000L, 1.0)); id += 1
    }
    val dir = GraftTestSpark.tempPath("graft_cusum").toString
    rows.toSeq.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.cusumAlarms(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Long]("max_s_micro") == 0L)
    assert(out("flat").getAs[Long]("n_alarm_days") == 0L)
    // step type: mean = (10*10+30*10)/20 = 20 → post-step d = 8e6/day
    assert(out("step").getAs[Long]("n_alarm_days") > 0L)
    assert(out("step").getAs[java.sql.Date]("first_alarm_day").toString
      == "2024-01-12") // S = 8, 16 → crosses 10 on the step's 2nd day
  }

  test("decayed counts: bounded by n, hand-checked half-life arithmetic") {
    val rows = EventQueries.decayedCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n"), r.getAs[Double]("decayed"))
      assert(d > 0.0 && d <= n.toDouble + 1e-9, s"decayed $d vs n $n")
    }
    // hand fixture: events 0h/1h/2h before the horizon → 0.25 + 0.5 + 1
    val dir = GraftTestSpark.tempPath("graft_decay").toString
    // Tables.table expects the driver layout: ts as LONG nanoseconds
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Seq((1L, 10L, "a", base * 1000000L, 1.0),
        (2L, 10L, "a", (base + 3600L * 1000) * 1000000L, 1.0),
        (3L, 10L, "a", (base + 7200L * 1000) * 1000000L, 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d = EventQueries.decayedCounts(spark, dir).collect().head
    assert(math.abs(d.getAs[Double]("decayed") - 1.75) <= 1e-6)
  }

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

  test("anomaly days: zero-variance series degrade to NaN z / flag 0, " +
      "spikes flag") {
    // drives the PRODUCTION query over a temp events dir (the cusum/scd2
    // pattern) — the oracled corpus never exercises the zero-variance
    // branch, so this fixture is its only coverage and must bind the real
    // code path, not an inline re-implementation.
    // type "flat": 3 days × 2 events (sd = 0); type "spiky": 9 quiet days
    // + one 100-event day (z well above 2)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ns(day: Int, minute: Int): Long =
      (base + ((day - 1).toLong * 1440 + minute) * 60000L) * 1000000L
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long, Double)]()
    for (d <- 1 to 3; i <- 1 to 2) {
      rows += ((id, 1L, "flat", ns(d, i), 1.0)); id += 1
    }
    for (d <- 1 to 9) {
      rows += ((id, 1L, "spiky", ns(d, 60), 1.0)); id += 1
    }
    for (i <- 0 until 100) {
      rows += ((id, 1L, "spiky", ns(10, 120 + i), 1.0)); id += 1
    }
    val dir = GraftTestSpark.tempPath("graft_anom").toString
    rows.toSeq.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.anomalyDays(spark, dir).collect()
    val flat = out.filter(_.getAs[String]("event_type") == "flat")
    assert(flat.length == 3)
    flat.foreach { r =>
      assert(r.getAs[Double]("z").isNaN && r.getAs[Long]("is_anomaly") == 0L)
    }
    val spikes = out.filter(r => r.getAs[String]("event_type") == "spiky" &&
      r.getAs[Long]("is_anomaly") == 1L)
    assert(spikes.map(_.getAs[Long]("n")).toSeq == Seq(100L))
  }

  test("event transitions: exact conditional micro-probabilities per user " +
      "sequence") {
    // drives the PRODUCTION query over a temp events dir so the lag
    // window, the per-prefix totals, and the decimal micro-ratio are all
    // the real code path (an inline re-implementation would bind nothing)
    // user 1: a→b→a→c (transitions ab, ba, ac); user 2: a→b (ab)
    def ns(min: Long): Long = min * 60000000000L
    val rows = Seq(
      (1L, 1L, "a", ns(1), 1.0), (2L, 1L, "b", ns(2), 1.0),
      (3L, 1L, "a", ns(3), 1.0), (4L, 1L, "c", ns(4), 1.0),
      (5L, 2L, "a", ns(5), 1.0), (6L, 2L, "b", ns(6), 1.0))
    val dir = GraftTestSpark.tempPath("graft_trans").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventQueries.eventTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("p_micro"))).toMap
    // from "a": ab×2, ac×1 → 666666 / 333333 micro; from "b": ba×1 → 1e6
    assert(out == Map(
      ("a", "b") -> ((2L, 666666L)),
      ("a", "c") -> ((1L, 333333L)),
      ("b", "a") -> ((1L, 1000000L))))
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

  test("scd2: consecutive same-state runs collapse into closed intervals, " +
      "the last interval stays open") {
    // user 1: A@1s A@2s B@3s A@4s → islands (A,1s→3s,n=2) (B,3s→4s,n=1)
    // (A,4s→null,n=1); user 2: a single C@5s → one open interval
    def ns(sec: Long): Long = sec * 1000000000L
    val rows = Seq(
      (10L, 1L, "A", ns(1), 1.0), (11L, 1L, "A", ns(2), 1.0),
      (12L, 1L, "B", ns(3), 1.0), (13L, 1L, "A", ns(4), 1.0),
      (14L, 2L, "C", ns(5), 1.0))
    val dir = GraftTestSpark.tempPath("graft_scd2").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.scd2Intervals(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq")) ->
        ((r.getAs[String]("state"), r.getAs[Long]("valid_from"),
          Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
          r.getAs[Long]("n_events")))).toMap
    def us(sec: Long): Long = sec * 1000000L
    assert(got == Map(
      (1L, 1L) -> (("A", us(1), Some(us(3)), 2L)),
      (1L, 2L) -> (("B", us(3), Some(us(4)), 1L)),
      (1L, 3L) -> (("A", us(4), None, 1L)),
      (2L, 1L) -> (("C", us(5), None, 1L))))
  }

  test("attribution: purchases credit first/last PRECEDING click, " +
      "clickless purchases stay unattributed") {
    // user 1: click@1 view@2 purchase@3 click@4 purchase@5
    // user 2: purchase@6 with no click ever → NULL credit row
    def ns(sec: Long): Long = sec * 1000000000L
    val rows = Seq(
      (1L, 1L, "click", ns(1), 1.0), (2L, 1L, "view", ns(2), 1.0),
      (3L, 1L, "purchase", ns(3), 1.0), (4L, 1L, "click", ns(4), 1.0),
      (5L, 1L, "purchase", ns(5), 1.0), (6L, 2L, "purchase", ns(6), 1.0))
    val dir = GraftTestSpark.tempPath("graft_attr").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.attribution(spark, dir).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        ((Option(r.getAs[java.lang.Long]("first_touch")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("last_touch")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("latency_us")).map(_.toLong))))
      .toMap
    assert(got == Map(
      3L -> ((Some(1L), Some(1L), Some(2000000L))),
      5L -> ((Some(1L), Some(4L), Some(1000000L))),
      6L -> ((None, None, None))))
  }

  test("newVsReturning: first-day users count as new exactly once") {
    // user 1 active day 1 and 2; user 2 only day 2; multiple events per
    // (user, day) must not inflate the counts (distinct first)
    def ns(day: Long, h: Long): Long = ((day - 1) * 24 + h) * 3600000000000L
    val rows = Seq(
      (1L, 1L, "a", ns(1, 1), 1.0), (2L, 1L, "a", ns(1, 2), 1.0),
      (3L, 1L, "a", ns(2, 1), 1.0), (4L, 2L, "a", ns(2, 1), 1.0))
    val dir = GraftTestSpark.tempPath("graft_nvr").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.newVsReturning(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("new_users"), r.getAs[Long]("returning_users"))))
      .toMap
    assert(got == Map("1970-01-01" -> ((1L, 0L)),
      "1970-01-02" -> ((1L, 1L))))
  }
}
