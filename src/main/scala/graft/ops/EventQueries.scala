package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Event-analytics operators round 2: cohort retention and an equi-depth
  * histogram. Both oracle-checked.
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Cohort retention: users bucketed by first-active day, activity
    * counted by day offset from that cohort day — the classic retention
    * triangle. Shape at scale: distinct (user, day) with map-side
    * combine, a per-user min aggregate, and a user-keyed equi-join —
    * the distinct and the groupBy reuse the same hash partitioning on
    * user_id, and nothing is ever event-row-quadratic. Events load via
    * [[graft.Tables.table]] (the nanosecond-timestamp parquet trap).
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint").as("day_offset"))
      .agg(count(lit(1)).as("users")) // distinct (user, day) upstream
      .orderBy("cohort_day", "day_offset")
  }

  /** Equi-depth (decile) histogram over event values: boundaries from one
    * exact percentile_disc aggregate, bucket assignment by broadcast
    * compare, then a per-bucket count/min/max aggregate. Deliberately NOT
    * ntile: a global ntile is a single-partition sort, which dies at
    * corpus scale; boundary-compare keeps every stage distributed (the
    * boundary row is 9 doubles, broadcast). Ties sit in the lowest
    * qualifying bucket in both engines (percentile_disc picks actual data
    * values, `<=` compare on both sides).
    */
  def equidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("value").isNotNull)
    val boundCols = (1 to 9).map(i =>
      expr(s"percentile_disc(0.${i}) WITHIN GROUP (ORDER BY value)")
        .as(s"b$i"))
    val bounds = ev.agg(boundCols.head, boundCols.tail: _*)
    // build the when-chain inside-out (b9 first) so the finished chain
    // tests b1 outermost: the SMALLEST qualifying bucket wins
    val bucket = (9 to 1 by -1).foldLeft(lit(10): org.apache.spark.sql.Column) {
      (acc, i) => when(col("value") <= col(s"b$i"), lit(i)).otherwise(acc)
    }
    ev.crossJoin(broadcast(bounds))
      .select(col("value"), bucket.cast("bigint").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy("bucket")
  }

  val all: Map[String, Q] = Map(
    "q_cohort_retention" -> (cohortRetention _),
    "q_equidepth_hist" -> (equidepthHistogram _)
  )

  val oracle: Map[String, String] = Map(
    "q_cohort_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(datediff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS users
        |FROM d JOIN c USING (user_id)
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY c.cohort_day, day_offset""".stripMargin,

    "q_equidepth_hist" ->
      """WITH b AS (
        |  SELECT quantile_disc(value, 0.1) AS b1, quantile_disc(value, 0.2) AS b2,
        |         quantile_disc(value, 0.3) AS b3, quantile_disc(value, 0.4) AS b4,
        |         quantile_disc(value, 0.5) AS b5, quantile_disc(value, 0.6) AS b6,
        |         quantile_disc(value, 0.7) AS b7, quantile_disc(value, 0.8) AS b8,
        |         quantile_disc(value, 0.9) AS b9
        |  FROM events WHERE value IS NOT NULL),
        |x AS (
        |  SELECT value,
        |    CASE WHEN value <= b1 THEN 1 WHEN value <= b2 THEN 2
        |         WHEN value <= b3 THEN 3 WHEN value <= b4 THEN 4
        |         WHEN value <= b5 THEN 5 WHEN value <= b6 THEN 6
        |         WHEN value <= b7 THEN 7 WHEN value <= b8 THEN 8
        |         WHEN value <= b9 THEN 9 ELSE 10 END AS bucket
        |  FROM events CROSS JOIN b WHERE value IS NOT NULL)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM x
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin
  )
}
