package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{dec, table}

/** Relational operator surface (SURVEY.md §2.2–2.5) expressed as named
  * harness queries over the TESTDATA corpus, each paired with ANSI SQL for
  * the DuckDB oracle.
  *
  * Determinism rules (SURVEY.md §5.1, §7.4):
  *  - every query ends in a total order on a unique key;
  *  - double aggregates go through exact decimal (see [[graft.Tables.dec]]);
  *  - pivot value lists are explicit so column sets are stable.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A2 (crime.py:33-37,62,67): group-by count ranked descending.
    * Catalyst plans partial+final hash aggregate around one shuffle on the
    * group key; the sort runs on the already-tiny aggregated side.
    */
  def countsByType(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))

  val all: Map[String, Q] = Map(
    "q_counts_by_type" -> (countsByType _)
  )

  val oracle: Map[String, String] = Map(
    "q_counts_by_type" ->
      """SELECT event_type, count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY n DESC, event_type ASC""".stripMargin
  )
}
