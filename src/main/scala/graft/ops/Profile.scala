package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the ANALYZE-style statistics a pipeline
  * collects before planning work over a new table (row/null/distinct
  * counts, ranges) and fixed-width value histograms for distribution
  * monitoring. Both are single aggregation passes — partial aggregation
  * does the heavy lifting map-side, so the shuffle carries one partial
  * row (profile) or one row per bucket (histogram) regardless of table
  * size. Exact `count(DISTINCT ...)` is used rather than HLL: it expands
  * the aggregate into a two-phase distinct under the hood but stays
  * engine-portable for the oracle; swap `approx_count_distinct` in when
  * a ±2% answer is acceptable at 100 TB.
  */
object Profile {

  /** One profile row per column: rows, non-nulls, distincts, min/max
    * (rendered as strings so heterogeneous column types stack into one
    * long-form frame).
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n_rows")
    cols.map { c =>
      (c, n, row.getAs[Long](s"nn_$c"), row.getAs[Long](s"nd_$c"),
        Option(row.getAs[String](s"mn_$c")).getOrElse(""),
        Option(row.getAs[String](s"mx_$c")).getOrElse(""))
    }.toDF("column", "n_rows", "n_non_null", "n_distinct", "min_val", "max_val")
  }

  /** Fixed-width histogram over a numeric column: bucket = floor(v / w),
    * one count per occupied bucket. Integer bucket ids (not engine-rounded
    * bin edges) keep the result portable; nulls are excluded like any
    * aggregate would.
    */
  def histogram(df: DataFrame, valueCol: Column, width: Double): DataFrame =
    df.filter(valueCol.isNotNull)
      .groupBy(floor(valueCol / width).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"))
}
