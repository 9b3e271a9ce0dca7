package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range (interval) join: points `p.v` against intervals
  * `[lo, hi]`, the operator relational engines special-case (DuckDB
  * IEJoin, Spark's broadcast-nested-loop fallback).
  *
  * Spark plans a raw `p.v BETWEEN i.lo AND i.hi` join as a nested-loop —
  * O(|P|·|I|), which is the N² trap at scale. When interval width is
  * bounded by `maxWidth`, banding makes it an EQUI-join: bin values at
  * `maxWidth` granularity, explode each interval to the bins it touches
  * (≤ ⌈width/maxWidth⌉+1), hash-join on bin, then apply the exact range
  * predicate. Each point lives in exactly one bin, so no dedup pass is
  * needed, and the shuffle is keyed on bins — co-partitioned, never N².
  */
object RangeJoin {

  /** Join `points` (carrying numeric `valueCol`) to `intervals` (carrying
    * `loCol`/`hiCol`, with hi-lo ≤ maxWidth for every row) on
    * lo ≤ v ≤ hi. Returns all point×interval columns.
    */
  def bandedIntervalJoin(points: DataFrame, intervals: DataFrame,
                         valueCol: String, loCol: String, hiCol: String,
                         maxWidth: Double): DataFrame = {
    require(maxWidth > 0, "maxWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(valueCol) / maxWidth).cast("long"))
    val i = intervals
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / maxWidth).cast("long"),
          floor(col(hiCol) / maxWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
