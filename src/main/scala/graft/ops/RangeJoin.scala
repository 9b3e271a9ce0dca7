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
    // same-named columns on both sides would make the joined output
    // ambiguous on first downstream reference; fail loudly instead
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names: $shared")
    val bin = Iterator.from(0).map(i => s"__graft_bin$i")
      .find(c => !shared.contains(c) && !points.columns.contains(c) &&
        !intervals.columns.contains(c)).get
    val p = points.withColumn(bin,
      floor(col(valueCol) / maxWidth).cast("long"))
    val i = intervals
      .withColumn(bin,
        explode(sequence(floor(col(loCol) / maxWidth).cast("long"),
          floor(col(hiCol) / maxWidth).cast("long"))))
    p.join(i, Seq(bin))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop(bin)
  }
}
