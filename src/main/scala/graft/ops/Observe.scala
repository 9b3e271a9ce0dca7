package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality counters via Spark's Observation API — the
  * production monitoring shape for a 100 TB curation pass: the counts a
  * dashboard needs (rows in, rows kept, null-key rows) ride the SAME job
  * that produces the output, instead of a second full scan to compute
  * them after the fact.
  *
  * Why Observation and not raw accumulators: observed metrics are
  * collected exactly once per successful action — task retries and
  * speculative duplicates don't double-count, which is precisely the
  * failure mode hand-rolled accumulator counters hit on a real cluster.
  * (Streaming jobs get the same numbers per micro-batch via
  * `QueryProgressEvent.observedMetrics` on a StreamingQueryListener.)
  */
object Observe {
  /** Attach a filter gate's counters to its own job: returns the
    * filtered frame plus an [[Observation]] whose metrics — `rows_in`,
    * `rows_pass`, `nulls_probe` — materialize after the first action on
    * the returned frame. The observe node sits ABOVE the filter in the
    * plan (it must see dropped rows), costing one metadata-only pass of
    * three codegen'd aggregates, no shuffle, no extra scan.
    */
  def gatedFilter(df: DataFrame, pred: Column, nullProbe: Column)
      : (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("rows_in"),
      // pred is null on null inputs; sum skips nulls, so this counts
      // strictly-true rows — identical to what filter() keeps
      sum(pred.cast("long")).as("rows_pass"),
      sum(nullProbe.isNull.cast("long")).as("nulls_probe"))
    (observed.filter(pred), obs)
  }
}
