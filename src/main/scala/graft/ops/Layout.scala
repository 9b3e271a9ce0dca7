package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout management (the operational side of 100 TB: small-file
  * compaction, sorted layouts for range pruning, partition sizing).
  * These wrap the repartition family with the intent named, because the
  * difference between `coalesce` and `repartition` is exactly the
  * difference between an hour-long job and a shuffle-free one.
  */
object Layout {

  /** Small-file compaction: coalesce (NO shuffle — merges partitions in
    * place) down to `n`. Use after filters that leave thousands of
    * near-empty partitions. Never increases parallelism.
    */
  def compact(df: DataFrame, n: Int): DataFrame = df.coalesce(n)

  /** Rebalance to `n` partitions via full shuffle — when upstream skew or
    * growth means partitions must be re-spread, not just merged.
    */
  def rebalance(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** Range-partitioned, within-partition-sorted layout: rows globally
    * ordered across files. Written as parquet this gives min/max footer
    * stats per file that scan-time range predicates prune on — the
    * sorted-table layout every time-partitioned event store wants.
    */
  def sortedLayout(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)

  /** Hash-partition on a key (co-locates equal keys; pre-shuffles for a
    * downstream aggregation or join reusing the same partitioning).
    */
  def keyed(df: DataFrame, n: Int, keys: Column*): DataFrame =
    df.repartition(n, keys: _*)
}
