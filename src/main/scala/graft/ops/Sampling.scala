package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling and split operators for training-data pipelines: stratified
  * downsampling (class rebalancing) and deterministic hash splits.
  */
object Sampling {

  /** Stratified sample: per-stratum fractions (class rebalancing /
    * language quotas). Membership comes from a hash of the row id — NOT
    * `sampleBy`, whose rand(seed) stream is partition-layout dependent,
    * so its "seeded" sample silently drifts when the input layout
    * changes. Hash membership is stable across any repartition, like
    * [[hashSplit]]. Single pass, no shuffle, exact-fraction in
    * expectation (the scalable contract; exact-count sampling needs a
    * per-stratum sort).
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    val threshold = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Deterministic hash split: rows route to buckets by
    * pmod(xxhash64(id, salt), 100). Unlike randomSplit — whose assignment
    * depends on partitioning — the same row lands in the same split on
    * any cluster layout, any engine run, forever. That stability is what
    * makes train/test membership auditable in a long-lived corpus.
    *
    * Null ids: xxhash64 skips null children, so every null-id row hashes
    * to the same (salt-only) bucket and the whole null population lands
    * on ONE side of the split. That is inherent to any deterministic
    * id-keyed assignment — null carries no identity to split on — so
    * completeness and disjointness hold, but the train ratio does not,
    * for null ids. Assign real ids upstream if nulls must be sampled.
    */
  def hashBucket(idCol: Column, salt: Long = 0L): Column =
    pmod(xxhash64(idCol, lit(salt)), lit(100L))

  /** (train, holdout) pair at `trainPct` percent. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
                salt: Long = 0L): (DataFrame, DataFrame) = {
    val b = hashBucket(col(idCol), salt)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Per-group budgeted prefix: the rows whose running `weightCol` total
    * (ordered by `orderCol` within each `groupCol`) stays within `budget`
    * — the mixture-sampling primitive behind "take N tokens from source X"
    * schedules. One window pass, shuffle keyed by group; the ordering
    * column must be unique per group or the cumulative frame (RANGE on
    * ties) makes membership ambiguous. Appends `cum_weight`.
    */
  def budgetedPrefix(df: DataFrame, groupCol: String, orderCol: String,
                     weightCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("cum_weight", sum(col(weightCol)).over(w))
      .filter(col("cum_weight") <= budget)
  }

  /** Deterministic uniform sample: keep the `k` rows with the smallest
    * md5(id) per group. Hash-rank sampling is reproducible across engines
    * and runs (unlike rand(seed), whose stream depends on partitioning),
    * uniform for any id distribution, and one window pass per group —
    * Spark plans it as WindowGroupLimit, so only k rows per group survive
    * the shuffle. md5 (not xxhash64) keeps it DuckDB-replayable.
    */
  def md5RankSample(df: DataFrame, groupCol: String, idCol: String,
                    k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** Sequence packing: assign each row to a fixed-budget bin by the
    * running `weightCol` total BEFORE it (ordered by `orderCol` within
    * `groupCol`) — the greedy streaming packer that turns a document
    * stream into ~`binBudget`-token training sequences. bin_id =
    * floor(tokens_before / budget): deterministic, one window pass, and
    * embarrassingly parallel across groups (at corpus scale the group is
    * the shard/source key, so no global sort exists anywhere). A row
    * larger than the remaining slack spills into the next bin — standard
    * greedy packing slack, bounded by one max-doc per bin.
    */
  def packBins(df: DataFrame, groupCol: String, orderCol: String,
               weightCol: String, binBudget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__before DIV ${binBudget}L"))
      .drop("__before")
  }
}
