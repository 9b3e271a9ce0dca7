package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (the 100 TB checklist: a single hot key turns
  * a shuffle join into one straggler task; salting splits it S ways).
  * AQE's skew-join splitting handles many cases at runtime — this is the
  * explicit form for when the skew is known and AQE's post-shuffle split
  * can't help (e.g. a hot key inside one huge partition of a stateful agg).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * derived from `saltSource` (any column that spreads rows within a key,
    * e.g. a unique id); the small side is replicated `buckets` times so
    * every (key, salt) bucket finds its match. Result set is identical to
    * the plain join; the hot key's work is spread across `buckets` tasks.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase count/sum for a skewed group key —
    * partial aggregate on (key, salt), then final on key. Spark's partial
    * aggregation already does this per-partition; explicit salting adds a
    * shuffle level for keys too hot for a single reducer.
    */
  def saltedCount(df: DataFrame, key: String, saltSource: Column,
                  buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
