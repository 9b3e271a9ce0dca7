package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incrementally-maintained distinct-count cube: the [[IdempotentSink]]
  * exactly-once commit protocol carrying [[graft.ops.StatsQueries
  * .hllSketchCube]]'s mergeable partials — the full 100 TB ingest story
  * in one piece. Each micro-batch lands its per-day HLL sketches (4 KiB
  * each, NOT its rows) under a batch-id-keyed partition; the cube read
  * is `hll_union_agg` over all partials per day. Because sketch union is
  * the bit-exact equivalent of sketching the union (HllSketchSpec), the
  * incrementally-built cube answers IDENTICALLY to a from-scratch batch
  * pass — while only ever writing kilobytes per batch and never
  * rescanning history. Replayed batches overwrite their own partition
  * (the idempotence key), so at-least-once delivery still yields an
  * exactly-once cube.
  */
object SketchCube {

  /** Per-batch partial: day-keyed sketches, idempotent under replay of
    * the same (batchId, data) pair — dynamic partition overwrite
    * replaces a replayed batch's previous partials instead of adding a
    * second copy (which would double-count nothing cardinality-wise but
    * would double the union fan-in and break the ==-batch contract).
    */
  def writeBatch(df: DataFrame, batchId: Long, target: String): Unit =
    df.groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(target)

  /** The cube read: union the stored partials per day. Touches only
    * sketch bytes — days × batches × 4 KiB — regardless of how many
    * billions of events produced them.
    */
  def readCube(spark: SparkSession, target: String): DataFrame =
    spark.read.parquet(target)
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .orderBy("day")

  /** Drive the events file stream into the cube once (AvailableNow +
    * durable checkpoint). Returns the number of non-empty batches.
    */
  def run(spark: SparkSession, srcDir: String, target: String,
          checkpoint: String): Long = {
    val layout = graft.Tables.eventsLayout(spark, srcDir)
    val stream = spark.readStream.schema(layout.rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(srcDir)
      .withColumn("ts", layout.normalizeTs)
      .select(col("ts"), col("user_id"))
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeBatch(df, batchId, target)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0).toLong
  }
}
