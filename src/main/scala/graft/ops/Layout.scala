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

  /** SIZE-targeted directory compaction — the maintenance job every
    * streaming/incremental sink eventually needs (each micro-batch lands
    * a file; a year of 5-minute batches is 10⁵ files whose listing and
    * footer reads dominate scan setup). Sizes the output from the
    * measured input bytes: ceil(total / targetBytes) files, floor 1.
    * Listing goes through the Hadoop FS API, so the same call works on
    * HDFS/S3 paths, not just local disk; the rewrite is a coalesce —
    * no shuffle, the whole job is one read + one write. Returns the
    * file count written.
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                 out: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts (hive key=value dirs, the
    // streaming sinks' batch_id=N subdirs) keep their data files below
    // the top level, where a flat listStatus measures 0 bytes and the
    // size target silently degrades to one giant output file
    val files = fs.listFiles(path, true)
    var total = 0L
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(out)
    n
  }

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

  /** Spread a 16-bit code so its bit i lands at bit 2i (the classic
    * morton magic-mask cascade); codes beyond 16 bits are masked off.
    */
  private def spread16(c: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    masks.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }
  }

  /** 32-bit morton (z-curve) key from two 16-bit codes: bits of `a` on
    * even positions, `b` on odd. Locality in (a, b) becomes locality on
    * the key — pure bitwise columns, fully codegen'd.
    */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linear 16-bit quantization of a numeric column against fixed [lo, hi]
    * bounds (constant-range columns like lon/lat; for data-dependent
    * bounds, aggregate min/max first and pass them in).
    */
  def quantize16(c: Column, lo: Double, hi: Double): Column =
    least(greatest(
        floor((c.cast("double") - lo) / (hi - lo) * 65535.0), lit(0.0)),
      lit(65535.0)).cast("long")

  /** Z-ordered layout over two numeric dimensions: quantize each to 16
    * bits, interleave into a morton key, range-partition + sort on it.
    * Each written file then covers a COMPACT rectangle in (a, b) space, so
    * parquet min/max footer stats prune scans on EITHER dimension — the
    * multi-dimensional generalization of [[sortedLayout]], and what makes
    * point/range lookups on a 100 TB geo/time table skip most files.
    */
  def zorderLayout(df: DataFrame, n: Int,
                   a: Column, aLo: Double, aHi: Double,
                   b: Column, bLo: Double, bHi: Double): DataFrame = {
    val key = mortonKey(quantize16(a, aLo, aHi), quantize16(b, bLo, bHi))
    // collision-proof scratch name: withColumn would silently REPLACE a
    // caller's same-named column and drop() would then delete their data
    val zCol = Iterator.from(0).map(i => s"__graft_z$i")
      .find(c => !df.columns.contains(c)).get
    df.withColumn(zCol, key)
      .repartitionByRange(n, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }
}
