package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  lazy val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")
    .repartition(16)

  test("compact merges partitions without adding a shuffle") {
    val c = Layout.compact(df, 2)
    assert(c.rdd.getNumPartitions == 2)
    def exchanges(p: String) = p.split("\n").count(_.contains("Exchange"))
    // the fixture's own repartition(16) is one Exchange; coalesce must
    // not introduce another
    assert(exchanges(c.queryExecution.executedPlan.toString) ==
      exchanges(df.queryExecution.executedPlan.toString))
    assert(c.queryExecution.executedPlan.toString.contains("Coalesce"))
  }

  test("rebalance shuffles to the requested partition count") {
    val r = Layout.rebalance(df, 8)
    assert(r.rdd.getNumPartitions == 8)
    assert(r.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sortedLayout writes range-partitioned files with disjoint id ranges") {
    val out = GraftTestSpark.tempPath("graft_sorted").toString + "/t"
    Layout.sortedLayout(df, 4, col("id")).write.parquet(out)
    val perFile = spark.read.parquet(out)
      .select(col("id"), input_file_name().as("f"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length == 4)
    // ranges must not overlap: every file's min exceeds the previous max
    perFile.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(loB > hiA)
      case _ =>
    }
  }

  test("keyed co-locates equal keys in one partition") {
    val k = Layout.keyed(df, 4, col("k"))
    val spread = k.select(col("k"), spark_partition_id().as("p"))
      .distinct().groupBy("k").count()
      .agg(max("count")).head().getLong(0)
    assert(spread == 1L, "each key must land in exactly one partition")
  }

  test("mortonKey interleaves bits exactly (a even, b odd)") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .select(Layout.mortonKey(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 15L, 0xFFFFFFFFL))
  }

  test("zorder partitions cover compact rectangles in both dimensions") {
    val grid = (0 until 4096).map { i => (i.toLong, (i % 64).toDouble, (i / 64).toDouble) }
      .toDF("id", "x", "y")
    val z = Layout.zorderLayout(grid, 16, col("x"), 0, 63, col("y"), 0, 63)
    val boxes = z.select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(max("x") - min("x"), max("y") - min("y"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // a z-curve over 16 partitions of a 64x64 grid keeps every partition
    // inside a fraction of BOTH axis ranges; a plain sort by x would leave
    // the full 63-wide y range in every partition
    assert(boxes.nonEmpty && boxes.forall { case (dx, dy) => dx <= 32 && dy <= 32 },
      s"loose bounding boxes: ${boxes.toSeq}")
    // and the layout preserves the rows themselves
    assert(z.count() == 4096)
  }

  test("compactDir: sizes output from measured bytes, preserves rows") {
    val dir = GraftTestSpark.tempPath("graft_cmp").toString
    (1L to 10000L).toDF("id").repartition(20)
      .write.mode("overwrite").parquet(s"$dir/frag")
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(s"$dir/frag") == 20)
    val total = new java.io.File(s"$dir/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = ceil(bytes/3) so the file count is exactly 3 regardless
    // of byte-level rounding (a floor target can tip the ceil to 4)
    val n = Layout.compactDir(spark, s"$dir/frag", s"$dir/out",
      (total + 2) / 3)
    assert(n == 3 && parts(s"$dir/out") == 3)
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() == 10000L)
    assert(got.agg(sum(col("id"))).head().getLong(0) == 10000L * 10001L / 2)
  }

  test("compactDir measures PARTITIONED layouts recursively (the " +
      "streaming-sink batch_id=N shape), not just flat directories") {
    val dir = GraftTestSpark.tempPath("graft_cmp_p").toString
    (1L to 10000L).toDF("id").withColumn("p", col("id") % 4)
      .repartition(8)
      .write.partitionBy("p").mode("overwrite").parquet(s"$dir/part")
    // data files all live BELOW the top level here; a flat listing
    // measures 0 bytes and collapses everything to one file
    def bytes(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(bytes).sum
      else if (f.getName.endsWith(".parquet")) f.length() else 0L
    val total = bytes(new java.io.File(s"$dir/part"))
    assert(total > 0L)
    val n = Layout.compactDir(spark, s"$dir/part", s"$dir/out",
      (total + 2) / 3)
    assert(n == 3)
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() == 10000L)
    assert(got.agg(sum(col("id"))).head().getLong(0) == 10000L * 10001L / 2)
  }
}
