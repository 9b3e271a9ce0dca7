package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the hot bench queries — not part of the
  * driver contract; run via `sbt 'runMain graft.tools.Profile <sfDir>'`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.cache().count()

    import graft.llm.{Dedup, TextStats}
    val toks = docs.select(col("doc_id").as("id"),
      array_distinct(TextStats.tokens(col("text"))).as("toks"))
    val numHashes = 24; val bands = 3; val r = numHashes / bands
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("toks"), t => xxhash64(lit(i), t))).as(s"h$i")
    }
    val sigs = toks.select(col("id") +: sigCols: _*)
    time("signatures")(sigs.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (b * r until (b + 1) * r).map(i => col(s"h$i"))): _*)
        .as(s"band$b")
    }
    val buckets = sigs.select(col("id"), posexplode(array(bandCols: _*)))
      .toDF("id", "band_idx", "band_key")
    val bstats = time("bucket stats")(
      buckets.groupBy("band_idx", "band_key").count()
        .agg(count(lit(1)), max("count"), sum(col("count") * col("count")))
        .collect()(0))
    println(s"[profile] buckets: n=${bstats.get(0)} maxSize=${bstats.get(1)} sumSq=${bstats.get(2)}")
    val cand0 = buckets.as("x").join(buckets.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val nCand0 = time("candidates pre-distinct")(cand0.count())
    val cand = cand0.distinct()
    val nCand = time("candidates distinct")(cand.count())
    println(s"[profile] candidates: pre=$nCand0 post=$nCand")
    val ta = toks.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val tb = toks.select(col("id").as("id_b"), col("toks").as("toks_b"))
    val verified = cand.join(ta, "id_a").join(tb, "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("toks_a")) + size(col("toks_b")) - col("inter")), 6))
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b", "jaccard")
    time("verify join")(verified.write.format("noop").mode("overwrite").save())

    time("full minhashNearDupPairs")(
      Dedup.minhashNearDupPairs(docs, 0.9).write.format("noop").mode("overwrite").save())
    time("full nearDedupKeepFirst")(
      Dedup.nearDedupKeepFirst(docs, 0.9).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
