package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool (round-21 optimization): interleaved A/B timing of query
  * pipelines under the exact Bench session config. Variants run
  * round-robin (A,B,A,B,...) so host-contention windows hit every arm
  * equally, and the per-variant MEDIAN is reported — the honest
  * comparison instrument on a shared host (BASELINE.md medians rule).
  *
  * Usage: runMain graft.Prof <profileName>   (SF from SPARK_GRAFT_SF_DIR,
  * rounds from SPARK_GRAFT_PROF_RUNS, default 5)
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse(sys.error("usage: Prof <profile>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        println(s"[prof] conf $k=$v")
      })

    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "5").toInt.max(1)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    try noop(SparkEntry.queries("q_counts_by_type")(spark, sfDir))
    catch { case _: Throwable => () }
    println(HostTelemetry.stampLine("prof"))

    val variants: Seq[(String, () => DataFrame)] = profiles(spark, sfDir)(which)
    // one untimed warm run per variant (codegen/JIT), then interleave
    variants.foreach { case (_, mk) => noop(mk()) }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      variants.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        noop(mk())
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[prof] $name%-36s median=${ts.sorted.apply(ts.size / 2)}%.3f " +
        s"(all=${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    println(HostTelemetry.stampLine("prof"))
    spark.stop()
  }

  /** Named A/B profiles. "old" arms inline the pre-round-21 pipeline
    * shapes; "new" arms call the live code.
    */
  private def profiles(spark: SparkSession, sfDir: String)
      : Map[String, Seq[(String, () => DataFrame)]] = {
    import org.apache.spark.sql.functions._
    val docs = Tables.table(spark, sfDir, "documents")

    def oldNgram(maxId: Long): DataFrame = {
      val toks = docs.filter(col("doc_id") < maxId)
        .select(col("doc_id").as("id"),
          graft.llm.TextStats.tokens(col("text")).as("toks"))
      val shingled = toks.select(col("id"),
        array_distinct(col("toks")).as("shingles"))
      val sizes = shingled.select(col("id"), size(col("shingles")).as("n_sh"))
      val inv = shingled.select(col("id"),
          explode_outer(col("shingles")).as("sh"))
        .filter(col("sh").isNotNull)
      val shared = inv.as("x").join(inv.as("y"),
          col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.withColumnRenamed("id", "id_a")
          .withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
          .withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("jaccard", round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6))
        .filter(col("jaccard") >= 0.9)
        .select("id_a", "id_b", "jaccard")
    }

    def oldMinhash(): DataFrame = {
      val toks = docs.select(col("doc_id").as("id"),
        graft.functions.HashFamily.tokenHashSet(
          graft.llm.TextStats.tokens(col("text"))).as("hset"))
      val sigs = toks.select(col("id"),
        graft.functions.HashFamily.minhashSignature(col("hset"), 24).as("sig"))
      val r = 8
      val bandCols = (0 until 3).map { b =>
        val slice = (b * r until (b + 1) * r)
          .map(i => element_at(col("sig"), i + 1))
        when(slice.map(_.isNull).reduce(_ || _), lit(null).cast("long"))
          .otherwise(xxhash64((lit(b) +: slice): _*)).as(s"band$b")
      }
      val buckets = sigs.select(col("id"), posexplode(array(bandCols: _*)))
        .toDF("id", "band_idx", "band_key")
      val cand = buckets.as("x").join(buckets.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      val ta = toks.select(col("id").as("id_a"), col("hset").as("hset_a"))
      val tb = toks.select(col("id").as("id_b"), col("hset").as("hset_b"))
      cand.join(ta, "id_a").join(tb, "id_b")
        .withColumn("inter", graft.functions.SetMath
          .sortedIntersectCount(col("hset_a"), col("hset_b")))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (size(col("hset_a")) + size(col("hset_b")) - col("inter")), 6))
        .filter(col("jaccard") >= 0.9)
        .select("id_a", "id_b", "jaccard")
        .distinct()
        .orderBy("id_a", "id_b")
    }

    Map(
      "minhash" -> Seq(
        ("old q_minhash_pairs", () => oldMinhash()),
        ("new q_minhash_pairs", () =>
          graft.llm.Dedup.minhashNearDupPairs(docs, minJaccard = 0.9)
            .orderBy("id_a", "id_b"))),
      "ngram" -> Seq(
        ("old ngram pairs (1000)", () => oldNgram(1000L)),
        ("new ngram pairs (1000)", () =>
          graft.llm.Dedup.ngramJaccardPairs(docs, n = 1, minJaccard = 0.9,
            maxId = 1000L))),
      "cc" -> Seq(
        ("cc over new pairs", () => {
          val nodes = docs.filter(col("doc_id") < 1000L)
            .select(col("doc_id").as("id"))
          graft.llm.Dedup.connectedComponents(nodes,
            graft.llm.Dedup.ngramJaccardPairs(docs, n = 1, minJaccard = 0.9,
              maxId = 1000L))
        })),
      // round-22: pair-source A/B for the CC family — full inverted-index
      // join vs the PPJoin prefix form (identical result set)
      "gpairs" -> Seq(
        ("ngram pairs 1000 (full index)", () =>
          graft.llm.Dedup.ngramJaccardPairs(docs, n = 1, minJaccard = 0.9,
            maxId = 1000L)),
        ("prefix pairs 1000 (PPJoin)", () =>
          graft.llm.Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
            maxId = 1000L)),
        ("cc over ngram pairs 1000", () => {
          val nodes = docs.filter(col("doc_id") < 1000L)
            .select(col("doc_id").as("id"))
          graft.llm.Dedup.connectedComponents(nodes,
            graft.llm.Dedup.ngramJaccardPairs(docs, n = 1, minJaccard = 0.9,
              maxId = 1000L))
        }),
        ("cc over prefix pairs 1000", () => {
          val nodes = docs.filter(col("doc_id") < 1000L)
            .select(col("doc_id").as("id"))
          graft.llm.Dedup.connectedComponents(nodes,
            graft.llm.Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
              maxId = 1000L))
        })),
      // round-22: old (inline pre-round shapes) vs new (live code) for the
      // remaining batch — run under contention, interleaving is the
      // contention-robust instrument
      "r22b" -> {
        val events = Tables.table(spark, sfDir, "events")
        def oldCohort(): DataFrame = {
          val days = events
            .select(col("user_id"), to_date(col("ts")).as("day"))
            .distinct()
          val cohort = days.groupBy("user_id")
            .agg(min(col("day")).as("cohort_day"))
          days.join(cohort, Seq("user_id"))
            .groupBy(col("cohort_day"),
              datediff(col("day"), col("cohort_day")).cast("bigint")
                .as("day_offset"))
            .agg(count(lit(1)).as("users"))
            .orderBy("cohort_day", "day_offset")
        }
        val emb = Tables.table(spark, sfDir, "embeddings")
        Seq(
          ("old q_cohort_retention", () => oldCohort()),
          ("new q_cohort_retention", () =>
            graft.ops.EventQueries.cohortRetention(spark, sfDir)),
          ("new q_semantic_dedup", () =>
            graft.llm.Similarity.semanticDedupPairs(emb,
              minCosine = 0.3, maxId = 1000L).orderBy("id_a", "id_b")),
          ("new q_lsh_cosine_pairs", () =>
            graft.llm.LlmQueries.all("q_lsh_cosine_pairs")(spark, sfDir)),
          ("new q_simhash_banded", () =>
            graft.llm.LlmQueries.all("q_simhash_banded")(spark, sfDir)),
          ("new q_dup_spans", () =>
            graft.llm.CorpusQueries.dupSpans(spark, sfDir)))
      }
    )
  }
}
