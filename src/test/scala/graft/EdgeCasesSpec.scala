package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Similarity, TextStats}

/** Inputs the corpus never produces but a 100 TB one will: empty frames,
  * empty strings, nulls, zero vectors.
  */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("dedup ops on an empty frame return empty, not error") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactDupGroups(empty).count() == 0)
    assert(Dedup.minhashNearDupPairs(empty, 0.9).count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, 1, 0.9, 100).count() == 0)
  }

  test("token stats on empty and single-token strings") {
    val df = Seq("", "solo").toDF("text").select(
      TextStats.tokenCount($"text").as("n"),
      TextStats.distinctTokenCount($"text").as("d"),
      TextStats.regexTokenCount($"text").as("w"))
    val rows = df.collect()
    // split("", " ") yields [""] — one empty token, the pandas-compatible
    // convention; the regex counter sees zero word tokens
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(2) == 0L)
    assert(rows(1).getLong(0) == 1L && rows(1).getLong(1) == 1L
      && rows(1).getLong(2) == 1L)
  }

  test("repetition and contamination degrade to 0 on null/empty/short text") {
    val docs = Seq((0L, Some("a b c d e f")), (1L, None), (2L, Some("")),
        (3L, Some("x y")))
      .toDF("doc_id", "text")
    val rep = docs.select($"doc_id", TextStats.repetitionMicroFromShingles(
        TextStats.shingles(TextStats.tokens($"text"), 3)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null tokens → null size → shingle guard falls to the empty branch →
    // score 0, same as genuinely-short docs; no ANSI divide, no crash
    assert(rep == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
    val contam = TextStats.contaminationMicro(docs, benchMaxId = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0 IS the benchmark (score 1e6); everything else has no grams →
    // dropped by the explode, restored from the id spine at 0
    assert(contam == Map(0L -> 1000000L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("null text flows through fingerprints as null, not a crash") {
    val df = Seq(Some("abc"), None).toDF("text").select(
      TextStats.fingerprint($"text").as("fp"),
      TextStats.simhash64($"text").as("sig"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("DotProduct: empty arrays give 0, mismatched lengths use the prefix") {
    val df = Seq(
      (Array.empty[Float], Array.empty[Float]),
      (Array(1.0f, 2.0f, 3.0f), Array(10.0f))
    ).toDF("a", "b").select(graft.functions.ArrayMath.dot($"a", $"b"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 10.0))
  }

  test("DotProduct propagates null inputs as null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(graft.functions.ArrayMath.dot($"a", $"b"))
    assert(df.head().isNullAt(0))
  }

  test("cosine with a zero vector is NaN (0/0), never an exception") {
    val d = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).head().getDouble(0)
    assert(d.isNaN)
  }

  test("ngram jaccard with n=2 survives docs shorter than the shingle") {
    val d = Seq((0L, "solo"), (1L, ""), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, n = 2, minJaccard = 0.9, maxId = 10)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 3L)))
  }

  test("corrMatrix returns NaN (not a crash) for zero-variance columns") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "const")
    val m = graft.ops.Stats.corrMatrix(df, Seq("x", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("x", "x")) == 1.0)
    assert(m(("x", "const")).isNaN)
  }

  test("target encoding keeps null-category rows") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0))
      .toDF("cat", "y")
    val out = graft.ml.TargetEncode.transform(df, "cat", "y", m = 0.0, "enc")
    assert(out.count() == 3)
    val nullRow = out.filter($"cat".isNull).head()
    assert(nullRow.getDouble(nullRow.fieldIndex("enc")) == 10.0)
  }

  test("asofJoin returns the newest matching row even when its value is null") {
    val left = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      ("u", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1L, Some(5.0)),
      ("u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L, Option.empty[Double])
    ).toDF("k", "rt", "tie", "v")
    val out = graft.ops.TimeSeries.asofJoin(left, right, "k", "t", "rt",
      Seq("v"), rightTieBreak = Some("tie")).head()
    // the 10:00 row is the answer; its null must NOT be replaced by 09:00's 5.0
    assert(out.isNullAt(out.fieldIndex("v")))
  }

  test("banded simhash with bands=1 buckets on the full signature") {
    val d = Seq((0L, "a b c"), (1L, "x y z w q")).toDF("doc_id", "text")
    // distinct signatures → distinct single-band keys → no candidates;
    // before the mask fix every row collapsed into bucket 0
    assert(Dedup.simhashNearDupPairs(d, maxHamming = 0, bands = 1).count() == 0)
  }

  test("knn over fewer corpus rows than k returns what exists") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(tiny, tiny.filter($"vec_id" === 0), k = 10)
    assert(out.count() == 2) // self excluded, only 2 neighbors exist
  }

  test("tfidf and funnel are empty-frame safe") {
    import org.apache.spark.sql.types._
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(TextStats.tfidfTopTerms(emptyDocs, k = 3).count() == 0)
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("ts", TimestampType))))
    val funnel = graft.ops.Funnel.conversionCounts(
      emptyEvents, Seq("view", "click"))
    // step rows still exist; every count is zero
    assert(funnel.collect().map(_.getLong(2)).toSeq == Seq(0L, 0L))
  }

  test("pivot values containing dots resolve via backtick quoting") {
    val df = Seq(("d1", "ST. ANN"), ("d1", "ST. ANN"), ("d2", "PLAIN"))
      .toDF("district", "category")
    val ranked = graft.ops.Pivot.pivotCountRanked(df, "district", "category",
      Seq("ST. ANN", "PLAIN")).collect()
    assert(ranked.head.getString(0) == "d1") // 2 events ranks first
    assert(ranked.map(_.getLong(3)).toSeq == Seq(2L, 1L)) // row totals
  }

  test("pivot with a numeric row key keeps a null-key group null") {
    val df = Seq((Some(1L), "A"), (None, "A"), (None, "B"))
      .toDF("store", "cat")
    val p = graft.ops.Pivot.pivotCount(df, "store", "cat", Seq("A", "B"))
    val nullRow = p.filter(col("store").isNull).collect()
    // the null group survives AS null (not rewritten to store 0)
    assert(nullRow.length == 1 && nullRow.head.getLong(1) == 1L
      && nullRow.head.getLong(2) == 1L)
  }

  test("z-score on degenerate inputs yields NaN, not an ANSI crash") {
    // all-equal balances: variance 0 → every z is NaN. Drives the
    // PRODUCTION query over a temp customer dir (the real corpus is never
    // degenerate, so this fixture is the NaN branch's only coverage and a
    // local formula replica would bind nothing)
    val dir = GraftTestSpark.tempPath("graft_zs_edge").toString
    Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val z = graft.ops.RelationalQueries.zscoreAcctbal(spark, dir)
      .collect().map(_.getAs[Double]("z"))
    assert(z.length == 3 && z.forall(_.isNaN))
    // single row: the n <= 1 guard, not a DIVIDE_BY_ZERO
    val dir1 = GraftTestSpark.tempPath("graft_zs1").toString
    Seq((1L, 5.0)).toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir1/customer.parquet")
    val z1 = graft.ops.RelationalQueries.zscoreAcctbal(spark, dir1)
      .collect().map(_.getAs[Double]("z"))
    assert(z1.length == 1 && z1.head.isNaN)
  }

  test("waterfill: single group gets exactly the budget; equal groups split it") {
    import graft.ops.Sampling
    val one = Seq(("only", 100L)).toDF("g", "c")
    val r1 = Sampling.waterfillAlloc(one, "g", "c", 0.5).collect().head
    assert(r1.getAs[Double]("alloc") == 50.0 && r1.getAs[Long]("capped") == 1L)
    // four equal groups: level = budget/4, every group capped identically
    val eq = Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L))
      .toDF("g", "c")
    val rs = Sampling.waterfillAlloc(eq, "g", "c", 0.5).collect()
    assert(rs.forall(_.getAs[Double]("alloc") == 50.0))
    assert(rs.forall(_.getAs[Long]("capped") == 1L))
  }

  test("source cap keeps everything when a source is under the cap") {
    // drives the PRODUCTION query over a temp documents dir: "tiny" (2
    // docs) survives whole, "big" (cap + 2 docs) keeps exactly the cap,
    // largest-first with the id tie-break
    val cap = graft.llm.Curation.capPerSource
    val docs = (Seq((0L, "tiny", 5L), (1L, "tiny", 9L)) ++
      (0 until cap + 2).map(i => (100L + i, "big", 50L - i)))
      .toDF("doc_id", "source", "n_chars")
    val dir = GraftTestSpark.tempPath("graft_cap_edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.llm.Curation.sourceCap(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    assert(kept.filter(_._1 == "tiny").map(_._2).sorted.toSeq == Seq(0L, 1L))
    // "big" keeps the cap largest docs = the lowest ids (n_chars desc)
    assert(kept.filter(_._1 == "big").map(_._2).sorted.toSeq ==
      (0 until cap).map(100L + _))
  }

  test("ewma of a single row is the row's value; empty frame stays empty") {
    import graft.ops.TimeSeries
    val one = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      42.5)).toDF("id", "k", "t", "v")
    assert(TimeSeries.ewma(one, "k", "t", "id", "v", 0.5, 8)
      .select("ewma").head().getDouble(0) == 42.5)
    val empty = Seq.empty[(Long, String, java.sql.Timestamp, Double)]
      .toDF("id", "k", "t", "v")
    assert(TimeSeries.ewma(empty, "k", "t", "id", "v", 0.5, 8).count() == 0)
  }

  test("weightedSample: k larger than the group returns the whole group; " +
      "equal weights still produce a total order") {
    import graft.ops.Sampling
    val tiny = Seq((1L, "s", 5L), (2L, "s", 5L), (3L, "s", 5L))
      .toDF("id", "src", "w")
    val all3 = Sampling.weightedSample(tiny, "src", "id", "w", k = 10)
      .collect()
    assert(all3.length == 3)
    assert(all3.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L))
    // equal weights: ranking reduces to the md5-uniform order — ranks
    // must still be distinct and deterministic
    val again = Sampling.weightedSample(tiny, "src", "id", "w", k = 10)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("id"))).toSet
    assert(again == all3.map(r =>
      (r.getAs[Long]("rk"), r.getAs[Long]("id"))).toSet)
  }

  test("dupSpans: identical docs are fully duplicated, sub-shingle docs " +
      "score zero") {
    // two byte-identical 4-token docs: every position sits in a shared
    // shingle → dup_tokens = n_tokens, one run, micro = 1000000; the
    // 2-token doc cannot form a shingle → all zeros
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val dir = GraftTestSpark.tempPath("graft_ds_edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.llm.CorpusQueries.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_runs"),
        r.getAs[Long]("dupspan_micro")))).toMap
    assert(out(1L) == ((4L, 4L, 1L, 1000000L)))
    assert(out(2L) == ((4L, 4L, 1L, 1000000L)))
    assert(out(3L) == ((2L, 0L, 0L, 0L)))
  }

  test("robustZscore: constant values give MAD 0 and zero outliers") {
    // |x - med| = 0 for every row; the > threshold comparison is strict,
    // so nothing flags — the degenerate case a stddev z-score turns into
    // 0/0 NaNs
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dir = GraftTestSpark.tempPath("graft_rz_edge").toString
    (1 to 6).map(i => (i.toLong, 1L, "t", (base + i * 1000L) * 1000000L, 7.5))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.StatsQueries.robustZscore(spark, dir).collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  test("mmrSelect with k beyond the candidate pool emits the pool and stops") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.5f, 0.5f)),
      (11L, Array(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(emb, emb.filter($"vec_id" < 1L),
      m = 5, k = 10, lambda = 0.7).collect()
    assert(out.length == 2) // only two candidates exist
    assert(out.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L))
  }

  test("mmrSelect with a 1-candidate pool emits that candidate at rk=1") {
    // a singleton pool produces NO id_a < id_b pair row — a first cut that
    // built per-query state solely from the pair frame never reached
    // flatMapGroups for such queries and they silently vanished, while
    // the oracle emits the lone candidate at rk=1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (10L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(emb, emb.filter($"vec_id" < 1L),
      m = 5, k = 3, lambda = 0.7).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("rk") == 1L)
    assert(out.head.getAs[Long]("vec_id") == 10L)
  }

  test("bpeTrain stops early when merges exhaust before k rounds") {
    // corpus supports exactly 1 multi-char merge ("ab"); asking for 5
    // must report 1 merge and a final segmentation, not crash or loop
    val docs = Seq((0L, "ab ab x"), (1L, "ab y")).toDF("doc_id", "text")
    val out = graft.llm.CorpusQueries.bpeLearnFromDocs(docs, k = 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("left_sym") == "a")
    assert(out.head.getAs[String]("right_sym") == "b")
    val vocab = graft.llm.CorpusQueries.bpeVocabFromDocs(docs, k = 5, topK = 10)
      .collect().map(_.getString(0))
    assert(vocab.contains("ab")) // the merged symbol survives to the vocab
  }

  test("importance weights survive an absent target slice (uniform target LM)") {
    // no doc matches the target source: t_tot = 0, add-1 smoothing keeps
    // every target logprob at ln(1/(0+V)) — finite, no crash, and the
    // highest weight goes to the doc with rarest corpus tokens
    val docs = Seq((0L, "othersrc", "common common common"),
        (1L, "othersrc", "rare"), (2L, "othersrc", "common rare"))
      .toDF("doc_id", "source", "text")
    val dir = GraftTestSpark.tempPath("graft_iw").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.llm.Curation.importanceWeights(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("llr")).toMap
    assert(out.size == 3 && out.values.forall(v => !v.isNaN && !v.isInfinite))
    // target LM is uniform, so the LLR ranks docs by corpus-token rarity
    assert(out(1L) > out(2L) && out(2L) > out(0L))
  }

  test("wave-7/8 graph/dedup ops degrade to empty, not error, on empty " +
      "or degenerate input") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.ops.Graph.triangleStats(emptyPairs).count() == 0)
    // self-loops and duplicates collapse; a single edge has no triangle
    val loops = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    val t = graft.ops.Graph.triangleStats(loops).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tri")).toMap
    assert(t == Map(1L -> 0L, 2L -> 0L))
    val emptyComps = Seq.empty[(Long, Long)].toDF("id", "component")
    val docs = Seq((1L, 5L)).toDF("doc_id", "n_chars")
    assert(Dedup.keepBestPerCluster(emptyComps, docs, "n_chars").count() == 0)
  }

  test("classBalance on a single class keeps everything; skewReport on " +
      "one key scores Gini 0 with full top-1 share") {
    val one = Seq((1L, "only"), (2L, "only"), (3L, "only"))
      .toDF("id", "cls")
    val kept = graft.ops.Sampling.classBalance(one, "cls", "id")
    assert(kept.count() == 3)
    def ns(sec: Long): Long = sec * 1000000000L
    val rows = Seq((1L, 7L, "solo", ns(1), 1.0), (2L, 7L, "solo", ns(2), 1.0))
    val dir = GraftTestSpark.tempPath("graft_edge1").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.StatsQueries.skewReport(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("gini_micro"),
        r.getAs[Long]("top1_micro")))).toMap
    // a single key: perfectly equal "distribution", all mass in top-1
    assert(got("user_id") == ((0L, 1000000L)))
    assert(got("event_type") == ((0L, 1000000L)))
  }

  test("bm25 returns empty when no document contains a query term; " +
      "funnelTime yields zero conversions without purchases") {
    val docs = Seq((1L, "pad pad pad", "a", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = GraftTestSpark.tempPath("graft_edge2").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.llm.CorpusQueries.bm25Rank(spark, dir).count() == 0)
    def ns(sec: Long): Long = sec * 1000000000L
    Seq((1L, 1L, "signup", ns(1), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.StatsQueries.funnelTime(spark, dir).head()
    assert(r.getAs[Long]("n_converted") == 0L)
  }

  test("Explain.eagerQueries names real queries (typo canary for the " +
      "construction-eager exclusion list)") {
    assert(graft.Explain.eagerQueries.subsetOf(
      graft.SparkEntry.queries.keySet))
  }

  test("decimal-routed micro ratios stay exact past the Long product " +
      "ceiling (triangle lcc denominator + microRatioDec vs BigInt)") {
    // deg values where deg*(deg-1) or 1e6*num wrap Long: the decimal
    // route must keep producing the exact floor the BigInt reference does
    val cases = Seq(
      (3L, 1L),                       // tiny sanity: lcc = 1/3 in micro
      (4300000L, 9000000000000L),     // n_tri near the old 1e6·num ceiling
      (3100000000L, 4000000000000000000L), // deg·(deg−1) past 2^63
      (5000000000L, 9000000000000000000L)) // both far past Long products
    val df = cases.toDF("deg", "n_tri")
    val got = df.select($"deg",
        graft.llm.TextStats.microRatioDec($"n_tri",
          expr("CAST(deg AS DECIMAL(38,0)) * (deg - 1) / 2")).as("lcc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (deg, tri) =>
      val den = (BigInt(deg) * (deg - 1)) / 2
      val want = (BigInt(tri) * 1000000 / den).toLong
      assert(got(deg) == want, s"deg=$deg: got ${got(deg)}, want $want")
    }
  }

  test("Multimodal.microMean: exact floor mean past the 1e6·sum Long " +
      "ceiling, 0 on empty") {
    import graft.llm.Multimodal
    assert(Multimodal.microMean(0L, 0L) == 0L)
    assert(Multimodal.microMean(7L, 2L) == 3500000L)
    // the 2 GB-payload worst case: ~1e9 samples all at int16 max — the
    // direct product 1e6·sum wraps negative; the split identity must not
    val sum = 32767L * 1000000000L
    val n = 1000000000L
    assert(Multimodal.microMean(sum, n) ==
      (BigInt(sum) * 1000000 / n).toLong)
    // a non-divisible case exercising the remainder term at scale
    assert(Multimodal.microMean(9223372036854775L, 333333333L) ==
      (BigInt(9223372036854775L) * 1000000 / 333333333L).toLong)
    // the overflow guard: a mean too large to micro-scale must fail
    // loudly (this is where the pre-guard code wrapped silently)...
    intercept[IllegalArgumentException] {
      Multimodal.microMean(Long.MaxValue, 1L)
    }
    // ...but the guard is EXACT, not conservative: the largest mean
    // whose scaled result still fits must compute, not throw
    assert(Multimodal.microMean(9223372036854L, 1L) ==
      9223372036854000000L)
    intercept[IllegalArgumentException] {
      Multimodal.microMean(9223372036855L, 1L) // one past: result wraps
    }
    // the astronomically-large-n branch: r > Long.MaxValue/1e6, where
    // 1e6·r itself would wrap — the BigInt fallback must stay exact
    val bigN = 10000000000000L
    val bigSum = bigN + 9900000000000L // q = 1, r = 9.9e12
    assert(Multimodal.microMean(bigSum, bigN) ==
      (BigInt(bigSum) * 1000000 / bigN).toLong)
  }
}
