package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Shared helper: Zipf slope of a tiny corpus, computed entirely in
  * driver-side Scala — an INDEPENDENT reference implementation of
  * [[CorpusQueries.zipfSlope]]'s semantics (rank by count desc / token
  * asc, population least-squares of ln f on ln r, round-6, NaN on zero
  * rank variance), so the spec compares two implementations that share
  * no code path.
  */
object CorpusQueriesSpecHelper {
  import org.apache.spark.sql.SparkSession
  def slopeOf(spark: SparkSession, texts: Seq[String]): Double = {
    // NOTE: production TextStats.tokens (Spark split on a single space)
    // KEEPS empty tokens from consecutive/leading/trailing spaces, while
    // this helper drops them. The two agree only because the fixture
    // corpus is single-space-delimited — assert that assumption so a
    // fixture change fails loudly here instead of as a silent divergence.
    require(texts.forall(t => !t.contains("  ") && !t.startsWith(" ") &&
      !t.endsWith(" ")), "helper assumes single-space tokenization")
    val counts = texts.flatMap(_.split(" ")).filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val ranked = counts.sortBy { case (tok, c) => (-c, tok) }.zipWithIndex
      .map { case ((_, c), i) => (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = ranked.size.toDouble
    val mx = ranked.map(_._1).sum / n
    val my = ranked.map(_._2).sum / n
    val vr = ranked.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    if (vr == 0.0) Double.NaN
    else {
      val cv = ranked.map(p => (p._1 - mx) * (p._2 - my)).sum / n
      BigDecimal(cv / vr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}

/** Unit semantics for the second-wave corpus operators (the hash-level
  * cross-engine proof lives in the DuckDB oracle gate; these pin the
  * intended behavior on small hand-checked frames).
  */
class CorpusQueriesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("gopher rules: flags fire exactly at their thresholds") {
    val out = CorpusQueries.gopherRules(spark, sf)
    val r = out.collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_tokens")
      val mean = row.getAs[Long]("mean_len_micro")
      val stops = row.getAs[Long]("stop_hits")
      assert(row.getAs[Long]("flag_short") == (if (n < 50) 1L else 0L))
      assert(row.getAs[Long]("flag_meanlen") ==
        (if (mean < 3000000L || mean > 10000000L) 1L else 0L))
      assert(row.getAs[Long]("flag_stop") == (if (stops < 2) 1L else 0L))
      val expectKeep = n >= 50 && mean >= 3000000L && mean <= 10000000L &&
        stops >= 2
      assert(row.getAs[Long]("keep") == (if (expectKeep) 1L else 0L))
    }
  }

  test("gopher mean token length is an exact floor-division micro-unit") {
    // "ab cde" → 5 chars / 2 tokens = 2.5 → 2500000 micro exactly
    val micro = Seq("ab cde").toDF("text")
      .select(TextStats.tokens($"text").as("t"))
      .select(TextStats.microRatio(
        TextStats.sumTokenLengthsFromTokens($"t"),
        size($"t").cast("bigint")).as("m"))
      .head().getLong(0)
    assert(micro == 2500000L)
  }

  test("heavy hitters: top-k in count-desc token-asc total order") {
    val out = CorpusQueries.heavyHitters(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    val pairs = out.map(r => (r.getAs[Long]("cnt"), r.getAs[String]("token")))
    pairs.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) =>
        assert(c1 > c2 || (c1 == c2 && t1 < t2))
      case _ =>
    }
    // the limit really kept the TOP k: every kept count >= every dropped
    val all = graft.Tables.table(spark, sf, "documents")
      .select(explode_outer(TextStats.tokens($"text")).as("token"))
      .filter($"token".isNotNull)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getAs[Long]("cnt"), r.getAs[String]("token")))
    val kept = pairs.toSet
    val dropped = all.filterNot(kept)
    if (dropped.nonEmpty && out.length == 20) {
      val worstKept = pairs.last
      dropped.foreach { d =>
        assert(d._1 < worstKept._1 || (d._1 == worstKept._1 && d._2 > worstKept._2))
      }
    }
  }

  test("unigram logprob: uniform corpus scores ln(1/V) everywhere") {
    // a corpus where every token appears the same number of times: every
    // doc's average logprob is exactly ln(freq/total)
    val docs = Seq((0L, "x y"), (1L, "y x")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("unigram_docs")
    val tok = docs.select($"doc_id", explode(TextStats.tokens($"text")).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum($"cnt").as("total"))
    val lp = freq.crossJoin(broadcast(tot))
      .select($"token", log($"cnt".cast("double") / $"total").as("lp"))
    val perDoc = tok.join(lp, Seq("token")).groupBy("doc_id")
      .agg(round(sum($"lp") / count(lit(1)), 6).as("avg_logprob"))
      .collect()
    val expect = BigDecimal(math.log(2.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    perDoc.foreach(r => assert(r.getAs[Double]("avg_logprob") == expect))
  }

  test("dup spans: adjacent shared shingles merge into one run, " +
      "separated ones stay two, unique docs score zero") {
    // A and B and D share "a b c"; B and D share "x y z". In B the two
    // shared shingles are ADJACENT (positions 1-3 and 4-6 merge into one
    // 6-token run); in D they are separated by unique tokens (two runs
    // of 3). C shares nothing.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y z a b c q r s"),
      (3L, "u v w m n o"),
      (4L, "p p x y z p p p a b c")).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = GraftTestSpark.tempPath("graft_spans")
    try {
      docs.coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/__t/documents.parquet")
      val part = new java.io.File(s"$tmp/__t/documents.parquet").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/documents.parquet"))
      val out = CorpusQueries.dupSpans(spark, tmp.toString).collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
          r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("max_run"), r.getAs[Long]("dupspan_micro"))).toMap
      assert(out(1L) == ((6L, 3L, 1L, 3L, 500000L)), s"A: ${out(1L)}")
      assert(out(2L) == ((9L, 6L, 1L, 6L, 666666L)), s"B: ${out(2L)}")
      assert(out(3L) == ((6L, 0L, 0L, 0L, 0L)), s"C: ${out(3L)}")
      assert(out(4L) == ((11L, 6L, 2L, 3L, 545454L)), s"D: ${out(4L)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("interdoc dup: shared trigrams count, unique docs score zero") {
    import org.apache.spark.sql.DataFrame
    def run(docs: DataFrame): Map[Long, (Long, Long)] = {
      val sh = docs.select($"doc_id",
          TextStats.shingles(TextStats.tokens($"text"), 3).as("__raw"))
        .select($"doc_id", array_distinct($"__raw").as("__sh"))
      val ex = sh.select($"doc_id", explode_outer($"__sh").as("g"))
        .filter($"g".isNotNull)
      val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
      val agg = ex.join(dfreq, Seq("g")).groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("tot"),
          sum(when($"df" > 1L, 1L).otherwise(0L)).as("dup"))
      sh.select($"doc_id").join(agg, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"tot", lit(0L)).as("tot"),
          TextStats.microRatio(coalesce($"dup", lit(0L)),
            coalesce($"tot", lit(0L))).as("micro"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val m = run(Seq(
      (0L, "a b c d"),   // trigrams: "a b c", "b c d"
      (1L, "a b c x"),   // shares "a b c" with doc 0
      (2L, "p q r s"),   // unique
      (3L, "p")          // too short: zero shingles, still present
    ).toDF("doc_id", "text"))
    assert(m(0L) == ((2L, 500000L))) // 1 of 2 trigrams shared
    assert(m(1L) == ((2L, 500000L)))
    assert(m(2L) == ((2L, 0L)))
    assert(m(3L) == ((0L, 0L)))     // degraded, not dropped
  }

  test("seq pack: bins respect the budget boundary and cover every doc") {
    val out = CorpusQueries.seqPack(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per-source bin ids are dense from 0 and doc totals reconcile
    val docs = graft.Tables.table(spark, sf, "documents")
      .select($"source", TextStats.tokenCount($"text").as("n"))
      .groupBy("source").agg(count(lit(1)).as("docs"), sum($"n").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ids = rs.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head == 0L)
      assert(rs.map(_.getAs[Long]("n_docs")).sum == docs(src)._1)
      assert(rs.map(_.getAs[Long]("bin_tokens")).sum == docs(src)._2)
    }
  }

  test("pii redact: typed placeholders, exact counts, idempotent") {
    val t = "call +141555501234 or mail bob@site.org from 10.0.3.7 x@y.io"
    val row = Seq(t).toDF("text")
      .select(TextStats.redactPii($"text").as("red"),
        size(regexp_extract_all($"text", lit(TextStats.emailRe), lit(0)))
          .as("emails"),
        size(regexp_extract_all($"text", lit(TextStats.ipv4Re), lit(0)))
          .as("ips"),
        size(regexp_extract_all($"text", lit(TextStats.phoneRe), lit(0)))
          .as("phones"))
      .head()
    assert(row.getAs[String]("red") ==
      "call <PHONE> or mail <EMAIL> from <IP> <EMAIL>")
    assert(row.getAs[Int]("emails") == 2)
    assert(row.getAs[Int]("ips") == 1)
    assert(row.getAs[Int]("phones") == 1)
    // idempotent: placeholders contain nothing any pattern can match
    val twice = Seq(t).toDF("text")
      .select(TextStats.redactPii(TextStats.redactPii($"text"))).head().getString(0)
    assert(twice == row.getAs[String]("red"))
  }

  test("md5 hash sample: deterministic, k per group, hash-ordered") {
    val docs = graft.Tables.table(spark, sf, "documents")
      .select($"doc_id", $"source")
    def sample() = graft.ops.Sampling
      .md5RankSample(docs, "source", "doc_id", 5)
      .select("source", "rk", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val s1 = sample()
    assert(s1 == sample()) // reproducible across runs
    val perGroup = s1.groupBy(_._1)
    perGroup.values.foreach(g => assert(g.length <= 5))
    // the sample is hash-ordered, not id-ordered: across all sources at
    // least one sampled id must differ from the group's smallest ids
    val idOrdered = docs.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).sorted.take(5).toSeq }
    assert(perGroup.exists { case (s, g) =>
      g.map(_._3).sorted.toSeq != idOrdered(s) })
  }

  test("bigram logprob: exact conditional probabilities on a hand corpus") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "z")).toDF("doc_id", "text")
    val bg = docs.select($"doc_id",
      TextStats.shingles(TextStats.tokens($"text"), 2).as("__bg"))
    val ex = bg.select($"doc_id", explode_outer($"__bg").as("g"))
      .filter($"g".isNotNull)
    val freq = ex.groupBy("g").agg(count(lit(1)).as("cnt"))
    val pt = freq.groupBy(substring_index($"g", " ", 1).as("w1"))
      .agg(sum($"cnt").as("ptot"))
    val p = freq.withColumn("w1", substring_index($"g", " ", 1))
      .join(pt, Seq("w1"))
      .select($"g", log($"cnt".cast("double") / $"ptot").as("lp"))
    val agg = ex.join(p, Seq("g")).groupBy("doc_id")
      .agg(round(sum($"lp") / count(lit(1)), 6).as("avg_logprob"))
    val out = docs.select($"doc_id").join(agg, Seq("doc_id"), "left")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    // bigrams: "a b" ×1, "a c" ×1 → P(b|a) = P(c|a) = 1/2
    val half = BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L).contains(half))
    assert(out(1L).contains(half))
    assert(out(2L).isEmpty) // single-token doc: no bigrams, NULL score
  }

  test("source vocab: type-token ratio on a hand corpus") {
    val docs = Seq((0L, "a b a", "s1"), (1L, "a a", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val out = docs
      .select($"source", $"doc_id", explode(TextStats.tokens($"text")).as("token"))
      .groupBy("source")
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_tokens"),
        countDistinct($"token").as("n_vocab"))
      .withColumn("ttr_micro", TextStats.microRatio($"n_vocab", $"n_tokens"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("s1") == ((2L, 5L, 2L, 400000L))) // 2 vocab / 5 tokens
    assert(out("s2") == ((1L, 2L, 2L, 1000000L)))
  }

  test("bpe pairs: corpus-frequency-weighted adjacent char counts, " +
      "1-char tokens guarded") {
    // "ab ab x abc": token freqs ab×2, x×1, abc×1 → pairs: "ab" 2+1=3,
    // "bc" 1; "x" contributes nothing (guarded, not a crash)
    val freq = Seq("ab ab x abc").toDF("text")
      .select(explode_outer(TextStats.tokens($"text")).as("token"))
      .filter($"token".isNotNull)
      .groupBy("token").agg(count(lit(1)).as("c"))
    val pairsArr = when(length($"token") >= 2,
        transform(sequence(lit(1), length($"token") - 1),
          i => $"token".substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val out = freq.select($"c", pairsArr.as("__pairs"))
      .select($"c", explode_outer($"__pairs").as("pair"))
      .filter($"pair".isNotNull)
      .groupBy("pair").agg(sum($"c").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ab" -> 3L, "bc" -> 1L))
  }

  test("quality mix: bands partition the corpus and carry its token mass") {
    val rows = CorpusQueries.qualityMix(spark, sf).collect()
    val docs = graft.Tables.table(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = docs
      .select(sum(TextStats.tokenCount($"text"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("tokens")).sum == totalTokens)
    // bands are micro-unit quarters of [0, 1e6]
    rows.foreach(r => assert((0L to 4L).contains(r.getAs[Long]("band"))))
  }

  test("collocations: PMI of an always-together pair matches the formula") {
    // corpus "x y a" + "x y b": unigrams x2 y2 a1 b1 (utot 6); bigrams
    // "x y"×2, "y a", "y b" (btot 4) → PMI(x y) = ln((2/4)/((2/6)(2/6)))
    val docs = Seq((0L, "x y a"), (1L, "x y b")).toDF("doc_id", "text")
    val tok = docs.select(explode_outer(TextStats.tokens($"text")).as("token"))
      .filter($"token".isNotNull)
    val uni = tok.groupBy("token").agg(count(lit(1)).as("uc"))
    val ut = uni.agg(sum($"uc").as("utot"))
    val bg = docs.select(explode_outer(
        TextStats.shingles(TextStats.tokens($"text"), 2)).as("g"))
      .filter($"g".isNotNull)
    val big = bg.groupBy("g").agg(count(lit(1)).as("bc"))
    val bt = bg.agg(count(lit(1)).as("btot"))
    val pmi = big
      .withColumn("w1", substring_index($"g", " ", 1))
      .withColumn("w2", substring_index($"g", " ", -1))
      .join(uni.select($"token".as("w1"), $"uc".as("c1")), Seq("w1"))
      .join(uni.select($"token".as("w2"), $"uc".as("c2")), Seq("w2"))
      .crossJoin(bt).crossJoin(ut)
      .withColumn("pmi", round(
        log(($"bc".cast("double") / $"btot") /
          (($"c1".cast("double") / $"utot") * ($"c2".cast("double") / $"utot"))), 6))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("pmi")).toMap
    val expect = BigDecimal(math.log((2.0 / 4) / ((2.0 / 6) * (2.0 / 6))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi(("x y")) == expect)
  }

  test("zipf slope: uniform corpus is flat, decaying corpus is negative") {
    val uniform = CorpusQueriesSpecHelper.slopeOf(spark,
      Seq("a b c", "a b c")) // every token count 2 → ln f constant
    assert(uniform == 0.0)
    val decaying = CorpusQueriesSpecHelper.slopeOf(spark,
      Seq("a a a a b b c")) // counts 4, 2, 1
    assert(decaying < -1.0) // steeper than Zipf's -1 for this tiny corpus
    // exact least squares on the three (ln r, ln f) points
    val pts = Seq((math.log(1.0), math.log(4.0)), (math.log(2.0), math.log(2.0)),
      (math.log(3.0), math.log(1.0)))
    val mx = pts.map(_._1).sum / 3; val my = pts.map(_._2).sum / 3
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val expect = BigDecimal(slope)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(decaying - expect) <= 1e-6)
  }

  test("zipf slope: broadcast self-join head rank equals the window-rank form") {
    // the production query ranks the ≤1000-token head via a broadcast
    // self-join count (no window anywhere in the plan); with this
    // corpus's vocabulary < 1000 the head is the whole vocabulary, so
    // the result must equal the windowed reference bit-for-bit
    val texts = graft.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    val ref = CorpusQueriesSpecHelper.slopeOf(spark, texts)
    val got = CorpusQueries.zipfSlope(spark, sf).head().getAs[Double]("slope")
    // tolerance, not exact equality: Spark's covar_pop/var_pop merge order
    // differs from the helper's two-pass fold, so the pre-round values can
    // straddle a .5e-6 boundary under a different partition count
    assert(math.abs(got - ref) <= 1e-6, s"got $got, ref $ref")
  }

  test("char entropy: uniform alphabet hits ln(k), repetition scores low") {
    def entropyOf(text: String): Double =
      Seq((0L, text)).toDF("doc_id", "text")
        .select(round(graft.functions.CharEntropy.charEntropy($"text"), 6))
        .head().getDouble(0)
    val uniform = entropyOf("abcd") // 4 chars once each → ln 4
    val expect = BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(uniform == expect)
    assert(entropyOf("aaaa") == 0.0)     // one class → zero entropy
    assert(entropyOf("aaab") < uniform)  // skew lowers entropy
    assert(entropyOf("") == 0.0)         // total, not NaN (callers filter)
  }

  test("approx heavy hitters: CMS estimates bound exact counts, freqItems recalls them") {
    val out = CorpusQueries.approxHeavyHitters(spark, sf).collect()
    assert(out.length == 20)
    val tok = graft.Tables.table(spark, sf, "documents")
      .select(explode_outer(split($"text", " ")).as("token"))
      .filter($"token".isNotNull)
    val total = tok.count()
    // count-min never underestimates; overshoot is ≤ eps·N w.p. 0.99 per
    // query — 20 queries at 0.99 leave the joint bound loose, so allow 2×
    val slack = math.max(1L, (2 * CorpusQueries.cmsEps * total).toLong)
    out.foreach { r =>
      val (cnt, est) = (r.getAs[Long]("cnt"), r.getAs[Long]("cnt_est"))
      assert(est >= cnt, s"CMS underestimated ${r.getString(0)}: $est < $cnt")
      assert(est <= cnt + slack,
        s"CMS overshoot beyond 2·eps·N for ${r.getString(0)}: $est vs $cnt+$slack")
    }
    // recall side (candidate discovery at scale): freqItems guarantees a
    // SUPERSET of items with frequency above the support threshold, so
    // every exact top-20 token above it must be recalled
    val support = 0.01
    val recalled = tok.stat.freqItems(Array("token"), support)
      .head().getSeq[String](0).toSet
    out.filter(_.getAs[Long]("cnt") > support * total).foreach { r =>
      assert(recalled.contains(r.getString(0)),
        s"freqItems missed heavy hitter ${r.getString(0)}")
    }
  }

  test("source KL: non-negative, zero for an on-distribution source") {
    val out = CorpusQueries.sourceKl(spark, sf).collect()
    assert(out.nonEmpty)
    // Gibbs' inequality: KL(p_s ‖ p) ≥ 0, equality iff p_s == p
    out.foreach { r =>
      assert(r.getAs[Double]("kl") >= 0.0,
        s"${r.getString(0)}: kl=${r.getAs[Double]("kl")}")
    }
    // the real corpus's sources are distinct by construction — drift must
    // register somewhere
    assert(out.exists(_.getAs[Double]("kl") > 0.0), "all sources scored 0")
    // hand fixture: when EVERY source has the same token distribution the
    // corpus marginal equals each of them → KL exactly 0 (ln 1 = 0, no
    // rounding involved)
    val docs = Seq(
      ("a", "x x y"), ("a", "x y y"),
      ("b", "x x y"), ("b", "x y y")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = GraftTestSpark.tempPath("graft_kl")
    try {
      docs.coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/__t/documents.parquet")
      // single-file layout like the testdata dirs
      val part = new java.io.File(s"$tmp/__t/documents.parquet").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/documents.parquet"))
      val kl = CorpusQueries.sourceKl(spark, tmp.toString).collect()
        .map(r => r.getString(0) -> r.getAs[Double]("kl")).toMap
      assert(kl == Map("a" -> 0.0, "b" -> 0.0), s"uniform sources: $kl")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("char entropy decode stays aligned on invalid UTF-8") {
    import org.apache.spark.unsafe.types.UTF8String
    // a stray continuation byte (0x80) in lead position must count as ONE
    // replacement code point and consume ONE byte — treating it as a
    // 2-byte lead would swallow the following 'a' and score 2 classes
    val e = graft.functions.CharEntropy.entropyNats(
      UTF8String.fromBytes(Array[Byte](0x80.toByte, 'a'.toByte, 'b'.toByte)))
    assert(math.abs(e - math.log(3.0)) < 1e-12, s"got $e") // 3 classes of 1
    // two strays collapse to one U+FFFD class: p = {2/3, 1/3}
    val e2 = graft.functions.CharEntropy.entropyNats(
      UTF8String.fromBytes(Array[Byte](0x80.toByte, 0xBF.toByte, 'a'.toByte)))
    val expect2 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(e2 - expect2) < 1e-12, s"got $e2")
  }

  test("char entropy expression is round-6 identical to the exploded reference") {
    // the reference is the pre-round-4 pipeline: one row per character
    // through explode/groupBy/join — kept here as the semantic oracle
    // the codegen'd expression must match, including multibyte UTF-8
    // and astral (surrogate-pair) code points
    val texts = Seq(
      "abcd", "aaab", "the quick brown fox", "a b a b a b",
      "åéîøü åéîøü mixed ascii", "𝄞music𝄞notes", "日本語テキスト",
      "tab\tnewline\nmix", "a"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = texts.toDF("doc_id", "text")
    val exploded = {
      val c = docs.select($"doc_id", explode_outer(split($"text", "")).as("ch"))
        .filter($"ch".isNotNull)
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      val t = c.groupBy("doc_id").agg(sum($"c").as("len"))
      c.join(t, Seq("doc_id")).groupBy("doc_id")
        .agg(round(-sum(($"c".cast("double") / $"len") *
          log($"c".cast("double") / $"len")), 6).as("e"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val fused = docs
      .select($"doc_id", round(graft.functions.CharEntropy.charEntropy($"text"), 6).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == exploded)
    // and across the real corpus, doc for doc
    val corpus = graft.Tables.table(spark, sf, "documents")
      .filter(length($"text") > 0)
    val corpusRef = {
      val c = corpus.select($"doc_id", explode_outer(split($"text", "")).as("ch"))
        .filter($"ch".isNotNull)
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      val t = c.groupBy("doc_id").agg(sum($"c").as("len"))
      c.join(t, Seq("doc_id")).groupBy("doc_id")
        .agg(round(-sum(($"c".cast("double") / $"len") *
          log($"c".cast("double") / $"len")), 6).as("e"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val corpusGot = CorpusQueries.charEntropy(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(corpusGot == corpusRef)
  }

  test("sketch counts: HLL estimate within the 2% rsd contract of exact") {
    val rows = CorpusQueries.sketchCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Long]("estimate")
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"${r.getString(0)}: estimate $est vs exact $exact")
    }
    // deterministic: HLL++ is unseeded — same data, same estimate
    val again = CorpusQueries.sketchCounts(spark, sf).collect()
      .map(_.getAs[Long]("estimate")).toSeq
    assert(again == rows.map(_.getAs[Long]("estimate")).toSeq)
  }

  test("seq pack on a hand frame: spill goes to the next bin") {
    val d = Seq(
      ("s", 1L, 1500L), ("s", 2L, 1000L), ("s", 3L, 100L), ("s", 4L, 2000L))
      .toDF("source", "doc_id", "n_tokens")
    val bins = graft.ops.Sampling
      .packBins(d, "source", "doc_id", "n_tokens", 2048L)
      .select("doc_id", "bin_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // before-totals: 0, 1500, 2500, 2600 → bins 0, 0, 1, 1
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  /** Independent driver-side BPE trainer: list-of-symbols segmentations,
    * greedy left-to-right non-overlapping merges — shares NO code (and no
    * sentinel-string encoding) with [[CorpusQueries.bpeLearnFromDocs]].
    */
  def refBpeTrain(texts: Seq[String], k: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Long]) = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).map { case (t, g) =>
        t.map(_.toString).toList -> g.size.toLong }
    def mergeOne(seg: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < seg.length) {
        if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += seg(i); i += 1 }
      }
      out.toList
    }
    val merges = (1 to k).flatMap { rank =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (seg, c) =>
        seg.sliding(2).foreach {
          case List(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _          => ()
        }
      }
      if (pairs.isEmpty) None
      else {
        val ((l, r), cnt) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.groupBy { case (seg, _) => mergeOne(seg, l, r) }
          .map { case (seg, m) => seg -> m.values.sum }
        Some((rank.toLong, l, r, cnt))
      }
    }
    val symCounts = vocab.toSeq
      .flatMap { case (seg, c) => seg.map(_ -> c) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    (merges, symCounts)
  }

  def refBpe(texts: Seq[String], k: Int): Seq[(Long, String, String, Long)] =
    refBpeTrain(texts, k)._1

  test("bpe learn matches an independent driver-side trainer, with runs") {
    // 'aaaa' runs pin the greedy non-overlap contract: round 1 merges
    // (a,a) with count 3 per 'aaaa' token; the merged form is [aa][aa],
    // NOT [aa][a][a] (boundary-consuming under-merge) or [a][aa][a]
    val texts = Seq(
      "low low low lower lower lowest",
      "aaaa aaaa baab",
      "new newer newest low lower",
      "ab ab ab cd cd a b")
    val got = CorpusQueries
      .bpeLearnFromDocs(texts.toDF("text"), 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == refBpe(texts, 6), s"got $got\nref ${refBpe(texts, 6)}")
  }

  test("bpe vocab: applied-merge symbol counts match the reference trainer") {
    val texts = Seq(
      "low low low lower lower lowest",
      "aaaa aaaa baab",
      "new newer newest low lower")
    val got = CorpusQueries.bpeVocabFromDocs(texts.toDF("text"), 5, 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val ref = refBpeTrain(texts, 5)._2.toSeq
      .sortBy { case (s, c) => (-c, s) }.take(50)
    assert(got == ref, s"got $got\nref $ref")
  }

  test("bpe learn is partition-layout independent") {
    val texts = Seq("merge merge merged merges", "split splits splitter",
      "aaa aa aaaa", "token tokens tokenize tokenizer")
    val base = texts.toDF("text")
    val a = CorpusQueries.bpeLearnFromDocs(base.coalesce(1), 5).collect().toSeq
    val b = CorpusQueries.bpeLearnFromDocs(base.repartition(7), 5).collect().toSeq
    assert(a == b)
    assert(a == refBpe(texts, 5).map(t => org.apache.spark.sql.Row(
      t._1, t._2, t._3, t._4)))
  }

  test("sourceOverlap: copied docs drive the overlap coefficient, " +
      "disjoint sources produce no row") {
    // X and Y share exactly one doc's trigrams; Z shares nothing.
    // X: {a b c d} → trigrams {abc, bcd}; Y: same doc + its own
    // {e f g h} → {efg, fgh}; Z: {p q r s} → {pqr, qrs}
    val docs = Seq(
      (1L, "a b c d", "X"), (2L, "a b c d", "Y"), (3L, "e f g h", "Y"),
      (4L, "p q r s", "Z"))
      .toDF("doc_id", "text", "source")
    val dir = GraftTestSpark.tempPath("graft_so").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("shared"), r.getAs[Long]("overlap_micro")))).toMap
    // X∩Y = {abc, bcd} = 2; |X| = 2, |Y| = 4 → 2/min(2,4) = 1.0
    assert(got == Map(("X", "Y") -> ((2L, 1000000L))))
  }

  test("bm25: more matched terms and shorter docs outrank, no-hit docs " +
      "are absent, score matches a driver-side reference") {
    // doc 1: 2 terms hit, short; doc 2: 1 term, long; doc 3: no hits
    val docs = Seq(
      (1L, "query query scan pad", "a", "s"),
      (2L, "query pad pad pad pad pad pad pad", "a", "s"),
      (3L, "pad pad pad pad", "a", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = GraftTestSpark.tempPath("graft_bm25").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.bm25Rank(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("score")))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L)
    assert(got(1L)._2 > got(2L)._2)
    // independent reference: N=3, avgdl=16/3; idf(df) = ln((3-df+.5)/(df+.5)+1)
    def bm25(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * (1.2 + 1.0) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (16.0 / 3.0))))
    }
    // doc 1: query tf=2 df=2, scan tf=1 df=1, dl=4
    val expect1 = BigDecimal(bm25(2, 2, 4) + bm25(1, 1, 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L)._2 - expect1) < 2e-6, s"${got(1L)._2} vs $expect1")
  }

  test("chunkDocs: stride-24/window-32 chunks cover every token with " +
      "8-token overlap; short docs yield one whole chunk") {
    val text40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val text10 = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, text40, "a", "s"), (2L, text10, "a", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = GraftTestSpark.tempPath("graft_chunk").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.chunkDocs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens")))).toMap
    // 40 tokens: chunk 0 = [1..32], chunk 1 = [25..40] (16 tokens) —
    // tokens 25..32 covered twice (the 8-token overlap), none missed
    assert(got == Map(
      (1L, 0L) -> ((0L, 32L)), (1L, 1L) -> ((24L, 16L)),
      (2L, 0L) -> ((0L, 10L))))
  }
}
