package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

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

  test("heavy hitters: rank is dense-total, count-desc then token-asc") {
    val out = CorpusQueries.heavyHitters(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to out.length))
    val pairs = out.map(r => (r.getAs[Long]("cnt"), r.getAs[String]("token")))
    pairs.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) =>
        assert(c1 > c2 || (c1 == c2 && t1 < t2))
      case _ =>
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
}
