package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Semantics of the curation operators on real sf0.001 data (the
  * cross-engine hash proof lives in the DuckDB oracle gate; these pin
  * the intended behavior and the independent-reference math).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("source cap: at most k docs per source, and they are the longest") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect()
    val kept = Curation.sourceCap(spark, sf)
      .as[(Long, String, Long)].collect()

    val keptBySrc = kept.groupBy(_._2)
    keptBySrc.values.foreach(g =>
      assert(g.length <= Curation.capPerSource))

    // Independent reference: per-source sort by (-n_chars, doc_id), take k.
    val expect = docs.groupBy(_._2).values.flatMap(g =>
      g.sortBy(d => (-d._3, d._1)).take(Curation.capPerSource).toSeq)
      .map(_._1).toSet
    assert(kept.map(_._1).toSet == expect)
  }

  test("winsorized stats: wmean within [lo, hi], bounds are real values") {
    val rows = Curation.winsorizedStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val values = graft.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val (lo, hi, wmean) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
        r.getAs[Double]("wmean"))
      assert(lo <= hi && wmean >= lo - 1e-9 && wmean <= hi + 1e-9)
      // percentile_disc returns raw column elements (round-6 may shift
      // the printed value off the raw element by <=5e-7)
      val vs = values(r.getAs[String]("event_type"))
      assert(vs.exists(v => math.abs(v - lo) <= 5e-7))
      assert(vs.exists(v => math.abs(v - hi) <= 5e-7))
      // clamped mean never below the raw min-clamp mean nor above max
      val raw = vs.map(v => math.min(math.max(v, lo), hi))
      assert(math.abs(raw.sum / raw.length - wmean) <= 1e-5)
    }
  }

  test("winsorized approx: sketch bounds track exact, wmean divergence gated") {
    val exact = Curation.winsorizedStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Curation.winsorizedStatsApprox(spark, sf).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    val values = graft.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { r =>
      val et = r.getAs[String]("event_type")
      val e = exact(et)
      assert(r.getAs[Long]("n") == e.getAs[Long]("n"))
      val vs = values(et)
      // GK guarantee: estimated percentile within n/accuracy RANKS of the
      // true one — translate rank tolerance into a value window
      val rankTol = math.max(1, vs.length / Curation.winsorAccuracy + 1)
      def rankWindow(q: Double): (Double, Double) = {
        val r0 = math.ceil(q * vs.length).toInt - 1
        (vs(math.max(0, r0 - rankTol)), vs(math.min(vs.length - 1, r0 + rankTol)))
      }
      val (lo5, hi5) = rankWindow(0.05)
      val (lo95, hi95) = rankWindow(0.95)
      assert(r.getAs[Double]("lo") >= lo5 - 5e-7 &&
        r.getAs[Double]("lo") <= hi5 + 5e-7,
        s"$et lo ${r.getAs[Double]("lo")} outside [$lo5, $hi5]")
      assert(r.getAs[Double]("hi") >= lo95 - 5e-7 &&
        r.getAs[Double]("hi") <= hi95 + 5e-7,
        s"$et hi ${r.getAs[Double]("hi")} outside [$lo95, $hi95]")
      // clamping to near-identical bounds moves the mean by at most the
      // bound shift's mass fraction — gate generously at 0.5% relative
      val ew = e.getAs[Double]("wmean")
      assert(math.abs(r.getAs[Double]("wmean") - ew) <=
        math.max(5e-3 * math.abs(ew), 1e-4),
        s"$et wmean ${r.getAs[Double]("wmean")} vs exact $ew")
    }
  }

  test("importance weights: target slice excluded, reference math matches") {
    val out = Curation.importanceWeights(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= Curation.importanceTopK)

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val target = docs.filter(_._2 == Curation.importanceTarget).map(_._1).toSet
    assert(out.forall(r => !target.contains(r._1)))

    // Independent driver-side reference of the smoothed LLR for the top
    // doc. Production splits on a single space and keeps empty tokens;
    // mirror that exactly.
    val toks = docs.map { case (id, src, text) => (id, src, text.split(" ", -1)) }
    val cfreq = toks.flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val ctot = toks.map(_._3.length).sum.toDouble
    val vocab = cfreq.size.toDouble
    val tslice = toks.filter(_._2 == Curation.importanceTarget)
    val tfreq = tslice.flatMap(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val ttot = tslice.map(_._3.length).sum.toDouble

    val (topId, topN, topLlr) = out.head
    val tokens = toks.find(_._1 == topId).get._3
    assert(tokens.length.toLong == topN)
    val ref = tokens.map { t =>
      math.log((tfreq.getOrElse(t, 0) + 1.0) / (ttot + vocab)) -
        math.log((cfreq(t) + 1.0) / (ctot + vocab))
    }.sum / tokens.length
    assert(math.abs(ref - topLlr) <= 1e-6, s"ref $ref vs $topLlr")

    // descending by (llr, doc_id): the engine's own ordering is total
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    case _ => ()
    }
  }
}
