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

  test("knn over fewer corpus rows than k returns what exists") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(tiny, tiny.filter($"vec_id" === 0), k = 10)
    assert(out.count() == 2) // self excluded, only 2 neighbors exist
  }
}
