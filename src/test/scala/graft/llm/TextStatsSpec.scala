package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column) =
    Seq(text).toDF("text").select(c).head()

  test("token counts: whitespace, distinct, regex") {
    val t = "the quick the fox"
    assert(one(t, TextStats.tokenCount($"text")).getLong(0) == 4L)
    assert(one(t, TextStats.distinctTokenCount($"text")).getLong(0) == 3L)
    assert(one(t, TextStats.regexTokenCount($"text")).getLong(0) == 4L)
  }

  test("bpe estimate is ceil(chars/4)") {
    assert(one("abcdefgh", TextStats.bpeTokenEstimate($"text")).getLong(0) == 2L)
    assert(one("abcdefghi", TextStats.bpeTokenEstimate($"text")).getLong(0) == 3L)
  }

  test("mean token length") {
    assert(one("ab cdef", TextStats.meanTokenLength($"text")).getDouble(0) == 3.0)
  }

  test("langId picks the language with most marker hits, name-asc on ties") {
    assert(one("the query of a table", TextStats.langId($"text")).getString(0) == "en")
    assert(one("der scan und die row", TextStats.langId($"text")).getString(0) == "de")
    assert(one("le join et la merge", TextStats.langId($"text")).getString(0) == "fr")
    // zero hits everywhere -> tie -> first language name ascending
    assert(one("zzz yyy", TextStats.langId($"text")).getString(0) == "de")
  }

  test("simhash: identical texts agree, token order does not matter") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text").select(TextStats.simhash64($"text").as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(2))
    assert(sigs(0) == sigs(1)) // multiset-majority is order-insensitive
  }

  test("simhash: similar token sets land within small hamming distance") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val far = (100 to 140).map(i => s"tok$i").mkString(" ")
    val sigs = Seq(base, near, far).toDF("text")
      .select(TextStats.simhash64($"text").as("sig")).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)))
    assert(ham(sigs(0), sigs(1)) <= 12)
  }

  test("normalize collapses case/punct/whitespace variants to one key") {
    val variants = Seq("Hello,  World!", "hello world", "HELLO   WORLD.")
    val fps = variants.toDF("text")
      .select(TextStats.fingerprint(TextStats.normalize($"text")))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("fingerprint is md5 hex") {
    assert(one("abc", TextStats.fingerprint($"text")).getString(0) ==
      "900150983cd24fb0d6963f7d28e17f72")
  }
}
