package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  lazy val fact = (1L to 2000L).map(i => (i, s"row$i")).toDF("fk", "payload")
  lazy val dim = (1L to 2000L).filter(_ % 37 == 0).map(i => (i, s"dim$i"))
    .toDF("dk", "name")

  test("bloomSemiJoin returns exactly the plain semi-join result") {
    val got = BloomPrune.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = 1000L)
      .select("fk").as[Long].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("the bloom filter actually prunes non-candidates before the join") {
    val bloom = BloomPrune.keyBloomBytes(dim, "dk", expectedItems = 1000L)
    val kept = fact.filter(BloomPrune.mightContain(bloom, col("fk")))
      .count()
    val trueMatches = 2000 / 37
    // no false negatives, and far fewer rows than the full fact table
    assert(kept >= trueMatches)
    assert(kept < 2000 / 2, s"bloom pruned almost nothing: kept=$kept")
  }
}
