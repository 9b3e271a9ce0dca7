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

  test("narrowing probe cast (bigint fact vs int dim) matches plain semi join") {
    // fact keys include values far outside int range: under ANSI mode a
    // plain probe cast would raise CAST_OVERFLOW on them, where the join
    // itself just drops them — try_cast keeps the two result sets equal
    val wideFact = ((1L to 50L) ++ Seq(Int.MaxValue + 10L, Long.MaxValue))
      .toDF("fk")
    val intDim = (1 to 50 by 5).toDF("dk")
    val got = BloomPrune.bloomSemiJoin(wideFact, intDim, "fk", "dk",
        expectedItems = 100L)
      .select("fk").as[Long].collect().toSet
    val want = wideFact.join(intDim, col("fk") === col("dk"), "left_semi")
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
