package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan gates for the exact-Jaccard pair family: the InferFiltersFromGenerate
  * trap (a size(arr)>0 pre-filter under a plain explode whose pushdown
  * re-inlines the staged tokenize/shingle chain into a per-row Filter at the
  * scan — the round-3 254 s regression) must never return to these two
  * functions. Complements PlanSpec's sweeps of the token-explode family.
  */
class JaccardPlanSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark

  private def filterLines(plan: String): Seq[String] =
    plan.linesIterator.filter(_.contains("Filter")).toSeq

  test("prefixJaccardPairs: no staged expression chain inside any Filter") {
    val docs = Tables.table(spark, GraftTestSpark.sfDir, "documents")
    val plan = llm.Dedup.prefixJaccardPairs(docs, 0.9, 1000L)
      .queryExecution.executedPlan.toString
    val bad = filterLines(plan).filter(l =>
      l.contains("split(") || l.contains("tokenhashset"))
    assert(bad.isEmpty,
      s"tokenize/hash chain re-inlined into a Filter:\n${bad.mkString("\n")}")
  }

  test("ngramJaccardPairs: no shingle HOF stack inside any Filter") {
    val docs = Tables.table(spark, GraftTestSpark.sfDir, "documents")
    val plan = llm.Dedup.ngramJaccardPairs(docs, 3, 0.8, 300L)
      .queryExecution.executedPlan.toString
    val bad = filterLines(plan).filter(l =>
      l.contains("split(") || l.contains("transform("))
    assert(bad.isEmpty,
      s"shingle chain re-inlined into a Filter:\n${bad.mkString("\n")}")
  }
}
