package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)],
                    iters: Int = 10): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "weight"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric 2-cycle sits at the uniform fixed point") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("star: equal-weight targets tie, the pure source holds teleport mass") {
    // a→b, a→c (b, c dangling): a receives nothing but teleport
    val r = ranks(Seq(("a", "b", 1L), ("a", "c", 1L)))
    assert(math.abs(r("b") - r("c")) < 1e-12)
    assert(math.abs(r("a") - 0.15 / 3) < 1e-12)
    assert(r("b") > r("a"))
    // dangling leak: total mass below 1 is the documented simplification
    assert(r.values.sum < 1.0)
  }

  test("weights matter: the heavier edge's target outranks the lighter's") {
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)))
    assert(r("b") > r("c"))
    // strongly-connected: mass is conserved up to fp noise
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("deterministic across runs") {
    val e = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 5L), ("a", "c", 1L))
    assert(ranks(e) == ranks(e))
  }
}
