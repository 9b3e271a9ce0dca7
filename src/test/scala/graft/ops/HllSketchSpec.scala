package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Contract gates for the mergeable HLL sketch cube (q_hll_cube):
  * Datasketches HLL estimates are deterministic, insertion-order-invariant
  * functions of the input SET, so the daily-sketch union must equal the
  * one-shot global sketch exactly — that identity is what makes the
  * pre-aggregated cube safe at 100 TB (store per-partition sketches,
  * merge at query time, never rescan).
  */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("hll cube: every estimate within 5% of its exact sibling") {
    val rows = StatsQueries.hllSketchCube(spark, sf).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val (est, exact) =
        (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
      // lgK=12 carries ~1.6% relative standard error; 5% is the 3-sigma
      // gate, with an absolute floor of 1 for single-digit days
      assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getAs[String]("key")}: est $est vs exact $exact")
    }
  }

  test("hll cube: union of daily sketches == one-shot global sketch, " +
      "bit-exact, at any partition layout") {
    val ev = graft.Tables.table(spark, sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    def estimate(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy("day").agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val oneShot = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("e"))
      .head().getLong(0)
    val mergedRow = StatsQueries.hllSketchCube(spark, sf)
      .filter(col("key") === "__merged__").head()
    assert(mergedRow.getAs[Long]("est_users") == oneShot)
    // register-max updates are order/layout independent: reshuffling the
    // input must not move the estimate by a single count
    assert(estimate(ev.repartition(13, col("user_id"))) == oneShot)
  }
}
