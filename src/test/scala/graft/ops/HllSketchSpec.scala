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

  test("hll cube: 5% error gate holds past the exact-coupon regime " +
      "under AQE-off merge-order perturbation (r13 adjudication event)") {
    // Round 13's one observed cross-config divergence, as a standing
    // regression gate: at sf0.1 (per-day cardinality ~1.3k — past the
    // sketch's exact-coupon regime, unlike the sf0.001 fixture above)
    // q_hll_cube's estimates moved under spark.sql.adaptive.enabled=false
    // ALONE — AQE's post-shuffle partition coalescing changes the HLL
    // partial-union tree, and at that cardinality merge order becomes
    // estimate-visible. Bounded at 1.58% vs the 5% contract (BASELINE.md
    // round-13 super-capstone; dissection /tmp/r13_vhll_*). This test
    // rebuilds the trigger deterministically: a synthetic events table
    // with ~5k distinct users/day, the cube run under the bisected knob
    // plus two shuffle-partition layouts (different partial-union trees),
    // asserting every row's relative error vs its exact sibling ≤ 5%.
    // exact_users is computed by the query itself, so the gate needs no
    // precomputed truth and fails iff merge-order sensitivity ever
    // exceeds the bound.
    val dirFile = GraftTestSpark.tempPath("graft_hll").toFile
    val dir = dirFile.toString
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete(): Unit
    }
    // 6 days x 5000 rows/day; user_id = id mod 7001 → ~5k distinct/day,
    // 7001 global. 2024-03-01T00:00:00Z epoch base; +id µs stays in-day.
    spark.range(30000L).select(
        (col("id") % 7001L).as("user_id"),
        timestamp_micros(lit(1709251200000000L) +
          (col("id") % 6L) * lit(86400000000L) + col("id")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def maxRelErr(): Double =
      StatsQueries.hllSketchCube(spark, dir).collect().map { r =>
        val (est, exact) =
          (r.getAs[Long]("est_users"), r.getAs[Long]("exact_users"))
        math.abs(est - exact).toDouble / exact
      }.max
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    try {
      val base = maxRelErr() // default conf at this cardinality
      assert(base <= 0.05, f"default conf: max rel error $base%.4f > 5%%")
      conf.set("spark.sql.adaptive.enabled", "false")
      for (parts <- Seq("3", "7")) {
        conf.set("spark.sql.shuffle.partitions", parts)
        val e = maxRelErr()
        assert(e <= 0.05,
          f"AQE-off, $parts partitions: max rel error $e%.4f > 5%%")
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.shuffle.partitions", prevParts)
      rmAll(dirFile)
    }
  }
}
