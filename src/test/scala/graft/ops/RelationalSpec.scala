package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class RelationalSpec extends AnyFunSuite {

  test("fuzzy pairs: levenshtein verify inside blocks, cross-block unseen") {
    val spark2 = GraftTestSpark.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val c = Seq((1L, "alpha-store-01"), (2L, "alpha-store-02"),
      (3L, "alpha-store-99"), (4L, "other-shop-001"))
      .toDF("id", "name")
      .withColumn("blk", substring($"name", 1, 11))
    val a = c.select($"id".as("id_a"), $"name".as("name_a"), $"blk")
    val b = c.select($"id".as("id_b"), $"name".as("name_b"), $"blk")
    val pairs = a.join(b, Seq("blk")).filter($"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("dist")).toMap
    // within-block: 01↔02 dist 1; 01↔99 and 02↔99 dist 2; the other-shop
    // row shares no block so never pairs (blocking recall contract)
    assert(pairs == Map((1L, 2L) -> 1, (1L, 3L) -> 2, (2L, 3L) -> 2))
  }
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("imputeByDtype fills strings with 'none' and numerics with 0") {
    val df = Seq((Some("a"), Some(1.0)), (None, None), (Some("b"), Some(2.5)))
      .toDF("s", "d")
    val filled = Relational.imputeByDtype(df)
    val rows = filled.orderBy("s").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "none"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.0, 2.5, 0.0))
  }

  test("dropCols / renameCols / selectCols compose") {
    val df = Seq((1, "x", 2.0)).toDF("a", "b", "c")
    val out = Relational.selectCols(
      Relational.renameCols(Relational.dropCols(df, "c"), "a" -> "id"), "id", "b")
    assert(out.columns.toSeq == Seq("id", "b"))
    assert(out.head().getInt(0) == 1)
  }

  test("pivotCount keeps explicit column set and zero-fills missing cells") {
    val df = Seq(("r1", "x"), ("r1", "x"), ("r2", "y")).toDF("row", "col")
    val p = Pivot.pivotCount(df, "row", "col", Seq("x", "y", "z"))
    assert(p.columns.toSeq == Seq("row", "x", "y", "z"))
    val r1 = p.filter($"row" === "r1").head()
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((2L, 0L, 0L)))
  }

  test("melt produces one row per (id, valueCol) like pandas melt") {
    val df = Seq((1, 10.0, 20.0)).toDF("id", "p", "q")
    val m = Pivot.melt(df, Seq("id"), Seq("p", "q")).orderBy("metric")
    assert(m.columns.toSeq == Seq("id", "metric", "value"))
    assert(m.collect().map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("p", 10.0), ("q", 20.0)))
  }

  test("splitTimestamp round-trips the timestamp parts") {
    val df = Seq("2024-03-05 07:08:09").toDF("raw")
      .select(to_timestamp($"raw").as("ts"))
    val s = Timeparts.splitTimestamp(df, "ts").head()
    assert(s.getString(1) == "2024-03-05" && s.getString(2) == "07:08:09")
  }

  test("zscore output has mean ~0 and sample-stddev ~1 (pandas ddof=1 parity)") {
    val z = RelationalQueries.zscoreAcctbal(spark, GraftTestSpark.sfDir)
    val stats = z.agg(avg($"z"), stddev_samp($"z")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-6)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-4)
  }

  test("groupBy counts sum to table count (A1 invariant)") {
    val counts = RelationalQueries.countsByType(spark, GraftTestSpark.sfDir)
    val total = graft.Tables.table(spark, GraftTestSpark.sfDir, "events").count()
    assert(counts.agg(sum($"n")).head().getLong(0) == total)
  }

  test("approx_count_distinct (HLL sketch) stays within its error bound") {
    val events = graft.Tables.table(spark, GraftTestSpark.sfDir, "events")
    val r = events.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", rsd = 0.05).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    // the sketch path is what survives 100 TB (mergeable, fixed memory);
    // 3x rsd covers the tail at small cardinalities
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"exact=$exact approx=$approx")
  }

  test("cube emits all grouping-set combinations (rollup superset)") {
    val cube = RelationalQueries.cubeFlags(spark, GraftTestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val rollup = RelationalQueries.rollupFlags(spark, GraftTestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rollup.subsetOf(cube))
    // cube adds the (ALL, status) slices rollup lacks
    assert(cube.exists { case (rf, ls) => rf == "ALL" && ls != "ALL" })
  }

  test("pivot row sums equal group-by counts (A3 invariant)") {
    val p = RelationalQueries.pivotStatus(spark, GraftTestSpark.sfDir)
    val rowSums = p.select($"o_orderpriority",
      ($"F" + $"O" + $"P").as("n")).orderBy("o_orderpriority")
    val g = graft.Tables.table(spark, GraftTestSpark.sfDir, "orders")
      .groupBy("o_orderpriority").count().orderBy("o_orderpriority")
    assert(rowSums.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      g.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("fkViolations: orphans counted, null keys allowed but reported") {
    val spark2 = GraftTestSpark.spark
    import spark2.implicits._
    val dir = GraftTestSpark.tempPath("graft_fk").toString
    // nation {1,2}; customer: one ok, one ORPHAN (nation 9), one null key
    Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq((10L, Some(1L)), (11L, Some(9L)), (12L, None))
      .toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((100L, 10L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1000L, 100L)).toDF("l_linenumber", "l_orderkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((20L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    val got = RelationalQueries.fkViolations(spark2, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("child_rows"),
        r.getAs[Long]("null_keys"), r.getAs[Long]("orphans")))).toMap
    assert(got("customer.nation") == ((3L, 1L, 1L)))
    assert(got("lineitem.orders") == ((1L, 0L, 0L)))
    assert(got("orders.customer") == ((1L, 0L, 0L)))
    assert(got("supplier.nation") == ((1L, 0L, 0L)))
  }
}
