package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class ObserveSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("gatedFilter: observed counters match exact counts from the same job") {
    val docs = graft.Tables.table(spark, sf, "documents")
    val total = docs.count()
    val (kept, obs) = Observe.gatedFilter(docs,
      length(col("text")) >= 200, col("text"))
    val keptCount = kept.count() // the action that materializes metrics
    val m = obs.get
    assert(m("rows_in") == total)
    assert(m("rows_pass") == keptCount)
    assert(m("nulls_probe") == 0L)
    // cross-check against an independent second scan
    assert(keptCount ==
      docs.filter(length(col("text")) >= 200).count())
  }

  test("gatedFilter: null predicate rows are dropped AND not counted as pass") {
    val df = Seq((1L, Some("keep me please")), (2L, None), (3L, Some("x")))
      .toDF("id", "text")
    val (kept, obs) = Observe.gatedFilter(df,
      length(col("text")) >= 5, col("text"))
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val m = obs.get
    assert(m("rows_in") == 3L)
    assert(m("rows_pass") == 1L)
    assert(m("nulls_probe") == 1L)
  }
}
