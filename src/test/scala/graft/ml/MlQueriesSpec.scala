package graft.ml

import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Cross-session determinism of the rows-only ML queries: the driver's
  * weaker (no-oracle) check still hashes their output, so for the same
  * input data the rows must be bit-stable across fresh sessions — seeds
  * pin the randomness, sizing pins the partitioning, and metrics travel
  * as integer micro-units so a float reduction's last-ulp wobble can't
  * flip a hash. `newSession()` gives a fresh session state (new SQL conf,
  * catalog, temp views) over the shared test context — the closest a
  * single test JVM can get to two driver runs.
  */
class MlQueriesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  val sf = GraftTestSpark.sfDir

  test("q_ml_pipeline emits integer micro-unit metrics, stable across sessions") {
    val out1 = MlQueries.mlPipeline(spark.newSession(), sf)
    // every metric column is integral — nothing for a rows-only hash to
    // wobble on
    assert(out1.schema.fields.forall(_.dataType == LongType),
      out1.schema.treeString)
    val a = out1.collect().toSeq
    val b = MlQueries.mlPipeline(spark.newSession(), sf).collect().toSeq
    assert(a == b, s"session A: $a\nsession B: $b")
    // sanity only — the ≥0.8 accuracy contract lives in CrimePipelineSpec
    // on its separable-classes fixture; the events-derived frame here has
    // weak signal by design
    val row = a.head
    assert(row.getAs[Long]("accuracy_micro") > 0L)
    assert(row.getAs[Long]("log_loss_micro") > 0L)
  }

  test("q_ml_cluster_sizes is sorted and stable across sessions") {
    val a = MlQueries.clusterSizes(spark.newSession(), sf)
      .collect().map(_.getLong(0)).toSeq
    val b = MlQueries.clusterSizes(spark.newSession(), sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, s"session A: $a\nsession B: $b")
    // the id-free comparison form: sizes descending, mass preserved
    assert(a == a.sortBy(-_), s"not size-descending: $a")
    assert(a.size == 10 && a.sum > 0)
  }

  test("q_ml_confusion: rates bounded, counts consistent, stable " +
      "across sessions") {
    def run(s: org.apache.spark.sql.SparkSession) =
      MlQueries.confusionStats(s, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
    val a = run(spark)
    assert(a.nonEmpty)
    a.foreach { case (_, support, tp, p, rec, f1) =>
      assert(tp <= support)
      assert(Seq(p, rec, f1).forall(v => v >= 0L && v <= 1000000L))
      // F1 is between min and max of precision/recall (harmonic mean),
      // modulo 1 micro-unit of independent flooring
      assert(f1 >= math.min(p, rec) - 1 && f1 <= math.max(p, rec) + 1,
        s"f1 $f1 outside [$p, $rec]")
    }
    // holdout support equals the 30% split the pipeline query uses
    assert(a.map(_._2).sum > 0)
    assert(run(spark.newSession()) == a)
  }
}
