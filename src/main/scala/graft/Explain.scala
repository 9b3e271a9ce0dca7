package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries (all if
  * none named) so scan pruning / pushdown / broadcast / codegen spans can
  * be reviewed. Usage: runMain graft.Explain <sfDir> [query...]
  */
object Explain {
  /** Queries whose CONSTRUCTORS execute work (model fits, eager writes,
    * streaming runs, driver-side aggregates) — a plan dump should not run
    * them unless the user names one explicitly.
    */
  val eagerQueries: Set[String] = Set(
    "q_ml_pipeline", "q_ml_cluster_sizes", "q_ml_confusion",
    "q_dup_clusters",
    "q_stream_windowed", "q_csv_roundtrip", "q_json_roundtrip",
    "q_stream_dedup", "q_stream_enrich", "q_stream_hll",
    "q_orc_roundtrip",
    "q_pq_topk", "q_pagerank", "q_ivf_topk", "q_semantic_dedup",
    "q_stream_interval_join", "q_approx_heavy_hitters", "q_source_kl",
    "q_dedup_keep_best", "q_leakage_safe_split", "q_kcore",
    "q_bpe_learn", "q_bpe_vocab", "q_importance_weights",
    "q_budget_waterfill", "q_temperature_mix", "q_curriculum_order",
    "q_class_balance")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
                  .filterNot(eagerQueries)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
