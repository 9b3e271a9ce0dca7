package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (round-22 optimization): dump the EXECUTED formatted plan for
  * the named queries — the query is run to the noop sink first, so AQE's
  * final plan (runtime join-strategy changes, coalesced reads) is what
  * prints, not the isFinalPlan=false initial plan that [[Explain]] shows.
  * Session config matches Bench exactly. Usage:
  * runMain graft.ExplainExec <sfDir> <query> [query...]
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainExec <sfDir> <query> [query...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
