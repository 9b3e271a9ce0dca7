package graft.tools
import org.apache.spark.sql.SparkSession
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    time("warmup")(graft.Tables.table(spark, sfDir, "embeddings").count())
    for (i <- 1 to 2)
      time(s"q_ivf_topk run$i")(graft.llm.LlmQueries.all("q_ivf_topk")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
