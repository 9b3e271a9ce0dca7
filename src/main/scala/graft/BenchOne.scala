package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Single-query profiling main: times one SparkEntry query for N
  * back-to-back runs under the exact Bench session config, and — for
  * streaming queries — prints each micro-batch's durationMs breakdown
  * (triggerExecution, addBatch, stateOperators memory) from a
  * [[StreamingQueryListener]], so a bench-total regression can be split
  * into "the streaming engine got slower" vs "setup/teardown churn
  * around it" without touching the query under test.
  *
  * Usage: runMain graft.BenchOne <queryName> [runs]   (SF from
  * SPARK_GRAFT_SF_DIR, same default as Bench).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // experiment knob: SPARK_GRAFT_CONF="k=v;k=v" applied to the session
    // before the runs (e.g. shuffle-partition sweeps for state-store
    // overhead attribution)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            spark.conf.set(k, v)
            println(s"[prof] conf $k=$v")
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not of the form key=value")
        }
      })

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[prof] stream started ${e.name} at ${e.timestamp}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[prof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${dur} state=${p.stateOperators.mkString(";")}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[prof] stream terminated")
    })

    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    try run("q_counts_by_type") catch { case _: Throwable => () }

    // the same host stamps Bench's JSON carries, so a single-query
    // adjudication run documents its own contention window
    println(HostTelemetry.stampLine("prof"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      run(name)
      println(f"[prof] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(HostTelemetry.stampLine("prof"))
    spark.stop()
  }
}
