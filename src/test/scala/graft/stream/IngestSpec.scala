package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class IngestSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Exactly the producer's payload shape (stream.py:153-179). */
  val payloadLine =
    """{"0": {"feature0": "1.5", "label": "3"},
      | "1": {"feature0": "2.5", "label": "4"}}""".stripMargin.replace("\n", "")

  test("parsePayload explodes the map-of-maps into one row per record") {
    val parsed = Ingest.parsePayload(Seq(payloadLine).toDF("value"))
    val typed = Ingest.toTyped(parsed, Seq("feature0", "label"))
      .orderBy("row_idx").collect()
    assert(typed.length == 2)
    assert(typed(0).getLong(0) == 0L && typed(0).getString(1) == "1.5"
      && typed(0).getString(2) == "3")
    assert(typed(1).getLong(0) == 1L && typed(1).getString(2) == "4")
  }

  test("parseRawLines explodes a JSON string array with positions") {
    val line = """["alpha", "beta"]"""
    val rows = Ingest.parseRawLines(Seq(line).toDF("value"))
      .orderBy("line_idx").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "alpha"), (1, "beta")))
  }

  test("MemoryStream of payload lines parses under the incremental planner") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val parsed = Ingest.parsePayload(mem.toDF().withColumnRenamed("value", "value"))
    val q = parsed.writeStream.format("memory").queryName("ingest_test")
      .outputMode("append").start()
    try {
      mem.addData(payloadLine)
      mem.addData("""{"2": {"feature0": "9.9", "label": "1"}}""")
      q.processAllAvailable()
      // totals, not per-batch counts: batch boundaries are trigger-framed
      // (SURVEY §7.4.4)
      val rows = spark.table("ingest_test").collect()
      assert(rows.length == 3)
    } finally q.stop()
  }

  test("dedupStream drops re-deliveries within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val dedup = Ingest.dedupStream(mem.toDF().toDF("id", "ts"), "id", "ts",
      watermark = "1 minute")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData((1L, t), (2L, t), (1L, t)) // duplicate in-batch
      q.processAllAvailable()
      mem.addData((1L, t), (3L, t))          // duplicate across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("intervalJoinStreams joins within the time bound only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = Ingest.intervalJoinStreams(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts"),
      keyCol = "user", leftTs = "click_ts", rightTs = "buy_ts",
      withinSeconds = 600L, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      clicks.addData((7L, t("2024-01-01 00:00:00")))
      buys.addData((7L, t("2024-01-01 00:05:00")),  // within 10 min → joins
                   (7L, t("2024-01-01 00:20:00")),  // outside → dropped
                   (8L, t("2024-01-01 00:01:00")))  // other key → dropped
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test").collect()
      assert(rows.length == 1)
      assert(rows(0).getLong(0) == 7L)
    } finally q.stop()
  }

  // Live-loopback smoke of the S3 socket source — the reference's actual
  // transport (stream.py:24-36): a ServerSocket inside this JVM plays the
  // producer, the engine's socket consumer parses its framed payload.
  // Ephemeral port (bind on 0) so no environment port is assumed.
  test("socket source consumes the producer contract end-to-end") {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    @volatile var client: java.net.Socket = null
    val producer = new Thread(() => {
      try {
        val sock = server.accept()
        client = sock
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        out.println(payloadLine)
        out.flush()
        // keep the connection open: the socket source treats EOF as end
        // of stream; the test closes it after the rows are observed
      } catch { case _: java.io.IOException => () }
    })
    producer.setDaemon(true)
    producer.start()
    val parsed = Ingest.socketPayloadStream(spark,
      java.net.InetAddress.getLoopbackAddress.getHostAddress, port)
    val q = parsed.writeStream.format("memory").queryName("socket_test")
      .outputMode("append").start()
    try {
      // sockets have no replayable offsets, so processAllAvailable can't
      // see data still in flight — poll until the two payload rows land
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 2 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = spark.table("socket_test").count()
        if (n < 2) Thread.sleep(100)
      }
      assert(n == 2, s"expected 2 rows from the socket payload, saw $n")
    } finally {
      q.stop()
      if (client != null) client.close()
      server.close()
    }
  }

  // ST5 failure semantics, EXECUTED (stream.py:66-72): the reference
  // producer swallows BrokenPipeError and keeps emitting, so everything
  // sent while the consumer is down is LOST — the documented at-most-once
  // loss window. This drives a real consumer drop over loopback TCP: a
  // producer thread emits sequence-numbered payloads every 50 ms and, on
  // write error, returns to accept() (the reference's swallow-and-continue
  // loop); the test stops the consumer mid-stream, lets the producer emit
  // into the dead connection, reconnects with a fresh query, and asserts
  // (a) a sequence GAP — the rows emitted while down reached neither
  // query — and (b) a clean reconnect — the second query observes rows.
  test("socket consumer drop loses the in-flight window and reconnects clean " +
      "(at-most-once contract)") {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val seq = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var done = false
    @volatile var errorDetected = false
    val producer = new Thread(() => {
      while (!done) {
        try {
          val sock = server.accept()
          val out = new java.io.PrintWriter(sock.getOutputStream, true)
          // emit until the write errors (consumer dropped) — the
          // reference's BrokenPipeError-swallowing loop, then re-accept
          var alive = true
          while (alive && !done) {
            val i = seq.getAndIncrement()
            out.println(s"""{"$i": {"feature0": "$i", "label": "x"}}""")
            if (out.checkError()) { alive = false; errorDetected = true }
            else Thread.sleep(50)
          }
          sock.close()
        } catch { case _: java.io.IOException => () }
      }
    })
    producer.setDaemon(true)
    producer.start()
    val host = java.net.InetAddress.getLoopbackAddress.getHostAddress
    def observed(table: String): Set[Long] =
      spark.table(table).collect().map(_.getLong(0)).toSet
    // sleep-poll only: processAllAvailable never settles against a
    // producer that emits continuously (there is always newer data)
    def pollUntil(table: String, pred: Set[Long] => Boolean): Set[Long] = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var s = observed(table)
      while (!pred(s) && System.nanoTime() < deadline) {
        Thread.sleep(200)
        s = observed(table)
      }
      s
    }
    try {
      // phase 1: consume some rows, then DROP mid-stream
      val q1 = Ingest.socketPayloadStream(spark, host, port)
        .writeStream.format("memory").queryName("sock_phase1")
        .outputMode("append").start()
      assert(pollUntil("sock_phase1", _.size >= 3).size >= 3,
        "phase 1 never saw rows")
      q1.stop() // consumer gone; producer keeps emitting into the void
      val seen1 = observed("sock_phase1") // frozen at stop
      // wait until rows have provably been emitted into the dead
      // connection: either 3 more sequence numbers were consumed, or the
      // producer already hit the write error (the errored row itself is a
      // consumed-but-never-delivered loss)
      val downUntil = seq.get() + 3
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (seq.get() < downUntil && !errorDetected &&
        System.nanoTime() < deadline) Thread.sleep(50)
      // phase 2: reconnect with a fresh query
      val q2 = Ingest.socketPayloadStream(spark, host, port)
        .writeStream.format("memory").queryName("sock_phase2")
        .outputMode("append").start()
      try {
        val seen2 = pollUntil("sock_phase2", _.nonEmpty)
        assert(seen2.nonEmpty, "no rows after reconnect")
        // clean reconnect: phase 2 rows are NEW sequence numbers
        assert(seen2.forall(_ > seen1.max), s"stale rows replayed: $seen2")
        // the at-most-once loss window: at least one sequence number
        // emitted while the consumer was down reached NEITHER query
        val lost = ((seen1.max + 1) until seen2.min).toSet -- seen1 -- seen2
        assert(lost.nonEmpty,
          s"no loss window despite consumer downtime: 1=$seen1 2=$seen2")
      } finally q2.stop()
    } finally {
      done = true
      server.close()
    }
  }

  // ST5/S8: the DURABLE sink path executed end to end — micro-batches
  // land as parquet files under a checkpointed query, and the files read
  // back complete. This is the exactly-once file-sink contract (the
  // manifest under _spark_metadata records committed batches), vs the
  // at-most-once socket transport the reference ships.
  test("q_stream_dedup's self-union actually doubles without the dedup " +
      "stage, and the dedup query returns the batch answer") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.Tables.table(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // control: the same plan WITHOUT dropDuplicatesWithinWatermark
    import org.apache.spark.sql.streaming.Trigger
    val layout = graft.Tables.eventsLayout(spark, sf)
    def src = spark.readStream.schema(layout.rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", layout.normalizeTs)
    val ctl = src.withColumn("__copy", explode(typedlit(Seq(1, 2))))
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val q = ctl.writeStream.format("memory").queryName("dedup_ctl")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val doubled = spark.table("dedup_ctl").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(doubled == batch.map { case (k, v) => k -> v * 2 })
    // the real query: dedup collapses the pairs back to the batch answer
    val deduped = StreamQueries.streamDedup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deduped == batch)
  }

  test("streaming parquet file sink commits batches durably") {
    implicit val sq = spark.sqlContext
    val base = GraftTestSpark.tempPath("graft_sink_").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v").writeStream
      .format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$base/data")
      assert(back.count() == 3)
      assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    } finally {
      q.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(base))
    }
  }

  test("windowedCounts groups a typed stream by tumbling window + key") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("ts", "k")
    val agg = Ingest.windowedCounts(events, "ts", "k",
      watermark = "1 minute", window = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_test")
      .outputMode("complete").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("win_test")
        .select(col("window.start").cast("string").as("start"), col("k"), col("n"))
        .orderBy("start").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq ==
        Seq(("2024-01-01 00:00:00", 2L), ("2024-01-01 00:05:00", 1L)))
    } finally q.stop()
  }

  test("update mode emits ONLY the windows a batch touched — the " +
      "incremental-dashboard contract complete mode can't give") {
    // complete mode rewrites every window per batch (O(state) sink
    // traffic); update re-emits only changed rows (O(batch)). At 100 TB
    // the difference is the whole sink bill. foreachBatch collects each
    // batch's emitted rows so the per-batch delta is observable.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = Ingest.windowedCounts(mem.toDF().toDF("ts", "k"), "ts", "k",
      watermark = "1 minute", window = "5 minutes")
      .select(col("window.start").cast("string").as("start"), col("n"))
    val batches = scala.collection.mutable.Map[Long, Seq[(String, Long)]]()
    val q = agg.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches(id) = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        }: Unit
      }
      .outputMode("update").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "a"))
      q.processAllAvailable()
      // batch 2 touches ONLY the 00:05 window; 00:00 must not re-emit
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 00:08:00"), "a"))
      q.processAllAvailable()
      val emitted = batches.synchronized(batches.toMap)
      val first = emitted.filter(_._2.nonEmpty).minBy(_._1)._2.toSet
      assert(first == Set(("2024-01-01 00:00:00", 1L),
        ("2024-01-01 00:05:00", 1L)))
      val last = emitted.filter(_._2.nonEmpty).maxBy(_._1)._2.toSet
      assert(last == Set(("2024-01-01 00:05:00", 2L)),
        s"untouched window re-emitted: $emitted")
    } finally q.stop()
  }

  test("executed stream-stream interval join equals the batch self-join") {
    val sf = GraftTestSpark.sfDir
    val streamed = StreamQueries.streamIntervalJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.table(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val batch = clicks.join(purchases,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 6 HOURS"))
      .groupBy(col("cu")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    // single-file AvailableNow run = one micro-batch, so the watermark
    // can drop nothing and the stateful join must equal the batch answer
    assert(streamed == batch)
  }

  test("executed streaming HLL equals the batch sketch cube per day, " +
      "estimate for estimate") {
    val sf = GraftTestSpark.sfDir
    val streamed = StreamQueries.streamHllDaily(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ops.StatsQueries.hllSketchCube(spark, sf)
      .filter(col("key") =!= "__merged__").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("est_users")).toMap
    assert(streamed.nonEmpty)
    // same sketch algorithm over the same per-day sets: order-invariant
    // register max means micro-batching cannot move a single estimate
    assert(streamed == batch)
  }
}
