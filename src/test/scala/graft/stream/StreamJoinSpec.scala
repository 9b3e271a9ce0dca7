package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Executed proof of the left-outer stream-stream join's eviction
  * semantics: the null-extended "no match arrived in time" row must NOT
  * exist while a match is still possible, and MUST appear once the
  * watermark closes the row's join window — driven batch by batch with
  * MemoryStream so the watermark movement is under test control.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("left-outer interval join: match emits immediately, unmatched " +
      "emits only after the watermark closes its window") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val convs = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamQueries.leftOuterIntervalJoin(
      imps.toDF().toDF("iu", "its"), "iu", "its",
      convs.toDF().toDF("cu", "cts"), "cu", "cts",
      windowExpr = "1 HOUR", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("graft_souter")
      .outputMode("append").start()
    try {
      // batch 1: user 1 converts inside its hour; user 2 never converts
      imps.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:05:00")))
      convs.addData((1L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      def rows() = spark.table("graft_souter").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      // only the match is visible — user 2's window is still open, so
      // emitting a null row now would be wrong (a conversion may come)
      assert(rows() == Set((1L, Some(1L))), s"premature emit: ${rows()}")

      // batch 2: sentinels at 13:00 push both watermarks to 12:50, far
      // past user 2's [10:05, 11:05] window — eviction must flush the
      // null-extended row for user 2 and nothing else unmatched (the
      // sentinels' own window is still open)
      imps.addData((99L, ts("2024-01-01 13:00:00")))
      convs.addData((99L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val r2 = rows()
      assert(r2.contains((2L, None)), s"unmatched row not flushed: $r2")
      assert(r2.contains((1L, Some(1L))))
      assert(r2.contains((99L, Some(99L)))) // sentinels match each other
      assert(r2.size == 3, s"unexpected rows: $r2")
    } finally q.stop()
  }
}
