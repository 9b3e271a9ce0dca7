package graft.stream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class SketchCubeSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  val sf = GraftTestSpark.sfDir

  private def batchEstimates: Map[String, Long] =
    graft.ops.StatsQueries.hllSketchCube(spark, sf)
      .filter(col("key") =!= "__merged__").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("est_users")).toMap

  private def cubeEstimates(target: String): Map[String, Long] =
    SketchCube.readCube(spark, target).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("cross-batch sketch merge: two half-batches answer exactly like " +
      "the one-shot batch cube") {
    val dir = GraftTestSpark.tempPath("graft_cube1").toString
    val target = s"$dir/cube"
    val ev = graft.Tables.table(spark, sf, "events")
      .select(col("ts"), col("user_id"), col("event_id"))
    // split by event id parity: both batches carry partial user sets for
    // every day, so the read MUST merge across batches to be right
    SketchCube.writeBatch(ev.filter(col("event_id") % 2 === 0), 0L, target)
    SketchCube.writeBatch(ev.filter(col("event_id") % 2 === 1), 1L, target)
    assert(cubeEstimates(target) == batchEstimates)
  }

  test("streaming run builds the cube; batch replay is a no-op; a second " +
      "stream run with a lost checkpoint changes nothing") {
    val dir = GraftTestSpark.tempPath("graft_cube2").toString
    val target = s"$dir/cube"
    val n = SketchCube.run(spark, sf, target, s"$dir/ckpt")
    assert(n >= 1L)
    val first = cubeEstimates(target)
    assert(first == batchEstimates)
    // crash-before-commit replay: same (batchId, data) delivered again
    val ev = graft.Tables.table(spark, sf, "events")
      .select(col("ts"), col("user_id"))
    SketchCube.writeBatch(ev, 0L, target)
    assert(cubeEstimates(target) == first)
    // lost checkpoint: the whole input replays as fresh batch ids into
    // the same partitions — the keyed overwrite absorbs it
    SketchCube.run(spark, sf, target, s"$dir/ckpt_lost")
    assert(cubeEstimates(target) == first)
  }
}
