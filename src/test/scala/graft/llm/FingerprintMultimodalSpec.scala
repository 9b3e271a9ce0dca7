package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class FingerprintMultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("rollingHash64 is order-sensitive, unlike simhash") {
    val sigs = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text")
      .select(TextStats.rollingHash64($"text").as("r"),
        TextStats.simhash64($"text").as("s"))
      .collect()
    assert(sigs(0).getLong(0) == sigs(2).getLong(0)) // identical text
    assert(sigs(0).getLong(0) != sigs(1).getLong(0)) // reorder changes it
    assert(sigs(0).getLong(1) == sigs(1).getLong(1)) // simhash does not
  }

  test("winnowing guarantees shared fingerprints on long shared runs") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val a = "aaa bbb " + shared
    val b = shared + " zzz yyy"
    val c = (100 to 120).map(i => s"tok$i").mkString(" ")
    val fps = Seq(a, b, c).toDF("text")
      .select(TextStats.winnowingFingerprints($"text").as("fp"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert((fps(0) intersect fps(1)).nonEmpty) // shared 20-token run
    assert((fps(0) intersect fps(2)).isEmpty)  // disjoint vocab
  }

  test("frameFeatures: resize stub fixes output size, stride samples frames") {
    val docs = graft.Tables.table(spark, GraftTestSpark.sfDir, "documents")
      .limit(10)
    val frames = Multimodal.frameFeatures(spark, docs,
      frameBytes = 16, stride = 2)
    // resize to 64x64/64 = 64 bytes -> 4 chunks of 16 -> stride 2 keeps 2
    val perDoc = frames.groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(perDoc.nonEmpty && perDoc.forall(_ == 2L))
    assert(frames.filter(col("frame_len") =!= 16).count() == 0)
  }

  test("graft_dot SQL function registers and evaluates") {
    graft.GraftExtensions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("a", "b").createOrReplaceTempView("graft_dot_v")
    assert(spark.sql("SELECT graft_dot(a, b) FROM graft_dot_v")
      .head().getDouble(0) == 11.0)
  }

  test("intArrayFeature parses CIFAR-shaped int-array payloads (S5)") {
    val line = """{"0": {"matrix": "[1,2,3]", "label": "7"}}"""
    val parsed = graft.stream.Ingest.parsePayload(Seq(line).toDF("value"))
    val typed = graft.stream.Ingest.intArrayFeature(parsed, "matrix", "m")
    val row = typed.select("row_idx", "m").head()
    assert(row.getLong(0) == 0L && row.getSeq[Int](1) == Seq(1, 2, 3))
  }
}
