package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-regenerated testdata (the round-8 failure mode): the
  * harness rewrote events.parquet with a different physical timestamp
  * encoding and every events-fed suite went red with an unrelated-looking
  * analysis error. This spec pins the PUBLIC schema contract in one place so
  * a future drift fails as one readable assertion, not 26 cascading reds.
  */
class TestdataDriftSpec extends AnyFunSuite {
  private val spark = GraftTestSpark.spark

  test("events loads with the public schema regardless of the physical " +
      "ts vintage, and is non-empty") {
    val df = Tables.table(spark, GraftTestSpark.sfDir, "events")
    val expected = Seq(
      "event_id" -> LongType,
      "ts" -> TimestampType,
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType)
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(actual == expected,
      s"\nevents public schema drifted — the driver likely regenerated " +
        s"/root/testdata; adapt Tables.eventsLayout.\ngot: $actual")
    assert(df.count() > 0)
  }

  test("eventsLayout's stream schema matches the raw file and its " +
      "normalizeTs lands on TimestampType") {
    val layout = Tables.eventsLayout(spark, GraftTestSpark.sfDir)
    // the raw ts must be one of the vintages eventsLayout understands
    val rawTs = layout.rawSchema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(rawTs),
      s"unsupported raw events.ts type $rawTs")
    val normalized = Tables.rawEvents(spark, GraftTestSpark.sfDir)
      .withColumn("ts", layout.normalizeTs)
    assert(normalized.schema("ts").dataType == TimestampType)
    // batch loader and layout agree (the divergence the round-8 bug hid)
    val viaTable = Tables.table(spark, GraftTestSpark.sfDir, "events")
    assert(normalized.schema == viaTable.schema)
  }

  test("remaining corpus tables keep their load-bearing columns") {
    val mustHave = Map(
      "lineitem" -> Seq("l_orderkey", "l_quantity", "l_returnflag"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
      "customer" -> Seq("c_custkey", "c_mktsegment", "c_acctbal"),
      "documents" -> Seq("doc_id", "text", "source"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    mustHave.foreach { case (t, cols) =>
      val schema = Tables.table(spark, GraftTestSpark.sfDir, t).schema
      val missing = cols.filterNot(schema.fieldNames.contains)
      assert(missing.isEmpty, s"$t lost columns $missing — testdata drift")
    }
  }

  test("type-sensitive columns keep their physical types (hash-compare " +
      "safety: a silent float->double drift would move oracle hashes, " +
      "not throw)") {
    def tpe(t: String, c: String): DataType =
      Tables.table(spark, GraftTestSpark.sfDir, t).schema(c).dataType
    // the whole similarity family (cosine, IVF, PQ, int8, SemDeDup)
    // assumes float32 embeddings — float64 would change every dot product
    assert(tpe("embeddings", "embedding") == ArrayType(FloatType),
      "embeddings.embedding drifted from array<float>")
    assert(tpe("documents", "text") == StringType)
    assert(tpe("documents", "doc_id") == LongType)
    // money-like doubles feed the exact-decimal cast contract (Tables.dec)
    assert(tpe("lineitem", "l_quantity") == DoubleType)
    assert(tpe("customer", "c_acctbal") == DoubleType)
    // the current vintage ships o_orderdate as timestamp[us]/NTZ (not a
    // DATE) and every date query is oracle-green against it — pin THAT;
    // a flip to DateType or LTZ would shift date_trunc/year extractions
    assert(tpe("orders", "o_orderdate") == TimestampNTZType,
      "orders.o_orderdate drifted — date arithmetic queries would shift")
  }
}
