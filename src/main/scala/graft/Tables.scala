package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{DecimalType, LongType, StructType,
  TimestampNTZType, TimestampType}

/** Loaders for the harness corpus (TESTDATA.md) plus shared numeric helpers.
  *
  * Every table is a single parquet file per scale factor; at cluster scale the
  * same call reads a partitioned directory unchanged, so nothing here assumes
  * single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") normalizeEventTs(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The raw read of events.parquet, with NO ts normalization. The harness
    * has shipped the `ts` column in two physical vintages — TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects unless the nanosAsLong legacy
    * conf maps it to raw LongType) and TIMESTAMP(MICROS) without UTC
    * adjustment (which Spark reads as TIMESTAMP_NTZ) — so the conf is set
    * unconditionally (a no-op for non-nanos files) and callers normalize via
    * [[eventsLayout]]. This is the one place allowed to touch that conf.
    */
  def rawEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** The raw file schema (what a file-STREAM source must declare) plus the
    * schema-adaptive expression turning the raw `ts` into a session-local
    * microsecond TimestampType. */
  final case class EventsLayout(rawSchema: StructType, normalizeTs: Column)

  /** Inspect the raw events schema and pick the ts conversion — the ONE
    * decision the batch loader, every file-stream source, and the scale
    * harness must share, or their timestamps silently diverge:
    *
    *  - `LongType` (nanos-as-long vintage): integral `ts div 1000` to
    *    micros, NOT `/` — double division would round the ~1.8e18 nanos
    *    values past the 2⁵³ mantissa.
    *  - `TimestampNTZType` (micros-without-UTC-flag vintage): cast to
    *    TimestampType. Under the pinned UTC session timezone the cast is
    *    a type relabel with identical epoch-micro values, which the DuckDB
    *    oracle hashes prove (q_date_split / q_hourly_events carry exact
    *    epoch bounds).
    *  - `TimestampType`: already the public form; pass through.
    */
  def eventsLayout(spark: SparkSession, dir: String): EventsLayout =
    layoutFor(spark, rawEvents(spark, dir).schema)

  private def layoutFor(spark: SparkSession, schema: StructType): EventsLayout = {
    val norm = schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType =>
        // the NTZ cast reinterprets the wall-clock in the SESSION zone; the
        // oracle hashes are only valid under UTC, and a non-UTC session
        // would shift every events timestamp SILENTLY — fail loudly instead
        // (the nanos path is absolute-epoch and needs no such guard)
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and the session timezone is '$tz': " +
            "the NTZ->LTZ cast is only value-preserving under UTC — set " +
            "spark.sql.session.timeZone=UTC on the session builder")
        col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other — extend " +
          "Tables.eventsLayout for this testdata vintage")
    }
    EventsLayout(schema, norm)
  }

  private def normalizeEventTs(spark: SparkSession, sfDir: String): DataFrame = {
    // one footer read: derive the layout from the frame being returned
    // rather than calling eventsLayout (which would re-read the schema)
    val raw = rawEvents(spark, sfDir)
    raw.withColumn("ts", layoutFor(spark, raw.schema).normalizeTs)
  }

  /** Cast a money-like double column (2 decimal digits by construction) to an
    * exact decimal before aggregating. Summing doubles is order-dependent —
    * at 32 shuffle partitions (or 1000 executors) the partial-agg order is
    * nondeterministic and never matches a single-threaded oracle bit-for-bit.
    * Summing exact decimals is associative, so the final value is identical
    * regardless of partitioning; cast back to double at the end for a stable
    * schema. The oracle SQL applies the same casts.
    */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))
}
