package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

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

  /** events.ts is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read it as raw nanos-since-epoch
    * (legacy conf) and convert to a microsecond TimestampType column, keeping
    * the public schema identical to what DuckDB sees. The conf is a runtime
    * SQL conf, so setting it here affects only this session.
    */
  private def normalizeEventTs(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", eventTsFromNanos)
  }

  /** Raw nanos-since-epoch (the legacy-conf long form of events.`ts`) to
    * a microsecond TimestampType — the ONE conversion the batch loader
    * and the file-stream source must share, or their timestamps silently
    * diverge. Integral `div`, NOT `/`: double division would round the
    * ~1.8e18 nanos values past the 2⁵³ mantissa.
    */
  def eventTsFromNanos: Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000"))

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
