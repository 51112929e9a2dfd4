package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata lake (TESTDATA.md): one parquet file
  * per logical table under `sfDir`.
  *
  * `events.ts` has shipped as both parquet `TIMESTAMP(NANOS)` (which
  * Spark's schema converter rejects unless
  * `spark.sql.legacy.parquet.nanosAsLong` is set, yielding a raw
  * ns-epoch LongType) and plain `TIMESTAMP(MICROS)` across driver
  * testdata generations. Library code never touches `ts` directly:
  * every consumer uses the derived `ts_us` epoch-microseconds key,
  * which this reader computes from whichever physical type the file
  * has — integer `div 1000` for ns-longs, `unix_micros` (session TZ
  * is pinned UTC, so NTZ wall-clock == instant) for timestamps. DuckDB
  * reads both encodings as us-precision TIMESTAMP, so the oracle's
  * `epoch_us(ts)` matches `ts_us` exactly in either generation.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      // Explicit on the two known encodings; anything else is schema
      // drift and must fail loudly, not silently null out ts_us.
      val tsUs = df.schema("ts").dataType match {
        case LongType => call_function("div", col("ts"), lit(1000L))
        case TimestampType | TimestampNTZType =>
          unix_micros(col("ts").cast(TimestampType))
        case other => throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected ns-epoch LongType or TIMESTAMP[_NTZ]")
      }
      df.withColumn("ts_us", tsUs)
    } else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** `ts` is generation-dependent (ns-epoch LongType or TIMESTAMP);
    * consumers use the derived `ts_us` epoch-microseconds key (object doc). */
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
