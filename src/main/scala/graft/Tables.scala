package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata lake (TESTDATA.md): one parquet file
  * per logical table under `sfDir`.
  *
  * `events.ts` is parquet `TIMESTAMP(NANOS)`, which Spark's parquet
  * schema converter rejects by default. We flip
  * `spark.sql.legacy.parquet.nanosAsLong` and keep the column as the
  * raw nanosecond epoch (LongType): it is an *exact* event-time key
  * (no us-truncation), cheap to bucket with integer arithmetic, and
  * matches DuckDB's `epoch_ns(ts)` for the oracle.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `ts_us`: epoch-microseconds companion key. DuckDB converts parquet
    // TIMESTAMP(NANOS) to us-precision TIMESTAMP on read, so oracle
    // comparisons happen at us precision (`epoch_us(ts)`); the raw ns
    // column stays available for exact in-library ordering.
    if (name == "events")
      df.withColumn("ts_us",
        org.apache.spark.sql.functions.call_function("div",
          org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.lit(1000L)))
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** `ts` column is LongType epoch-nanoseconds (see object doc). */
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
