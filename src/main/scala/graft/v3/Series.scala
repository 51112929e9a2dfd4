package graft.v3

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Ops

/** Resampled time-series queries over the swap table (reference
  * v3/helpers/pool_helpers.py:134–204). */
object Series {

  /** Polars duration string ("15m", "6h", "1d") → Spark interval. */
  def freqToInterval(freq: String): String = {
    val m = "^(\\d+)(s|m|h|d|w)$".r
    freq match {
      case m(n, u) =>
        val unit = u match {
          case "s" => "seconds"; case "m" => "minutes"; case "h" => "hours"
          case "d" => "days"; case "w" => "weeks"
        }
        s"$n $unit"
      case other => throw new IllegalArgumentException(s"bad frequency $other")
    }
  }

  /** Price (tick) series resampled to `freq`, starting at `start`
    * (pool_helpers.py:134–204):
    *
    * leg A — latest block number per bucket over *all* pools on the
    * chain; leg B — this pool's last tick per bucket (+ median gas when
    * `gas`), forward-filled; backward as-of join B onto A.
    *
    * Polars `group_by_dynamic` buckets are left-closed and
    * epoch-aligned; Spark's `window()` matches both properties.
    * Polars' per-bucket `.last()` ties are resolved here by the
    * explicit event order (block_number, transaction_index, log_index)
    * — Spark shuffles would otherwise make "last" nondeterministic
    * (SURVEY.md §7.4 risk #1).
    */
  def priceSeries(lake: Lake, chain: String, pool: String,
                  start: Timestamp, freq: String,
                  gas: Boolean = false): DataFrame = {
    val dur = freqToInterval(freq)
    val swaps = lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === chain &&
        col("block_timestamp") >= lit(start))

    val bnAsOf = swaps
      .select(col("block_timestamp"), col("block_number"))
      .groupBy(Ops.bucketTs(col("block_timestamp"), dur).as("block_timestamp"))
      .agg(max(col("block_number")).as("block_number"))

    val ordered = Seq(col("block_number"), col("transaction_index"), col("log_index"))
    val poolSwaps = swaps.filter(col("address") === pool)
    val gasCols = if (gas) Seq("gas_price", "gas_used") else Seq.empty
    val perBucket = Ops.lastPerKey(
        poolSwaps
          .select((Seq(col("block_timestamp"),
            col("tick").cast("long").as("tick")) ++
            gasCols.map(c => col(c).cast("double").as(c)) ++ ordered): _*)
          .withColumn("bucket", Ops.bucketTs(col("block_timestamp"), dur)),
        keys = Seq(col("bucket")), order = ordered)
      .select((Seq(col("bucket").as("block_timestamp"), col("tick")) ++
        gasCols.map(col)): _*)

    val tickAsOf =
      if (!gas) perBucket
      else {
        // median gas within each bucket (reference quantile(0.5)),
        // then forward fill tick+gas across buckets
        val med = Ops.lastPerKey(
          poolSwaps
            .withColumn("bucket", Ops.bucketTs(col("block_timestamp"), dur))
            .groupBy(col("bucket"))
            .agg(percentile_approx(col("gas_price").cast("double"), lit(0.5), lit(10000))
                .as("gas_price_med"),
              percentile_approx(col("gas_used").cast("double"), lit(0.5), lit(10000))
                .as("gas_used_med")),
          keys = Seq(col("bucket")), order = Seq(col("bucket")))
        val joined = perBucket
          .withColumnRenamed("block_timestamp", "bucket")
          .drop("gas_price", "gas_used")
          .join(med, Seq("bucket"), "left")
          .withColumnRenamed("gas_price_med", "gas_price")
          .withColumnRenamed("gas_used_med", "gas_used")
          .withColumnRenamed("bucket", "block_timestamp")
        Ops.forwardFill(joined, Seq("tick", "gas_price", "gas_used"),
          order = Seq(col("block_timestamp")), partition = Seq.empty)
      }

    Ops.asofJoin(bnAsOf, tickAsOf, on = "block_timestamp", by = Seq.empty,
      valueCols = Seq("tick") ++ gasCols)
  }

  /** Latest block number at/after a datetime over all pools on the
    * chain (reference pool_helpers.py:44–60 — note the reference takes
    * max block *after* dt; mirrored). */
  def dtToBN(lake: Lake, chain: String, dt: Timestamp): Option[Long] = {
    val row = lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === chain && col("block_timestamp") >= lit(dt))
      .agg(max(col("block_number"))).first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }
}
