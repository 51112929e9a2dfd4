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

    val tickAsOf =
      if (!gas)
        Ops.lastPerKey(
            poolSwaps
              .select((Seq(col("block_timestamp"),
                col("tick").cast("long").as("tick")) ++ ordered): _*)
              .withColumn("bucket", Ops.bucketTs(col("block_timestamp"), dur)),
            keys = Seq(col("bucket")), order = ordered)
          .select(col("bucket").as("block_timestamp"), col("tick"))
      else {
        // gas path (pool_helpers.py:160–190): dedup to ONE row per
        // block_timestamp first (the reference's unique → sort →
        // group_by(ts).last(); its "last" among equal timestamps is
        // order-nondeterministic — resolved here by the explicit event
        // order), then per bucket: last tick by time, and the
        // Polars-parity nearest-interpolation median of the per-
        // timestamp gas values; forward fill all three across buckets.
        val perTs = Ops.lastPerKey(
            poolSwaps.select((Seq(col("block_timestamp"),
              col("tick").cast("long").as("tick")) ++
              gasCols.map(c => col(c).cast("long").as(c)) ++ ordered): _*),
            keys = Seq(col("block_timestamp")), order = ordered)
          .withColumn("bucket", Ops.bucketTs(col("block_timestamp"), dur))
        val agged = perTs.groupBy(col("bucket"))
          .agg(max_by(col("tick"), col("block_timestamp")).as("tick"),
            // reference: quantile(0.5) over UInt64 gas → Float64
            Ops.quantileNearestAgg(col("gas_price")).cast("double").as("gas_price"),
            Ops.quantileNearestAgg(col("gas_used")).cast("double").as("gas_used"))
          .withColumnRenamed("bucket", "block_timestamp")
        Ops.forwardFill(agged, Seq("tick", "gas_price", "gas_used"),
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
