package graft.v3

import org.apache.spark.sql.types._

/** Explicit StructType contracts for the four Uniswap v3 event tables.
  *
  * The reference infers schemas from parquet footers at scan time
  * (SURVEY.md §1.3); we pin them so a 100 TB lake can't drift. Big
  * numerics (amounts, sqrtPriceX96, liquidity, gas) stay StringType:
  * they are int256/uint160 values that exceed both LongType and
  * DecimalType(38,0) — identity stays exact as strings, arithmetic
  * casts to DoubleType at use sites, matching the reference's
  * precision contract (reference v3/helpers/swap.py:61–64,
  * v3/state.py:157–164).
  */
object Schemas {

  val FactoryPoolCreated = "factory_pool_created"
  val PoolInitializeEvents = "pool_initialize_events"
  val PoolSwapEvents = "pool_swap_events"
  val PoolMintBurnEvents = "pool_mint_burn_events"
  val Nfp = "nfp"

  /** The per-pool update set. [[Nfp]] is an opt-in family like the
    * reference's (only the allium connector ships it, allium.py:10–25,
    * 161–211) — pass it explicitly to the ingest loop. */
  val allTables: Seq[String] =
    Seq(FactoryPoolCreated, PoolInitializeEvents, PoolSwapEvents, PoolMintBurnEvents)

  private def s(n: String) = StructField(n, StringType, nullable = true)
  private def l(n: String) = StructField(n, LongType, nullable = true)
  private def t(n: String) = StructField(n, TimestampType, nullable = true)

  /** Pool registry — one row per pool creation (reference
    * v3/helpers/connectors/allium.py:44–63). */
  val factory: StructType = StructType(Seq(
    s("chain_name"), t("block_timestamp"), l("block_number"),
    s("transaction_hash"), l("log_index"),
    s("token0"), s("token1"), s("fee"), s("tickSpacing"), s("pool")))

  /** Pool initialization events (allium.py:132–156). */
  val initialize: StructType = StructType(Seq(
    s("chain_name"), s("address"), t("block_timestamp"), l("block_number"),
    l("log_index"), l("transaction_index"), s("transaction_hash"),
    s("sqrtPriceX96"), s("tick"), s("to_address"), s("from_address"),
    s("gas_price"), s("gas_used")))

  /** Swap events — the high-volume fact table (allium.py:66–91). */
  val swaps: StructType = StructType(Seq(
    s("chain_name"), s("address"), t("block_timestamp"), l("block_number"),
    s("transaction_hash"), l("log_index"), s("amount0"), s("amount1"),
    s("sqrtPriceX96"), s("liquidity"), s("tick"), s("sender"), s("recipient"),
    s("to_address"), s("from_address"), l("transaction_index"),
    s("gas_price"), s("gas_used"), s("l1_fee")))

  /** Mint/burn events; `type_of_event` ∈ {1, −1} (allium.py:93–130). */
  val mintBurn: StructType = StructType(Seq(
    s("chain_name"), s("address"), t("block_timestamp"), l("block_number"),
    s("transaction_hash"), l("log_index"), s("amount"), s("amount0"),
    s("amount1"), s("owner"), s("tick_lower"), s("tick_upper"),
    l("type_of_event"), s("to_address"), s("from_address"),
    l("transaction_index"), s("gas_price"), s("gas_used"), s("l1_fee")))

  /** RAW NFT-position-manager decoded-log rows (the inner `nfp`
    * subselect of the reference's nfp query, allium.py:176–190):
    * chain-scoped manager events with their exact big-int params as
    * strings. The reference joins these to core mint/burns INSIDE the
    * warehouse query (allium.py:193–210); Spark-first, the raw rows
    * land in the lake and [[Nfp.attributePositions]] runs the same
    * join distributed — the warehouse stays a dumb scan surface. */
  val nfp: StructType = StructType(Seq(
    s("chain_name"), s("name"), s("transaction_hash"), l("block_number"),
    l("tx_index"), s("from_address"), s("amount"), s("amount0"),
    s("amount1"), s("tokenId"), l("log_index")))

  def forTable(table: String): StructType = table match {
    case FactoryPoolCreated  => factory
    case PoolInitializeEvents => initialize
    case PoolSwapEvents      => swaps
    case PoolMintBurnEvents  => mintBurn
    case Nfp                 => nfp
    case other => throw new IllegalArgumentException(s"unknown table $other")
  }
}
