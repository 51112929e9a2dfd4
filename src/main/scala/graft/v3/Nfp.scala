package graft.v3

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NFT-position-manager attribution — the reference's `nfp` data flow
  * (reference v3/helpers/connectors/allium.py:161–211) re-expressed as
  * a distributed join instead of a warehouse-side one.
  *
  * The reference asks the warehouse to join decoded manager logs to
  * core pool mint/burns and ships only the joined rows. Spark-first,
  * the RAW manager logs are their own lake table ([[Schemas.nfp]]) and
  * this operator runs the identical join over the lake: an EQUI join
  * on (transaction_hash, amount, amount0, amount1) — the manager event
  * echoes the core event's exact big-int params, compared as strings,
  * never parsed — plus the reference's theta condition
  * `nfp.log_index > core.log_index` (within a transaction the manager
  * log is emitted AFTER the pool's own event; a pool touched directly,
  * or an unrelated same-tx event, never matches).
  *
  * Scale shape: both sides shuffle once on the composite equi key
  * (transaction_hash dominates — near-unique, no skew), the theta is a
  * post-match filter on the joined row, never a nested loop. Output
  * columns follow the reference's select list (allium.py:164–176).
  */
object Nfp {

  /** @param nfp       raw manager log rows ([[Schemas.nfp]])
    * @param mintBurns core pool mint/burn events ([[Schemas.mintBurn]]),
    *                  already pool-scoped by the caller (the reference
    *                  scopes its `mb` side to one pool, allium.py:204) */
  def attributePositions(nfp: DataFrame, mintBurns: DataFrame): DataFrame = {
    val mb = mintBurns.select(
      col("transaction_hash").as("mb_transaction_hash"),
      col("address"),
      col("amount").as("mb_amount"),
      col("amount0").as("mb_amount0"),
      col("amount1").as("mb_amount1"),
      col("tick_lower"), col("tick_upper"),
      col("log_index").as("core_log_index"))
    nfp.join(mb,
        col("transaction_hash") === col("mb_transaction_hash") &&
          col("amount") === col("mb_amount") &&
          col("amount0") === col("mb_amount0") &&
          col("amount1") === col("mb_amount1") &&
          col("log_index") > col("core_log_index"))
      .select(col("name"), col("chain_name"), col("transaction_hash"),
        col("block_number"), col("tx_index"), col("from_address"),
        col("amount"), col("amount0"), col("amount1"), col("tokenId"),
        col("address"), col("tick_lower"), col("tick_upper"))
  }
}
