package graft.v3.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.v3.Schemas

/** Remote-warehouse contract for the incremental ingest loop —
  * the Spark re-expression of the reference's connector template
  * (reference v3/helpers/connectors/template.py:27–135, with the
  * allium.py:218–271 argument shape, which SURVEY.md §7.1.8 identifies
  * as the canonical one; the gbq connector's arity has drifted).
  *
  * Implementations return DataFrames; the loop in [[Ingest]] is
  * driver-orchestrated batch, exactly like the reference's
  * micro-batch pull loop (§2.9).
  */
trait Connector {
  /** Remote (min_block, max_block) for the scope, or None if absent. */
  def minMaxBlock(table: String, pool: String, chain: String): Option[(Long, Long)]

  /** Largest block b in [minBlock, maxBlock] such that pulling
    * (minBlock, b] stays near `tgtMaxRows` rows
    * (reference data_update.py:93–104). */
  def findSegment(table: String, maxBlock: Long, minBlock: Long,
                  pool: String, chain: String, tgtMaxRows: Long): Long

  /** Pull rows with block_number in [minBlock, maxBlock]. */
  def read(table: String, maxBlock: Long, minBlock: Long,
           pool: String, chain: String): DataFrame
}

/** Offline connector that replays a directory of per-table parquet
  * (e.g. the reference's golden examples) as if it were the remote
  * warehouse — the test stand-in for the BigQuery/Allium HTTP
  * connectors (S4/S5), whose fetch happens driver-side and lands in
  * `spark.createDataFrame` just like this.
  *
  * Scoping: the reference's two connectors disagree — gbq pulls
  * chain-wide for every table (gbq.py:73–87; the golden examples were
  * produced this way, 90 pools in the swaps file) while allium filters
  * swaps/mint-burns to one pool (allium.py:93, 128). `poolScoped`
  * selects the family; default is the gbq/golden shape. */
class ParquetFixtureConnector(spark: SparkSession, fixtureRoot: String,
                              poolScoped: Boolean = false)
    extends Connector {

  private def scoped(table: String, pool: String, chain: String): DataFrame = {
    val df = spark.read.schema(Schemas.forTable(table))
      .parquet(s"$fixtureRoot/$table/example.parquet")
      .filter(col("chain_name") === chain)
    if (poolScoped && (table == Schemas.PoolSwapEvents ||
        table == Schemas.PoolMintBurnEvents))
      df.filter(col("address") === pool)
    else df
  }

  override def minMaxBlock(table: String, pool: String, chain: String): Option[(Long, Long)] = {
    val r = scoped(table, pool, chain)
      .agg(min(col("block_number")), max(col("block_number"))).first()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  override def findSegment(table: String, maxBlock: Long, minBlock: Long,
                           pool: String, chain: String, tgtMaxRows: Long): Long = {
    // per-block row counts → running total → largest block whose
    // cumulative count stays within target (min. one block of progress)
    val counts = scoped(table, pool, chain)
      .filter(col("block_number") >= minBlock && col("block_number") <= maxBlock)
      .groupBy(col("block_number")).agg(count(lit(1)).as("n"))
    val cum = counts.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("block_number"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.filter(col("cum") <= tgtMaxRows)
      .agg(max(col("block_number"))).first()
    if (r.isNullAt(0)) minBlock else math.max(r.getLong(0), minBlock)
  }

  override def read(table: String, maxBlock: Long, minBlock: Long,
                    pool: String, chain: String): DataFrame =
    scoped(table, pool, chain)
      .filter(col("block_number") >= minBlock && col("block_number") <= maxBlock)
}
