package graft.v3.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.v3.Schemas

/** Generic JDBC-backed [[Connector]] — the public-knowledge analog of
  * the reference's remote-warehouse pulls (BigQuery, gbq.py:73–105;
  * Allium HTTP, allium.py:218–322), re-expressed against plain JDBC so
  * any warehouse with a JDBC driver can feed the ingest loop.
  *
  * Division of labor:
  *  - discovery scalars (min/max block) and per-block counts run as
  *    push-down subqueries on the remote — only aggregates cross the
  *    wire, exactly like the reference's `SELECT max(block_number)`
  *    probes (template.py:51–63);
  *  - bulk reads go through Spark's JDBC source with the block-range
  *    predicate inside the remote WHERE clause; when `numPartitions`
  *    > 1 the range is split on `block_number` so executors pull
  *    segments in parallel (the scale path a single-cursor driver pull
  *    lacks);
  *  - results are cast column-by-column onto the pinned lake schema
  *    ([[Schemas.forTable]]) so warehouse-side type drift cannot leak
  *    into the lake.
  *
  * Scoping follows the connector-family contract documented on
  * [[ParquetFixtureConnector]]: `poolScoped = true` mirrors allium
  * (swaps/mint-burns filtered to one pool), false mirrors gbq
  * (chain-wide pulls).
  *
  * @param options extra Spark JDBC options (driver, user, password,
  *                fetchsize, ...), passed through verbatim
  * @param tableName remote name for a lake table (defaults to identity;
  *                  override when the warehouse prefixes/cases names)
  */
class JdbcConnector(spark: SparkSession, url: String,
                    options: Map[String, String] = Map.empty,
                    tableName: String => String = identity,
                    poolScoped: Boolean = false,
                    numPartitions: Int = 1)
    extends Connector {

  private def sqlLit(v: String): String = "'" + v.replace("'", "''") + "'"

  private def scopeWhere(table: String, pool: String, chain: String): String = {
    val base = s"chain_name = ${sqlLit(chain)}"
    if (poolScoped && (table == Schemas.PoolSwapEvents ||
        table == Schemas.PoolMintBurnEvents))
      s"$base AND address = ${sqlLit(pool)}"
    else base
  }

  private def readQuery(query: String,
                        extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($query) sq")
      .options(options ++ extra)
      .load()

  override def minMaxBlock(table: String, pool: String,
                           chain: String): Option[(Long, Long)] = {
    val q = s"""SELECT min(block_number) AS mn, max(block_number) AS mx
               |FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}""".stripMargin
    val r = readQuery(q).first()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  override def findSegment(table: String, maxBlock: Long, minBlock: Long,
                           pool: String, chain: String,
                           tgtMaxRows: Long): Long = {
    // remote aggregates to per-block counts (tiny result set); the
    // running total + cap is computed Spark-side, same as the fixture
    // connector — reference data_update.py:93–104
    val q = s"""SELECT block_number, count(*) AS n
               |FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}
               |  AND block_number >= $minBlock AND block_number <= $maxBlock
               |GROUP BY block_number""".stripMargin
    val cum = readQuery(q).withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("block_number"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.filter(col("cum") <= tgtMaxRows)
      .agg(max(col("block_number"))).first()
    if (r.isNullAt(0)) minBlock else math.max(r.getLong(0), minBlock)
  }

  override def read(table: String, maxBlock: Long, minBlock: Long,
                    pool: String, chain: String): DataFrame = {
    val q = s"""SELECT * FROM ${tableName(table)}
               |WHERE ${scopeWhere(table, pool, chain)}
               |  AND block_number >= $minBlock AND block_number <= $maxBlock""".stripMargin
    val partitioned =
      if (numPartitions <= 1 || maxBlock <= minBlock) Map.empty[String, String]
      else Map(
        "partitionColumn" -> "block_number",
        "lowerBound" -> minBlock.toString,
        "upperBound" -> maxBlock.toString,
        "numPartitions" -> numPartitions.toString)
    val df = readQuery(q, partitioned)
    // normalize onto the pinned lake schema (names + types, in order)
    df.select(Schemas.forTable(table).fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}
