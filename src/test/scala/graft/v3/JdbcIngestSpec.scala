package graft.v3

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.v3.ingest.{Ingest, JdbcConnector}

/** End-to-end ingest through the generic JDBC connector against an
  * embedded Derby database (in-memory, ships with Spark's jars) — the
  * offline-testable stand-in for a real warehouse (S4/S5). Exercises
  * discovery (min/max), segmenting (row-capped pulls), the bulk read's
  * schema normalization, and resume.
  */
class JdbcIngestSpec extends SparkSpec {

  private val DbUrl = "jdbc:derby:memory:graftjdbc;create=true"
  private val Pool = "0xpool1"
  private val Chain = "ethereum"
  private val NBlocks = 12
  private val RowsPerBlock = 5 // 60 pool rows + 60 other-pool rows

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(DbUrl)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE pool_swap_events (
        |  chain_name VARCHAR(64), address VARCHAR(64),
        |  block_timestamp TIMESTAMP, block_number BIGINT,
        |  transaction_hash VARCHAR(80), log_index BIGINT,
        |  amount0 VARCHAR(80), amount1 VARCHAR(80),
        |  sqrtPriceX96 VARCHAR(80), liquidity VARCHAR(80),
        |  tick VARCHAR(16), sender VARCHAR(64), recipient VARCHAR(64),
        |  to_address VARCHAR(64), from_address VARCHAR(64),
        |  transaction_index BIGINT, gas_price VARCHAR(32),
        |  gas_used VARCHAR(32), l1_fee VARCHAR(32))""".stripMargin)
    val ins = conn.prepareStatement(
      """INSERT INTO pool_swap_events (chain_name, address, block_timestamp,
        |  block_number, transaction_hash, log_index, tick, transaction_index)
        |VALUES (?, ?, ?, ?, ?, ?, ?, ?)""".stripMargin)
    for (b <- 1 to NBlocks; r <- 0 until RowsPerBlock;
         addr <- Seq(Pool, "0xother")) {
      ins.setString(1, Chain)
      ins.setString(2, addr)
      ins.setTimestamp(3, new Timestamp(1620000000000L + b * 60000L))
      ins.setLong(4, 1000L + b)
      ins.setString(5, s"0xtx$b-$r-$addr")
      ins.setLong(6, r.toLong)
      ins.setString(7, (-40000 - b).toString)
      ins.setLong(8, r.toLong)
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
  }

  private def connector(poolScoped: Boolean) = {
    seeded
    new JdbcConnector(spark, DbUrl,
      options = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      poolScoped = poolScoped, numPartitions = 2)
  }

  test("discovery and segmenting push down to the warehouse") {
    val c = connector(poolScoped = true)
    assert(c.minMaxBlock(Schemas.PoolSwapEvents, Pool, Chain)
      .contains((1001L, 1012L)))
    assert(c.minMaxBlock(Schemas.PoolSwapEvents, Pool, "nochain").isEmpty)
    // 5 pool rows per block, cap 12 → exactly two blocks fit
    assert(c.findSegment(Schemas.PoolSwapEvents, 1012L, 1001L, Pool, Chain,
      tgtMaxRows = 12) == 1002L)
  }

  test("read normalizes onto the pinned lake schema") {
    val df = connector(poolScoped = true)
      .read(Schemas.PoolSwapEvents, 1003L, 1001L, Pool, Chain)
    assert(df.schema == Schemas.swaps)
    assert(df.count() == 3 * RowsPerBlock)
    assert(df.agg(max(col("tick").cast("long"))).first().getLong(0) == -40001L)
  }

  test("ingest loop runs end-to-end over JDBC, segment-capped, and resumes") {
    val lake = new Lake(spark, Files.createTempDirectory("graft-jdbc-lake").toString)
    val c = connector(poolScoped = true)
    val reports = Ingest.updateTables(lake, c, Pool, Chain,
      tables = Seq(Schemas.PoolSwapEvents), tgtMaxRows = 12,
      poolScopedResume = Set(Schemas.PoolSwapEvents))
    val r = reports.head
    assert(r.rows == NBlocks * RowsPerBlock.toLong, r.toString)
    assert(r.segments == NBlocks / 2, r.toString) // 2 blocks per pull at cap 12
    assert(lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === Chain).count() == NBlocks * RowsPerBlock.toLong)
    // resume: nothing new upstream → no appends
    val again = Ingest.updateTables(lake, c, Pool, Chain,
      tables = Seq(Schemas.PoolSwapEvents), tgtMaxRows = 12,
      poolScopedResume = Set(Schemas.PoolSwapEvents))
    assert(again.head.rows == 0L, again.toString)
  }
}
