package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.v3.ingest.{Ingest, ParquetFixtureConnector}

/** The NFP scoping family (reference allium.py:161–211): the
  * attribution join's exact semantics on hand-built frames, and the
  * raw manager-log table going through the real ingest loop —
  * segmented pulls, partitioned appends, idempotent resume. */
class NfpSpec extends SparkSpec {

  private def mbRow(tx: String, addr: String, a: String, a0: String,
                    a1: String, lo: String, hi: String, li: Long) = {
    import spark.implicits._
    Seq((("ethereum"), addr, tx, 100L, a, a0, a1, lo, hi, li))
      .toDF("chain_name", "address", "transaction_hash", "block_number",
        "amount", "amount0", "amount1", "tick_lower", "tick_upper",
        "log_index")
  }

  private def nfpRow(tx: String, a: String, a0: String, a1: String,
                     tok: String, li: Long) = {
    import spark.implicits._
    Seq(("ethereum", "IncreaseLiquidity", tx, 100L, 0L, "0xu1",
        a, a0, a1, tok, li))
      .toDF("chain_name", "name", "transaction_hash", "block_number",
        "tx_index", "from_address", "amount", "amount0", "amount1",
        "tokenId", "log_index")
  }

  test("attributePositions: equi keys, strict log-index theta, multi-match") {
    val mb = mbRow("0xa", "0xp1", "5", "10", "20", "-60", "60", 3)
      .unionByName(mbRow("0xb", "0xp1", "7", "11", "21", "-60", "60", 4))
      .unionByName(mbRow("0xc", "0xp2", "9", "12", "22", "-10", "10", 2))
      // same tx, same exact amounts twice (two identical core events):
      // a later manager log matches BOTH, like the reference join would
      .unionByName(mbRow("0xd", "0xp3", "1", "2", "3", "-5", "5", 1))
      .unionByName(mbRow("0xd", "0xp3", "1", "2", "3", "-5", "5", 2))
    val nfp = nfpRow("0xa", "5", "10", "20", "101", 5) // match
      .unionByName(nfpRow("0xb", "7", "11", "21", "102", 4)) // theta: equal -> drop
      .unionByName(nfpRow("0xc", "9", "12", "99", "103", 5)) // amount1 differs -> drop
      .unionByName(nfpRow("0xd", "1", "2", "3", "104", 7))   // matches both cores
      .unionByName(nfpRow("0xe", "5", "10", "20", "105", 5)) // no such tx -> drop
    val got = Nfp.attributePositions(nfp, mb)
      .select("transaction_hash", "tokenId", "address")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(("0xa", "101", "0xp1"),
      ("0xd", "104", "0xp3"), ("0xd", "104", "0xp3")))
  }

  test("nfp ingests through the segment loop and resumes idempotently") {
    import spark.implicits._
    val root = Files.createTempDirectory("nfp-ingest").toString
    val rows = (1 to 60).map { i =>
      ("ethereum", "IncreaseLiquidity", s"0xtx$i", 1000L + i / 2, 0L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }
    rows.toDF("chain_name", "name", "transaction_hash", "block_number",
        "tx_index", "from_address", "amount", "amount0", "amount1",
        "tokenId", "log_index")
      .write.mode("overwrite")
      .parquet(s"$root/fix/${Schemas.Nfp}/example.parquet")
    val lake = new Lake(spark, s"$root/lake")
    val c = new ParquetFixtureConnector(spark, s"$root/fix")
    val r1 = Ingest.updateTable(lake, c, pool = "0xp", chain = "ethereum",
      table = Schemas.Nfp, tgtMaxRows = 20L, capBlock = None,
      ovmMapping = None)
    assert(r1.rows == 60L && r1.segments >= 3,
      s"expected >=3 capped segments, got ${r1.segments}")
    assert(lake.read(Schemas.Nfp).count() == 60L)
    // resume: nothing new upstream -> no appends, no duplicates
    val r2 = Ingest.updateTable(lake, c, pool = "0xp", chain = "ethereum",
      table = Schemas.Nfp, tgtMaxRows = 20L, capBlock = None,
      ovmMapping = None)
    assert(r2.rows == 0L)
    assert(lake.read(Schemas.Nfp).count() == 60L)
    // schema round-trips through the lake pinned
    assert(lake.read(Schemas.Nfp).schema.fieldNames.toSet ==
      Schemas.nfp.fieldNames.toSet)
  }
}
