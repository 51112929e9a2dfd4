package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-filter file skipping: on an UNCLUSTERED table every file's
  * footer key range spans the keyspace, so range pruning keeps
  * everything — the parquet bloom filters the table's
  * `write.bloom.columns` property turns on are then the only thing
  * standing between a point lookup and a full scan. A bloom can only
  * prove ABSENCE, so presence behavior must stay exact. */
class LakeBloomSkipSpec extends SparkSpec {

  private def rows(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      ("ethereum", "IncreaseLiquidity", f"0xtx$i%06d", 1000L + i, 0L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  // interleaved waves: every file holds keys across the whole range,
  // so footer [min,max] can never exclude a file
  private def interleaved(lake: Lake): Unit =
    (0 until 4).foreach(j =>
      lake.append(rows((0 until 400).filter(_ % 4 == j)).coalesce(1),
        Schemas.Nfp))

  test("bloom proves absence on an unclustered table; presence stays exact") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-bl").toString)
    lake.setTableProperties(Schemas.Nfp,
      Map("write.bloom.columns" -> "transaction_hash",
          "write.bloom.ndv" -> "1000"))
    interleaved(lake)
    // absent key INSIDE every file's range: ranges keep all 4, blooms
    // must drop all 4
    val (miss, stMiss) = lake.readKeys(Schemas.Nfp, "transaction_hash",
      Seq("0xtx000200x"))
    assert(stMiss.files == 4 && stMiss.scanned == 0,
      s"bloom should prove the miss absent in every file: $stMiss")
    assert(miss.count() == 0L)
    assert(lake.bloomReads.get() > 0, "blooms were never consulted")
    // present key: its file survives the bloom and the row comes back
    val (hit, stHit) = lake.readKeys(Schemas.Nfp, "transaction_hash",
      Seq("0xtx000202"))
    assert(stHit.scanned >= 1 && stHit.scanned < stHit.files,
      s"present key should scan its file(s) only: $stHit")
    val got = hit.collect()
    assert(got.length == 1 && got(0).getAs[String]("amount") == "202")
    // rewrites preserve the filters: after compaction the lookup still
    // bloom-skips (the rewrite write path must carry the option)
    assert(lake.compact(Schemas.Nfp, targetBytes = 1L << 30) > 0)
    val (miss2, stMiss2) = lake.readKeys(Schemas.Nfp, "transaction_hash",
      Seq("0xtx000200x"))
    assert(stMiss2.scanned == 0 && miss2.count() == 0L,
      s"post-compaction files lost their blooms: $stMiss2")
  }

  test("upsert planning bloom-prunes an unclustered table") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-bl4").toString)
    lake.setTableProperties(Schemas.Nfp,
      Map("write.bloom.columns" -> "transaction_hash",
          "write.bloom.ndv" -> "1000"))
    interleaved(lake)
    // batch keys all ≡ 2 (mod 4): only wave-2's file can hold them,
    // but every file's RANGE spans the keyspace — the bloom is what
    // scopes the rewrite to 1 of 4 files
    val batch = rows((0 until 400).filter(_ % 4 == 2).take(10))
      .withColumn("amount", lit("bumped"))
    val st = lake.upsert(batch, Schemas.Nfp,
      Seq("chain_name", "transaction_hash"))
    assert(st.chainFiles == 4 && st.touchedFiles == 1,
      s"bloom should scope the merge to the one containing file: $st")
    val eth = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(eth.size == 400)
    (0 until 400).filter(_ % 4 == 2).take(10).foreach(i =>
      assert(eth(f"0xtx$i%06d") == "bumped"))
    assert(eth(f"0xtx${3}%06d") == "3", "untouched keys must survive")
  }

  test("without the property the lookup stays conservative (all files)") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-bl2").toString)
    interleaved(lake)
    val (miss, st) = lake.readKeys(Schemas.Nfp, "transaction_hash",
      Seq("0xtx000200x"))
    assert(st.files == 4 && st.scanned == 4,
      s"no blooms written: every in-range file must be scanned: $st")
    assert(miss.count() == 0L)
  }

  test("table properties merge, overwrite, and delete by null") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-bl3").toString)
    assert(lake.tableProperties(Schemas.Nfp).isEmpty)
    lake.setTableProperties(Schemas.Nfp, Map("a" -> "1", "b" -> "2"))
    lake.setTableProperties(Schemas.Nfp, Map("b" -> "3", "c" -> "4"))
    assert(lake.tableProperties(Schemas.Nfp) ==
      Map("a" -> "1", "b" -> "3", "c" -> "4"))
    lake.setTableProperties(Schemas.Nfp, Map("b" -> null))
    assert(lake.tableProperties(Schemas.Nfp) == Map("a" -> "1", "c" -> "4"))
  }
}
