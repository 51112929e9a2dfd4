package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Keyed upsert (CDC apply): replace / insert / delete semantics,
  * partition-bounded rewrites, and the unique-per-key guard. */
class LakeUpsertSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum",
                   amt: Int => String = i => s"$i") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", s"0xtx$i", 1000L + i, 0L,
        "0xu1", amt(i), s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  test("upsert replaces, inserts, deletes; untouched chains never rewritten") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-up").toString)
    lake.append(rows(0 until 20), Schemas.Nfp)
    lake.append(rows(100 until 110, chain = "base"), Schemas.Nfp)
    val baseFiles = lake.fileInventory(Schemas.Nfp)
      .filter(_._1 == "base").map(_._2).toSet
    // batch: update keys 0-4 (amount bumped), insert 20-24, delete 5-9
    val batch = rows(0 until 5, amt = i => s"updated$i")
      .withColumn("__del", lit(false))
      .unionByName(rows(20 until 25).withColumn("__del", lit(false)))
      .unionByName(rows(5 until 10).withColumn("__del", lit(true)))
    lake.upsert(batch, Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"))
    val eth = lake.read(Schemas.Nfp)
      .filter(col("chain_name") === "ethereum")
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(eth.size == 20, s"expected 20 eth rows, got ${eth.size}")
    (0 until 5).foreach(i => assert(eth(s"0xtx$i") == s"updated$i"))
    (5 until 10).foreach(i => assert(!eth.contains(s"0xtx$i")))
    (10 until 20).foreach(i => assert(eth(s"0xtx$i") == s"$i"))
    (20 until 25).foreach(i => assert(eth(s"0xtx$i") == s"$i"))
    // base partition untouched byte-for-byte (same files)
    val baseAfter = lake.fileInventory(Schemas.Nfp)
      .filter(_._1 == "base").map(_._2).toSet
    assert(baseAfter == baseFiles, "untouched chain partition was rewritten")
  }

  test("deleting a chain's every row drops its partition directory") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-up2").toString)
    lake.append(rows(0 until 3, chain = "base"), Schemas.Nfp)
    lake.append(rows(10 until 13), Schemas.Nfp)
    val batch = rows(0 until 3, chain = "base")
      .withColumn("__del", lit(true))
    lake.upsert(batch, Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"))
    assert(lake.read(Schemas.Nfp)
      .filter(col("chain_name") === "base").count() == 0L)
    assert(lake.read(Schemas.Nfp).count() == 3L)
    assert(!lake.fileInventory(Schemas.Nfp).exists(_._1 == "base"))
  }

  test("NULL deleteCol means not-a-tombstone, never a silent delete") {
    import spark.implicits._
    val lake = new Lake(spark, Files.createTempDirectory("lake-up4").toString)
    lake.append(rows(0 until 3), Schemas.Nfp)
    // a change file written before __del existed: the column reads back
    // as typed nulls (the SchemaEvolutionSpec case)
    val batch = rows(Seq(1), amt = _ => "updated1")
      .withColumn("__del", lit(null).cast("boolean"))
    lake.upsert(batch, Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"))
    val state = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state.size == 3, "NULL __del row vanished - silent delete")
    assert(state("0xtx1") == "updated1")
  }

  test("a batch with two versions of one key fails fast") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-up3").toString)
    lake.append(rows(0 until 2), Schemas.Nfp)
    val dup = rows(Seq(1, 1))
    val e = intercept[IllegalArgumentException](
      lake.upsert(dup, Schemas.Nfp, Seq("chain_name", "transaction_hash")))
    assert(e.getMessage.contains("lastPerKey"))
  }
}
