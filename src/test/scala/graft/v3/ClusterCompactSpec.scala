package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Key-clustered compaction: interleaved appends give every file a
  * full-width key range (footer pruning can't prune); clusterCompact
  * rewrites the chain into tight disjoint ranges so the file-grain
  * upsert touches O(batch keys) files — rows preserved exactly. */
class ClusterCompactSpec extends SparkSpec {

  private def rows(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map { i =>
      ("ethereum", "IncreaseLiquidity", f"0xtx$i%05d", 1000L + i, 0L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  /** Four interleaved appends over 0..399: every file spans nearly the
    * whole key range, the worst case for range pruning. */
  private def buildInterleaved(lake: Lake): Unit =
    (0 until 4).foreach { j =>
      lake.append(rows((0 until 400).filter(_ % 4 == j)).coalesce(1),
        Schemas.Nfp)
    }

  private def narrowBatch = rows(100 to 104)
    .withColumn("amount", lit("upd"))

  test("interleaved appends defeat pruning; clustering restores it; rows survive exactly") {
    // BEFORE: every file's footer range covers the batch keys
    val before = new Lake(spark, Files.createTempDirectory("cl-a").toString)
    buildInterleaved(before)
    val stBefore = before.upsert(narrowBatch, Schemas.Nfp,
      Seq("chain_name", "transaction_hash"))
    assert(stBefore.chainFiles == 4 && stBefore.touchedFiles == 4,
      s"interleaved files should all be touched, got $stBefore")

    // AFTER: clustered rewrite -> tight disjoint ranges
    val after = new Lake(spark, Files.createTempDirectory("cl-b").toString)
    buildInterleaved(after)
    val bytes = after.fileInventory(Schemas.Nfp).map(_._3).sum
    assert(after.clusterCompact(Schemas.Nfp, targetBytes = bytes / 4,
      clusterBy = Seq("transaction_hash")) == 1)
    val inv = after.fileInventory(Schemas.Nfp)
    assert(inv.size >= 3, s"expected multiple clustered files, got $inv")
    // rows preserved exactly through the rewrite
    val got = after.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 400)
    (0 until 400).foreach(i => assert(got(f"0xtx$i%05d") == s"$i"))
    // the same narrow batch now touches a small fraction of the files
    val stAfter = after.upsert(narrowBatch, Schemas.Nfp,
      Seq("chain_name", "transaction_hash"))
    assert(stAfter.touchedFiles <= 2,
      s"clustered pruning should touch <=2 of ${stAfter.chainFiles} " +
        s"files for 5 adjacent keys, got $stAfter")
    assert(stAfter.touchedFiles < stAfter.chainFiles)
    // and the merge itself is still correct
    val merged = after.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged.size == 400)
    (100 to 104).foreach(i => assert(merged(f"0xtx$i%05d") == "upd"))
    assert(merged("0xtx00099") == "99" && merged("0xtx00105") == "105")
  }

  test("retain-mode clustering keeps pre-rewrite snapshots readable") {
    val lake = new Lake(spark, Files.createTempDirectory("cl-c").toString)
    buildInterleaved(lake)
    val v1 = lake.snapshot(Schemas.Nfp)
    val bytes = lake.fileInventory(Schemas.Nfp).map(_._3).sum
    assert(lake.clusterCompact(Schemas.Nfp, targetBytes = bytes / 4,
      clusterBy = Seq("transaction_hash"), retain = true) == 1)
    assert(lake.readAt(Schemas.Nfp, v1).count() == 400L)
    assert(lake.read(Schemas.Nfp).count() == 400L)
    // in-window: the interleaved appends that ADDED the re-clustered
    // originals are still retained, so a from-0 CDC replay pins them
    // (r16 lifecycle) — vacuum frees nothing until the window rolls
    val vs = lake.vacuum(Schemas.Nfp, keepLast = 0)
    assert(vs.filesDeleted == 0,
      s"in-window vacuum must keep commit-log-pinned files: $vs")
    lake.setTableProperties(Schemas.Nfp,
      Map("manifest.minRetainedCommits" -> "1"))
    (0 until 3).foreach(_ => lake.refreshManifest(Schemas.Nfp))
    val vs2 = lake.vacuum(Schemas.Nfp, keepLast = 0)
    assert(vs2.filesDeleted == 4, s"expected 4 retired files freed: $vs2")
  }

  test("onlyChains bounds the rewrite: cold chains' files stay byte-identical") {
    import spark.implicits._
    val lake = new Lake(spark, Files.createTempDirectory("cl-oc").toString)
    buildInterleaved(lake) // ethereum: 4 fragmented files
    // a cold, already-compact chain that maintenance must NOT touch
    lake.append(rows(0 until 50)
      .withColumn("chain_name", lit("base")).coalesce(1), Schemas.Nfp)
    val coldBefore = lake.fileInventory(Schemas.Nfp)
      .filter(_._1 == "base")
    assert(lake.fragmentedChains(Schemas.Nfp, maxChainFiles = 2) ==
      Seq("ethereum"))
    val n = lake.clusterCompact(Schemas.Nfp, targetBytes = 1L << 14,
      clusterBy = Seq("transaction_hash"),
      onlyChains = Seq("ethereum"))
    assert(n == 1, s"expected exactly the fragmented chain rewritten: $n")
    val coldAfter = lake.fileInventory(Schemas.Nfp).filter(_._1 == "base")
    assert(coldAfter == coldBefore,
      s"cold chain was rewritten:\n  before=$coldBefore\n  after=$coldAfter")
    assert(lake.read(Schemas.Nfp).count() == 450L)
  }

  test("a zorder rewrite refuses tables whose schema uses the layout's working columns") {
    import org.apache.spark.sql.types.{StringType, StructField}
    val lake = new Lake(spark, Files.createTempDirectory("cl-zc").toString)
    lake.append(rows(0 until 20), Schemas.Nfp)
    lake.evolveSchema(Schemas.Nfp, org.apache.spark.sql.types.StructType(
      Schemas.forTable(Schemas.Nfp).fields :+
        StructField("z", StringType, nullable = true)))
    lake.setTableProperties(Schemas.Nfp,
      Map("write.layout" -> "zorder(block_number,tx_index)"))
    val e = intercept[IllegalArgumentException] {
      lake.clusterCompact(Schemas.Nfp, targetBytes = 1L << 14)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // rows untouched by the refused rewrite
    assert(lake.read(Schemas.Nfp).count() == 20L)
  }
}
