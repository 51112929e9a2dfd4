package graft.v3

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** The commit protocol on a DEGRADED store ([[NonAtomicTestFs]]:
  * rename = copy+delete, last-writer-wins, no winner arbitration —
  * legacy object-store semantics). The protocol's documented contract
  * (Lake.scala STORE CONTRACT): with atomic create-no-overwrite but
  * NON-atomic rename, a rival can displace a fresh commit claim — and
  * the publish fence must then yield exactly one winner, the displaced
  * writer aborting LOUDLY with nothing published. */
class LakeStoreContractSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum",
                   amt: Int => String = i => s"$i") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%05d", 1000L + i, 0L,
        "0xu1", amt(i), s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  test("publish fence yields ONE winner when non-atomic rename displaces a mid-commit claim") {
    spark.sparkContext.hadoopConfiguration.set("fs.nonatomic.impl",
      classOf[NonAtomicTestFs].getName)
    val root =
      s"nonatomic:${Files.createTempDirectory("lake-store").toString}"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val a = new Lake(spark, root)
    val b = new Lake(spark, root)
    // the whole write/read path works on the degraded store
    a.append(rows(0 until 5), Schemas.Nfp)
    assert(a.read(Schemas.Nfp).count() == 5L)

    // A lands a second append; in the window between its land and its
    // publish fence, a rival "breaks" A's FRESH claim — on this store
    // the break rename SUCCEEDS (copy+delete arbitrates nothing) —
    // then claims the lock and commits
    a.preFenceHook = () => {
      a.preFenceHook = () => ()
      val lockDir = s"$root/_manifest/${Schemas.Nfp}"
      assert(fs.rename(new Path(s"$lockDir/.commit.lock"),
        new Path(s"$lockDir/.commit.lock.broken-rival")),
        "degraded rename refused - the spec's premise broke")
      b.append(rows(100 until 104).coalesce(1), Schemas.Nfp)
    }
    val e = intercept[Lake.ConcurrentWriteException] {
      a.append(rows(50 until 55), Schemas.Nfp)
    }
    assert(e.getMessage.contains("lost its commit claim"), e.getMessage)

    // exactly one winner: the seed + B's commit; A published NOTHING
    val txs = a.read(Schemas.Nfp)
      .select("transaction_hash").collect().map(_.getString(0)).toSet
    val want = ((0 until 5) ++ (100 until 104)).map(i => f"0xtx$i%05d").toSet
    assert(txs == want, s"diverged: $txs")
    // every manifest entry names a file that exists on disk
    a.fileInventory(Schemas.Nfp).foreach { case (_, p, _) =>
      assert(fs.exists(new Path(p)), s"manifest names a missing file: $p")
    }
    // A's landed-but-unpublished files are orphans: invisible above,
    // sweepable below, after which manifest and disk agree exactly
    Thread.sleep(100)
    val st = a.vacuum(Schemas.Nfp, keepLast = 8, staleCommitMs = 50L,
      sweepOrphans = true)
    assert(st.filesDeleted >= 1, s"A's landed files were not orphans: $st")
    assert(a.fileInventory(Schemas.Nfp) == a.listInventory(Schemas.Nfp))
    assert(a.read(Schemas.Nfp).count() == 9L)
  }

  test("a displaced writer's retry re-plans and lands on the degraded store") {
    spark.sparkContext.hadoopConfiguration.set("fs.nonatomic.impl",
      classOf[NonAtomicTestFs].getName)
    val root =
      s"nonatomic:${Files.createTempDirectory("lake-store2").toString}"
    val a = new Lake(spark, root)
    val b = new Lake(spark, root)
    a.append(rows(0 until 5).coalesce(1), Schemas.Nfp)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    a.preFenceHook = () => {
      a.preFenceHook = () => ()
      val lockDir = s"$root/_manifest/${Schemas.Nfp}"
      fs.rename(new Path(s"$lockDir/.commit.lock"),
        new Path(s"$lockDir/.commit.lock.broken-rival"))
      b.upsert(rows(0 until 2, amt = i => s"B$i").localCheckpoint(),
        Schemas.Nfp, Seq("chain_name", "transaction_hash"))
    }
    // upsertRetrying classifies the fence abort as the lost race it is
    // and the second attempt commits cleanly
    val st = a.upsertRetrying(
      rows(3 until 5, amt = i => s"A$i").localCheckpoint(), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), backoffMs = 1L)
    assert(st.landedFiles >= 1)
    val amounts = a.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(amounts(f"0xtx${0}%05d") == "B0" && amounts(f"0xtx${1}%05d") == "B1",
      s"rival's merge lost: $amounts")
    assert(amounts(f"0xtx${3}%05d") == "A3" && amounts(f"0xtx${4}%05d") == "A4",
      s"displaced writer's retry lost: $amounts")
  }

  test("last-writer-wins create (no conditional put): one winner + LOUD abort, never a silent lost update") {
    // the store contract's MANDATORY primitive removed: create(…,
    // overwrite = false) silently clobbers, so two writers can both
    // believe they hold the commit lock. Pinned here: the token-checked
    // publish fence detects the displaced claim — the intruder commits,
    // the displaced writer ABORTS with nothing published, and the
    // manifest never names a missing file. (If the displaced writer
    // instead reached its publish first, the intruder's version rename
    // hits an existing destination and fails loudly — either
    // interleaving is one winner + a loud error, which is exactly what
    // the contract note promises and no more: deploy real lakes on
    // stores WITH conditional puts.)
    spark.sparkContext.hadoopConfiguration.set("fs.lwwcreate.impl",
      classOf[LwwCreateTestFs].getName)
    val root =
      s"lwwcreate:${Files.createTempDirectory("lake-lww").toString}"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // the degradation premise: exclusive create does NOT exclude
    val probe = new Path(s"$root/.lww-probe")
    fs.create(probe, false).close()
    fs.create(probe, false).close() // a compliant store throws here
    val a = new Lake(spark, root)
    val b = new Lake(spark, root)
    a.append(rows(0 until 5), Schemas.Nfp)
    assert(a.read(Schemas.Nfp).count() == 5L)

    // A lands its second append and holds what it believes is the
    // lock; the rival B acquires the SAME lock (its create clobbers
    // A's token — no IOException on this store) and runs a complete
    // commit. A's fence must then find B's token (or nothing) and
    // abort.
    a.preFenceHook = () => {
      a.preFenceHook = () => ()
      b.append(rows(100 until 104).coalesce(1), Schemas.Nfp)
    }
    val e = intercept[Lake.ConcurrentWriteException] {
      a.append(rows(50 until 55), Schemas.Nfp)
    }
    assert(e.getMessage.contains("lost its commit claim"), e.getMessage)

    // one winner: seed + B; A published nothing and its landed files
    // are invisible orphans
    val txs = a.read(Schemas.Nfp)
      .select("transaction_hash").collect().map(_.getString(0)).toSet
    val want = ((0 until 5) ++ (100 until 104)).map(i => f"0xtx$i%05d").toSet
    assert(txs == want, s"diverged: $txs")
    a.fileInventory(Schemas.Nfp).foreach { case (_, p, _) =>
      assert(fs.exists(new Path(p)), s"manifest names a missing file: $p")
    }
    Thread.sleep(100)
    val st = a.vacuum(Schemas.Nfp, keepLast = 8, staleCommitMs = 50L,
      sweepOrphans = true)
    assert(st.filesDeleted >= 1, s"A's landed files were not orphans: $st")
    assert(a.fileInventory(Schemas.Nfp) == a.listInventory(Schemas.Nfp))
    assert(a.read(Schemas.Nfp).count() == 9L)
  }
}
