package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** Streaming CDC apply: batch ordering, tombstones, intra-batch
  * latest-per-key compaction, and the replay-safety property the
  * scaladoc claims — re-applying an identical change batch is a
  * fixpoint (idempotency substitutes for an exactly-once sink). */
class UpsertStreamSpec extends SparkSpec {

  private def change(i: Int, amt: String, del: Boolean, bn: Long = 0L,
                     li: Long = 7L) =
    ("ethereum", "IncreaseLiquidity", s"0xtx$i", 1000L + i + bn, 0L,
      "0xu1", amt, s"${i * 10}", s"${i * 100}", s"$i", li, del)

  private def df(rows: Seq[(String, String, String, Long, Long, String,
      String, String, String, String, Long, Boolean)]) = {
    import spark.implicits._
    rows.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index", "__del")
  }

  /** One file per tranche with strictly increasing pinned mtimes, so
    * `maxFilesPerTrigger = 1` sees them as ordered micro-batches —
    * shared by every test in this suite. Appending MORE tranches
    * later continues the mtime sequence. */
  private def writeTranches(srcDir: String,
      tranches: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    val dir = new java.io.File(srcDir)
    def parquet() = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    tranches.foreach { t =>
      val before = parquet().map(_.getName).toSet
      val base = parquet().map(_.lastModified())
        .foldLeft(1600000000000L - 60000L)(math.max)
      t.coalesce(1).write.mode("append").parquet(srcDir)
      // stamp THIS tranche's new files one step past the sequence so
      // far — no reliance on write-clock resolution for ordering
      parquet().filterNot(f => before(f.getName))
        .foreach(_.setLastModified(base + 60000L))
    }
  }

  private val changeSchema = org.apache.spark.sql.types.StructType(
    Schemas.nfp.fields :+ org.apache.spark.sql.types.StructField(
      "__del", org.apache.spark.sql.types.BooleanType, nullable = true))

  private def runStream(srcDir: String, lake: Lake, ckDir: String): Unit = {
    val src = Streaming.fileStream(spark, srcDir, changeSchema,
      maxFilesPerTrigger = 1)
    val q = Streaming.upsertStream(src, lake, Schemas.Nfp,
      keys = Seq("chain_name", "transaction_hash"),
      orderCols = Seq("block_number", "log_index"),
      deleteCol = "__del", checkpointDir = ckDir).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
  }

  test("an upsert batch is a fixpoint: applying it twice equals applying it once") {
    val lake = new Lake(spark, Files.createTempDirectory("up-fix").toString)
    lake.append(df((0 until 10).map(i => change(i, s"$i", del = false)))
      .drop("__del"), Schemas.Nfp)
    val batch = df(Seq(change(1, "updated1", del = false),
      change(2, "x", del = true),
      change(50, "new50", del = false)))
    def state() = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSortedMap
    lake.upsert(batch, Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"))
    val once = state()
    lake.upsert(batch, Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"))
    assert(state() == once, "replayed batch changed the table state")
    assert(once("0xtx1") == "updated1" && once("0xtx50") == "new50"
      && !once.contains("0xtx2"))
  }

  test("upsertStream applies batches in order with intra-batch compaction") {
    val lake = new Lake(spark, Files.createTempDirectory("up-str").toString)
    val srcDir = Files.createTempDirectory("up-src").toString
    // batch 1: base keys 0..4; batch 2: two versions of key 1 in ONE
    // batch (block_number breaks the tie -> v2 wins) + tombstone of 3
    val t1 = df((0 until 5).map(i => change(i, s"base$i", del = false)))
    val t2 = df(Seq(
      change(1, "v1", del = false, bn = 100L, li = 1L),
      change(1, "v2", del = false, bn = 200L, li = 2L),
      change(3, "x", del = true)))
    writeTranches(srcDir, Seq(t1, t2))
    runStream(srcDir, lake, Files.createTempDirectory("up-ck").toString)
    val state = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state.size == 4)
    assert(state("0xtx1") == "v2", "latest-per-key must pick the later version")
    assert(!state.contains("0xtx3"))
    assert(state("0xtx0") == "base0" && state("0xtx4") == "base4")
  }

  test("a restarted stream resumes from its checkpoint: later runs process only new batches") {
    // DETERMINISTIC restart protocol (an async mid-batch kill would
    // race the non-atomic partition overwrite and flake): run 1 sees
    // only tranche 1 and drains; tranches 2-3 land afterwards; run 2
    // restarts from the SAME checkpoint and must process exactly the
    // new files — offset continuation, no reprocessing (the fixpoint
    // test above separately covers a REPLAYED batch being harmless).
    val lakeA = new Lake(spark, Files.createTempDirectory("up-recA").toString)
    val lakeB = new Lake(spark, Files.createTempDirectory("up-recB").toString)
    val srcA = Files.createTempDirectory("up-rec-srcA").toString
    val srcB = Files.createTempDirectory("up-rec-srcB").toString
    val ck = Files.createTempDirectory("up-rec-ck").toString
    val t1 = df((0 until 20).map(i => change(i, s"base$i", del = false)))
    val t2 = df((0 until 10).map(i => change(i, s"v2_$i", del = false)))
    val t3 = df((15 until 20).map(i => change(i, "x", del = true)))
    // interrupted timeline into lakeA: drain tranche 1, "restart"
    writeTranches(srcA, Seq(t1))
    runStream(srcA, lakeA, ck)
    assert(lakeA.read(Schemas.Nfp).count() == 20L,
      "first run must have applied the base load")
    writeTranches(srcA, Seq(t2, t3))
    runStream(srcA, lakeA, ck)
    // reference: one uninterrupted run over all three into lakeB
    writeTranches(srcB, Seq(t1, t2, t3))
    runStream(srcB, lakeB, Files.createTempDirectory("up-rec-ck2").toString)
    def state(l: Lake) = l.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSortedMap
    assert(state(lakeA) == state(lakeB),
      "restarted stream diverged from the uninterrupted run")
    assert(state(lakeB).size == 15) // 20 base - 5 tombstoned
    assert(state(lakeB)("0xtx3") == "v2_3")
  }

  test("maintenance hook bounds fragmentation over 20 batches; rows exact; snapshots survive") {
    val root = Files.createTempDirectory("up-mnt").toString
    val lake = new Lake(spark, root)
    val srcDir = Files.createTempDirectory("up-mnt-src").toString
    // seed + snapshot: the pinned pre-stream corpus must stay readable
    // through 20 batches of rewrites and the maintenance compactions
    lake.append(df((0 until 5).map(i => change(i, s"seed$i", del = false)))
      .drop("__del"), Schemas.Nfp)
    val v0 = lake.snapshot(Schemas.Nfp)
    // 20 micro-batches: each updates key 0 (touches one file) and
    // inserts two fresh keys (lands a new file) — the fragmenting
    // workload a long-running CDC stream produces
    val tranches = (0 until 20).map { b =>
      df(Seq(
        change(0, s"upd$b", del = false, bn = b * 10L),
        change(100 + b, s"new$b", del = false, bn = b * 10L),
        change(200 + b, s"n2_$b", del = false, bn = b * 10L)))
    }
    writeTranches(srcDir, tranches)
    val src = Streaming.fileStream(spark, srcDir, changeSchema,
      maxFilesPerTrigger = 1)
    val q = Streaming.upsertStream(src, lake, Schemas.Nfp,
      keys = Seq("chain_name", "transaction_hash"),
      orderCols = Seq("block_number", "log_index"),
      deleteCol = "__del",
      checkpointDir = Files.createTempDirectory("up-mnt-ck").toString,
      maintainEvery = 5, maintainMaxChainFiles = 6,
      maintainTargetBytes = 1L << 20, retain = true).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    // bounded: between hook runs at most maintainEvery batches × ~2
    // files accumulate on top of the threshold; without the hook this
    // workload holds 20+ live files
    val perChain = lake.fileInventory(Schemas.Nfp)
      .groupBy(_._1).map(_._2.size).max
    assert(perChain <= 12,
      s"maintenance did not bound fragmentation: $perChain files")
    // rows bag-identical to a sequential batch replay
    val replayLake = new Lake(spark,
      Files.createTempDirectory("up-mnt-replay").toString)
    replayLake.append(df((0 until 5).map(i =>
      change(i, s"seed$i", del = false))).drop("__del"), Schemas.Nfp)
    tranches.foreach { t =>
      val latest = graft.ops.Ops.lastPerKey(t,
        keys = Seq(col("chain_name"), col("transaction_hash")),
        order = Seq(col("block_number"), col("log_index")))
      replayLake.upsert(latest, Schemas.Nfp,
        Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"),
        checkUnique = false)
    }
    def state(l: Lake) = l.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSortedMap
    assert(state(lake) == state(replayLake),
      "maintained stream diverged from the batch replay")
    assert(state(lake)("0xtx0") == "upd19")
    // retain mode honored the pre-stream snapshot through every rewrite
    val pinned = lake.readAt(Schemas.Nfp, v0)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSortedMap
    assert(pinned == scala.collection.immutable.SortedMap(
      (0 until 5).map(i => s"0xtx$i" -> s"seed$i"): _*),
      s"pinned pre-stream snapshot diverged: $pinned")
  }

  test("a maintenance cycle that loses the race skips LOUDLY; the stream stays correct") {
    // the skip itself is correct (the next trigger re-checks
    // fragmentation) but must never be silent: a compaction that
    // loses EVERY cycle would let fragmentation grow unbounded while
    // the stream reports healthy. onMaintenanceSkip is the signal.
    val root = Files.createTempDirectory("up-skip").toString
    val lake = new Lake(spark, root)
    val rival = new Lake(spark, root)
    // seed two files so the very first maintenance check trips
    lake.append(df((0 until 3).map(i =>
      change(i, s"seed$i", del = false))).drop("__del").coalesce(1),
      Schemas.Nfp)
    lake.append(df((3 until 6).map(i =>
      change(i, s"seed$i", del = false))).drop("__del").coalesce(1),
      Schemas.Nfp)
    // arm: in the FIRST maintenance rewrite's unlocked plan-to-stage
    // window, a rival commit retires a planned file — the rewrite
    // must lose the optimistic race and the cycle must skip loudly
    lake.preRewriteHook = () => {
      rival.upsert(df(Seq(change(0, "rival", del = false, bn = 1L)))
        .localCheckpoint(), Schemas.Nfp,
        Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
      lake.preRewriteHook = () => ()
    }
    val recorded =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Throwable)]
    val saved = Streaming.onMaintenanceSkip
    Streaming.onMaintenanceSkip =
      (t, n, e) => recorded.synchronized { recorded += ((t, n, e)) }
    try {
      val srcDir = Files.createTempDirectory("up-skip-src").toString
      writeTranches(srcDir, Seq(
        df(Seq(change(100, "b0", del = false))),
        df(Seq(change(101, "b1", del = false)))))
      val src = Streaming.fileStream(spark, srcDir, changeSchema,
        maxFilesPerTrigger = 1)
      val q = Streaming.upsertStream(src, lake, Schemas.Nfp,
        keys = Seq("chain_name", "transaction_hash"),
        orderCols = Seq("block_number", "log_index"),
        deleteCol = "__del",
        checkpointDir = Files.createTempDirectory("up-skip-ck").toString,
        maintainEvery = 1, maintainMaxChainFiles = 1).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    } finally Streaming.onMaintenanceSkip = saved
    // exactly the armed cycle skipped, surfaced with table + cause
    assert(recorded.nonEmpty, "lost maintenance cycle skipped SILENTLY")
    val (table, skips, cause) = recorded.head
    assert(table == Schemas.Nfp && skips == 1L)
    assert(Lake.isRetryableRace(cause, lake.root),
      s"surfaced cause is not the lost race: $cause")
    // batch 2's maintenance (hook disarmed) succeeded and reset the
    // consecutive-skip counter: no second skip recorded
    assert(recorded.size == 1, s"unexpected extra skips: $recorded")
    // the stream itself survived: all rows present, rival's merge kept
    val amounts = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(amounts("0xtx0") == "rival")
    assert(amounts("0xtx100") == "b0" && amounts("0xtx101") == "b1")
    assert(amounts.size == 8)
    assert(lake.fileInventory(Schemas.Nfp) ==
      lake.listInventory(Schemas.Nfp))
  }

  test("schema evolution between micro-batches: restarted stream resumes under the new schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val T = "docs_evo"
    val lake = new Lake(spark, Files.createTempDirectory("up-evo").toString)
    val sf = StructField(_: String, StringType, nullable = true)
    val v1 = StructType(Seq(sf("chain_name"), sf("doc_id"),
      StructField("n_tokens", IntegerType, nullable = true),
      StructField("seq", LongType, nullable = true)))
    lake.createTable(T, v1)
    val srcDir = Files.createTempDirectory("up-evo-src").toString
    val ck = Files.createTempDirectory("up-evo-ck").toString
    def v1df(rows: Seq[(String, String, Int, Long, Boolean)]) =
      rows.toDF("chain_name", "doc_id", "n_tokens", "seq", "__del")
    def v2df(rows: Seq[(String, String, Long, Long, String, Boolean)]) =
      rows.toDF("chain_name", "doc_id", "n_tokens", "seq", "lang", "__del")
    val t1 = v1df(Seq(("eth", "d1", 10, 1L, false),
      ("eth", "d2", 20, 1L, false)))
    val t2 = v1df(Seq(("eth", "d2", 21, 2L, false),
      ("eth", "d3", 30, 2L, false)))
    val t3 = v2df(Seq(("eth", "d1", 5000000000L, 3L, "en", false),
      ("eth", "d4", 40L, 3L, "de", false)))
    val t4 = v2df(Seq(("eth", "d3", 0L, 4L, null, true))) // tombstone d3
    def run(schema: StructType): Unit = {
      val src = Streaming.fileStream(spark, srcDir,
        StructType(schema.fields :+ StructField("__del", BooleanType,
          nullable = true)), maxFilesPerTrigger = 1)
      val q = Streaming.upsertStream(src, lake, T,
        keys = Seq("chain_name", "doc_id"), orderCols = Seq("seq"),
        deleteCol = "__del", checkpointDir = ck).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // run 1 drains the v1-generation batches
    writeTranches(srcDir, Seq(t1, t2))
    run(v1)
    // mid-stream evolution: widen n_tokens int→long, add lang; the
    // restarted stream reads NEW batches under the v2 source schema
    // from the SAME checkpoint — offset continuation, v1-era table
    // files read back widened + null-filled
    val v2 = StructType(Seq(sf("chain_name"), sf("doc_id"),
      StructField("n_tokens", LongType, nullable = true),
      StructField("seq", LongType, nullable = true), sf("lang")))
    lake.evolveSchema(T, v2)
    writeTranches(srcDir, Seq(t3, t4))
    run(v2)
    // batch replay of the same timeline on a fresh lake
    val replay = new Lake(spark,
      Files.createTempDirectory("up-evo-rep").toString)
    replay.createTable(T, v1)
    Seq(t1, t2).foreach(t => replay.upsert(t, T,
      Seq("chain_name", "doc_id"), deleteCol = Some("__del")))
    replay.evolveSchema(T, v2)
    Seq(t3, t4).foreach(t => replay.upsert(t, T,
      Seq("chain_name", "doc_id"), deleteCol = Some("__del")))
    def state(l: Lake) = l.read(T).select("doc_id", "n_tokens", "lang")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(state(lake) == state(replay),
      s"streamed-evolved state diverged from batch replay: ${state(lake)}")
    assert(state(lake) == Seq(("d1", 5000000000L, Some("en")),
      ("d2", 21L, None), ("d4", 40L, Some("de"))))
  }

  implicit class ToSortedMap(pairs: Array[(String, String)]) {
    def toSortedMap: scala.collection.immutable.SortedMap[String, String] =
      scala.collection.immutable.SortedMap(pairs: _*)
  }
}
