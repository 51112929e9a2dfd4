package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** The streaming change feed (`readStream.format("lake-changes")`):
  * micro-batches track commit versions, rewrite-only commits are
  * invisible, accumulated output equals the batch feed, resume works
  * from the checkpoint, and vacuumed history fails LOUDLY. */
class LakeChangeStreamSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum",
                   amt: Int => String = i => s"$i") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%05d", 1000L + i, 0L,
        "0xu1", amt(i), s"${i * 10}", s"${i * 100}", s"$i", i % 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def drain(df: org.apache.spark.sql.DataFrame, ck: String)
      : (Seq[org.apache.spark.sql.Row], Int) = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    var batches = 0
    val q = df.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = b.collect()
        buf.synchronized { buf ++= got; if (got.nonEmpty) batches += 1 }
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (buf.toSeq, batches)
  }

  private def key(rs: Seq[org.apache.spark.sql.Row]): Seq[String] = rs.map(
    r => s"${r.getAs[String]("_change_type")}|" +
      s"${r.getAs[String]("transaction_hash")}|${r.getAs[String]("amount")}")
    .sorted

  test("AvailableNow drains the commit history one version per batch, equals the batch feed, skips rewrites") {
    val root = Files.createTempDirectory("lake-cs").toString
    val tmp = Files.createTempDirectory("lake-cs-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    lake.append(rows(10 until 20).coalesce(1), Schemas.Nfp)
    // the second chain keeps the later commits delta-sized, so the
    // whole history stays retained for the replay-from-0 check
    lake.append(rows(50 until 60, chain = "base").coalesce(1), Schemas.Nfp)
    lake.append(rows(60 until 70, chain = "base").coalesce(1), Schemas.Nfp)
    // rewrite-only commit: must contribute NO batch rows
    assert(lake.compact(Schemas.Nfp, targetBytes = 1L << 26,
      retain = true, onlyChains = Seq("ethereum")) > 0)
    lake.upsert(rows(0 until 5, amt = i => s"u$i").coalesce(1),
      Schemas.Nfp, Seq("chain_name", "transaction_hash"), retain = true)
    val cN = lake.latestCommitVersion(Schemas.Nfp).get
    val stream = Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L), maxVersionsPerBatch = Some(1L))
    val (got, batches) = drain(stream, s"$tmp/ck1")
    // ≥3 data commits streamed, each its own micro-batch (the
    // compaction's version advances the offset but carries no rows)
    assert(batches >= 3, s"expected >=3 data micro-batches, got $batches")
    val want = lake.changesBetweenCommits(Schemas.Nfp, 0L, cN).collect()
    assert(key(got) == key(want.toSeq),
      "accumulated stream output diverged from the batch change feed")
    // commit versions tagged and ascending with change type per commit
    val versions = got.map(_.getAs[Long]("_commit_version")).distinct.sorted
    assert(versions.size >= 3 && versions.last == cN)

    // a restart from the same checkpoint with NEW commits picks up
    // exactly the new ones
    lake.append(rows(100 until 105).coalesce(1), Schemas.Nfp)
    val (more, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck1")
    assert(more.size == 5 &&
      more.forall(_.getAs[String]("_change_type") == "insert"),
      s"resume streamed ${more.size} row(s), expected the 5 new inserts")
  }

  test("default start position streams only commits after stream start") {
    val root = Files.createTempDirectory("lake-cs2").toString
    val tmp = Files.createTempDirectory("lake-cs2-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val (got, _) = drain(
      Streaming.changeStream(spark, root, Schemas.Nfp), s"$tmp/ck")
    assert(got.isEmpty, "default start replayed pre-stream history")
    lake.append(rows(10 until 15).coalesce(1), Schemas.Nfp)
    val (next, _) = drain(
      Streaming.changeStream(spark, root, Schemas.Nfp), s"$tmp/ck")
    assert(next.size == 5)
  }

  test("startingTimestamp resolves against the commit log's #ts headers") {
    val root = Files.createTempDirectory("lake-cs4").toString
    val tmp = Files.createTempDirectory("lake-cs4-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    // a wall-clock strictly between the two commits
    Thread.sleep(2L)
    val tMid = System.currentTimeMillis()
    Thread.sleep(2L)
    lake.append(rows(10 until 15).coalesce(1), Schemas.Nfp)
    val (got, _) = drain(spark.readStream.format("lake-changes")
      .option("root", root).option("table", Schemas.Nfp)
      .option("startingTimestamp", tMid.toString).load(), s"$tmp/ck")
    assert(got.size == 5 && got.forall(r =>
      r.getAs[String]("transaction_hash") >= "0xtx00010"),
      s"timestamp start carried the pre-instant state: ${key(got)}")
    // both start options together refuse loudly
    val e = intercept[Exception] {
      drain(spark.readStream.format("lake-changes")
        .option("root", root).option("table", Schemas.Nfp)
        .option("startingVersion", "0")
        .option("startingTimestamp", tMid.toString).load(), s"$tmp/ck2")
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("not both")), msgs(e).mkString("; "))
  }

  test("maxBytesPerBatch paces a lagging catch-up into budget-sized micro-batches") {
    val root = Files.createTempDirectory("lake-cs7").toString
    val tmp = Files.createTempDirectory("lake-cs7-ck").toString
    val lake = new Lake(spark, root)
    // four ~equal-size single-file commits
    (0 until 4).foreach(j =>
      lake.append(rows(j * 50 until (j + 1) * 50).coalesce(1), Schemas.Nfp))
    // v1 is the table's first publish — a CHECKPOINT, so it has no
    // cheap byte estimate and must end the batch it starts; v2–v4 are
    // deltas with exact added-bytes
    assert(lake.commitAddedBytes(Schemas.Nfp, 1L).isEmpty)
    val perCommit = (2L to 4L)
      .map(v => lake.commitAddedBytes(Schemas.Nfp, v).get)
    // budget = 2× the largest delta commit: the checkpoint drains
    // alone, then two near-equal deltas per batch — 3 batches total
    val budget = perCommit.max * 2
    val (got, batches) = drain(spark.readStream.format("lake-changes")
      .option("root", root).option("table", Schemas.Nfp)
      .option("startingVersion", "0")
      .option("maxBytesPerBatch", budget.toString).load(), s"$tmp/ck")
    assert(got.size == 200, s"drained ${got.size} rows")
    assert(batches == 3, s"expected 3 byte-paced batches " +
      "(checkpoint alone, two deltas, one delta), got " + batches)
    // a budget below one commit still advances (one commit per batch)
    val (got2, batches2) = drain(spark.readStream.format("lake-changes")
      .option("root", root).option("table", Schemas.Nfp)
      .option("startingVersion", "0")
      .option("maxBytesPerBatch", "1").load(), s"$tmp/ck2")
    assert(got2.size == 200 && batches2 == 4,
      s"starvation guard failed: $batches2 batches, ${got2.size} rows")
  }

  test("startingTimestamp predating a COMPLETE history replays from the beginning") {
    val root = Files.createTempDirectory("lake-cs6").toString
    val tmp = Files.createTempDirectory("lake-cs6-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 8).coalesce(1), Schemas.Nfp)
    lake.append(rows(8 until 12).coalesce(1), Schemas.Nfp)
    // an instant from before the table existed: nothing precedes it,
    // so replaying the whole retained history honors at-or-after
    val (got, _) = drain(spark.readStream.format("lake-changes")
      .option("root", root).option("table", Schemas.Nfp)
      .option("startingTimestamp", "1000").load(), s"$tmp/ck")
    assert(got.size == 12 &&
      got.forall(_.getAs[String]("_change_type") == "insert"),
      s"pre-history instant did not replay the full history: ${got.size}")
  }

  test("keys= ENRICHED stream emits row-grain pre/postimages; checkpoint resume picks up later rewrites exactly") {
    val root = Files.createTempDirectory("lake-cs9").toString
    val tmp = Files.createTempDirectory("lake-cs9-ck").toString
    val lake = new Lake(spark, root)
    val ks = Seq("chain_name", "transaction_hash")
    // interleaved appends: both files span the key range, so the
    // upsert rewrite drags unchanged rows through the file-grain feed
    lake.append(rows(0 until 20 by 2).coalesce(1), Schemas.Nfp)
    lake.append(rows(1 until 20 by 2).coalesce(1), Schemas.Nfp)
    val v0 = lake.latestCommitVersion(Schemas.Nfp).get
    // rewrite commit: update 2 keys, tombstone 1, insert 1 fresh
    lake.upsert(
      rows(Seq(0, 10), amt = i => s"u$i").withColumn("_del", lit(false))
        .unionByName(rows(Seq(5)).withColumn("_del", lit(true)))
        .unionByName(rows(Seq(100)).withColumn("_del", lit(false))),
      Schemas.Nfp, ks, deleteCol = Some("_del"), retain = true)
    val v1 = lake.latestCommitVersion(Schemas.Nfp).get
    def stream() = Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(v0), keys = Some(ks))
    val (got1, _) = drain(stream(), s"$tmp/ck")
    val want1 = lake.changesBetweenCommitsEnriched(
      Schemas.Nfp, v0, v1, ks).collect()
    assert(key(got1) == key(want1.toSeq),
      "streamed enriched feed diverged from the batch enrichment")
    // unchanged rewritten rows emit NOTHING: exactly 2 update pairs +
    // 1 delete + 1 insert — never the touched files' full churn
    assert(got1.size == 6, s"expected 6 enriched rows, got ${got1.size}: " +
      key(got1).mkString(", "))
    assert(got1.count(_.getAs[String]("_change_type")
      == "update_preimage") == 2)
    // SECOND rewrite commit after the checkpointed drain: the resumed
    // stream must enrich exactly the new commit
    lake.upsert(
      rows(Seq(3), amt = _ => "u3b").withColumn("_del", lit(false)),
      Schemas.Nfp, ks, deleteCol = Some("_del"), retain = true)
    val v2 = lake.latestCommitVersion(Schemas.Nfp).get
    val (got2, _) = drain(stream(), s"$tmp/ck")
    val want2 = lake.changesBetweenCommitsEnriched(
      Schemas.Nfp, v1, v2, ks).collect()
    assert(key(got2) == key(want2.toSeq) && got2.size == 2,
      s"resume mid-history enriched wrong rows: ${key(got2)}")
    // acknowledged staging is GC'd (commit() reaps by range name)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val stageDir = new org.apache.hadoop.fs.Path(s"$tmp/ck/__enriched")
    val leftover =
      if (!fs.exists(stageDir)) Array.empty[String]
      else fs.listStatus(stageDir).map(_.getPath.getName)
        .filter { n =>
          n.stripPrefix("b").split('-').lastOption
            .flatMap(_.toLongOption).exists(_ < v2)
        }
    assert(leftover.isEmpty,
      s"acknowledged enriched staging not GC'd: ${leftover.mkString(", ")}")
  }

  test("the feed's grain (keys=) is pinned to the checkpoint: resuming without keys, or with different keys, refuses loudly") {
    val root = Files.createTempDirectory("lake-cs10").toString
    val tmp = Files.createTempDirectory("lake-cs10-ck").toString
    val lake = new Lake(spark, root)
    val ks = Seq("chain_name", "transaction_hash")
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val v0 = lake.latestCommitVersion(Schemas.Nfp).get
    lake.upsert(rows(Seq(0), amt = _ => "u0").coalesce(1),
      Schemas.Nfp, ks, retain = true)
    // enriched drain writes the __graft_keys marker
    val (got1, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(v0), keys = Some(ks)), s"$tmp/ck")
    assert(got1.nonEmpty)
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    // resume WITHOUT keys: file-grain rows would silently change what
    // the feed's rows mean mid-stream — must refuse naming both grains
    lake.append(rows(20 until 25).coalesce(1), Schemas.Nfp)
    val e1 = intercept[Exception] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(v0)), s"$tmp/ck")
    }
    assert(msgs(e1).exists(m => m.contains("grain") &&
      m.contains("keys='-'")), msgs(e1).mkString("; "))
    // resume with DIFFERENT keys: same refusal
    val e2 = intercept[Exception] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(v0),
        keys = Some(Seq("transaction_hash"))), s"$tmp/ck")
    }
    assert(msgs(e2).exists(_.contains("grain")), msgs(e2).mkString("; "))
    // resume with the SAME keys: fine, drains the new commit
    val (got2, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(v0), keys = Some(ks)), s"$tmp/ck")
    assert(got2.size == 5, s"same-keys resume got ${got2.size} rows")
    // and a FILE-GRAIN checkpoint pins its grain too (keys added later
    // refuses) — plus its commit() reaps enriched staging
    // unconditionally (no keysOpt gate), proven by the marker file
    // alone surviving under __enriched's parent
    val (g3, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(v0)), s"$tmp/ck2")
    assert(g3.nonEmpty)
    lake.append(rows(30 until 32).coalesce(1), Schemas.Nfp)
    val e3 = intercept[Exception] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(v0), keys = Some(ks)), s"$tmp/ck2")
    }
    assert(msgs(e3).exists(_.contains("grain")), msgs(e3).mkString("; "))
  }

  test("concurrent restarts of ONE enriched checkpoint racing the same staged range are benign: one writer, everyone reads the same rows") {
    val root = Files.createTempDirectory("lake-cs11").toString
    val ck = Files.createTempDirectory("lake-cs11-ck").toString
    val lake = new Lake(spark, root)
    val ks = Seq("chain_name", "transaction_hash")
    lake.append(rows(0 until 30).coalesce(1), Schemas.Nfp)
    val v0 = lake.latestCommitVersion(Schemas.Nfp).get
    lake.upsert(rows(Seq(1, 2), amt = i => s"u$i").coalesce(1),
      Schemas.Nfp, ks, retain = true)
    val v1 = lake.latestCommitVersion(Schemas.Nfp).get
    val inc = lake.currentIncarnation(Schemas.Nfp).get
    // eight rival "drivers" (instances sharing the checkpoint) plan
    // the SAME range at once — the per-range staging lock must admit
    // ONE writer; everyone else reuses the completed stage
    val streams = (0 until 8).map(_ => new LakeChangeStream(spark, root,
      Schemas.Nfp, LakeChangesProvider.changeSchema(
        lake.effectiveSchema(Schemas.Nfp)),
      startingVersion = Some(v0), maxVersionsPerBatch = None,
      keysOpt = Some(ks), checkpointLocation = ck))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val plans = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(streams.map(st =>
          scala.concurrent.Future(st.planInputPartitions(
            LakeCommitOffset(v0, inc), LakeCommitOffset(v1, inc))))),
        scala.concurrent.duration.Duration.Inf)
      assert(plans.forall(_.nonEmpty))
      assert(plans.map(_.length).distinct.size == 1,
        "rival planners saw different staged file sets")
    } finally pool.shutdown()
    // the staged range is complete and content-exact vs the batch feed
    val fs = new org.apache.hadoop.fs.Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$ck/__enriched/b$v0-$v1")
    assert(fs.exists(new org.apache.hadoop.fs.Path(stage, "_graft_staged")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$ck/__enriched/.b$v0-$v1.lock")), "winner must release the lock")
    val got = spark.read.parquet(stage.toString)
    val want = lake.changesBetweenCommitsEnriched(Schemas.Nfp, v0, v1, ks)
    assert(key(got.collect().toSeq) == key(want.collect().toSeq),
      "racing staging tore the range's content")
    // a CRASHED holder's stale lock breaks by age instead of wedging
    // every future restart
    val stale = new org.apache.hadoop.fs.Path(
      s"$ck/__enriched/.b0-$v0.lock")
    fs.create(stale, false).close()
    fs.setTimes(stale, System.currentTimeMillis() - 3600000L, -1)
    val late = new LakeChangeStream(spark, root, Schemas.Nfp,
      LakeChangesProvider.changeSchema(lake.effectiveSchema(Schemas.Nfp)),
      startingVersion = Some(0L), maxVersionsPerBatch = None,
      keysOpt = Some(ks), checkpointLocation = ck)
    assert(late.planInputPartitions(LakeCommitOffset(0L, inc),
      LakeCommitOffset(v0, inc)).nonEmpty,
      "a stale staging lock wedged the restart")
  }

  test("startingTimestamp on a legacy log WITHOUT #ts headers refuses loudly (never a silent full replay)") {
    val root = Files.createTempDirectory("lake-cs8").toString
    val tmp = Files.createTempDirectory("lake-cs8-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 6).coalesce(1), Schemas.Nfp)
    lake.append(rows(6 until 9).coalesce(1), Schemas.Nfp)
    // strip every #ts header: a commit log written before timestamps
    // existed. Regression: predatesAll once used .forall on the
    // collectFirst — VACUOUSLY true with no timestamps anywhere, so
    // ANY startingTimestamp (a future one included) silently replayed
    // the entire history from version 0.
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val d = new org.apache.hadoop.fs.Path(s"$root/_manifest/${Schemas.Nfp}")
    fs.listStatus(d).filter(_.isFile).foreach { st =>
      val in = fs.open(st.getPath)
      val body = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      val stripped = body.split('\n')
        .filterNot(_.startsWith("#ts=")).mkString("\n")
      if (stripped != body) {
        val out = fs.create(st.getPath, true)
        try out.write(stripped.getBytes("UTF-8")) finally out.close()
      }
    }
    val farFuture = System.currentTimeMillis() + 1000L * 86400 * 365
    val e = intercept[Exception] {
      drain(spark.readStream.format("lake-changes")
        .option("root", root).option("table", Schemas.Nfp)
        .option("startingTimestamp", farFuture.toString).load(),
        s"$tmp/ck")
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("no commit timestamps")),
      msgs(e).mkString("; "))
  }

  test("a checkpoint resumed across dropTable+recreate fails LOUDLY (incarnation mismatch)") {
    val root = Files.createTempDirectory("lake-cs5").toString
    val tmp = Files.createTempDirectory("lake-cs5-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val (first, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck")
    assert(first.size == 10)
    // drop + recreate: the new incarnation's commit log restarts at
    // v1 - the checkpointed version numbers mean nothing here, and a
    // bare-version offset would stall or silently mix histories
    lake.dropTable(Schemas.Nfp)
    // a trigger firing INSIDE the drop gap must neither crash nor
    // launder the incarnation out of the checkpoint (re-stamping the
    // offset with the empty current incarnation would let the
    // recreate below pass the guard and silently mix histories)
    val (gap, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck")
    assert(gap.isEmpty, "the drop-gap trigger produced rows")
    lake.append(rows(100 until 120).coalesce(1), Schemas.Nfp)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(0L)), s"$tmp/ck")
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(m => m.contains("incarnation") &&
      m.contains("dropped and recreated")),
      s"resume across recreate failed for the wrong reason: ${msgs(e)}")
  }

  test("vacuum cannot starve an IN-WINDOW consumer; lag beyond retention refuses at the boundary") {
    val root = Files.createTempDirectory("lake-cs3").toString
    val tmp = Files.createTempDirectory("lake-cs3-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    // drain through the append only
    val (first, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck")
    assert(first.size == 10)
    // a retained upsert commits delete+insert; an AGGRESSIVE vacuum
    // (no snapshots kept) runs BEFORE the stream consumed that
    // commit. The retired pre-upsert files are pinned by the RETAINED
    // COMMIT LOG (the replayable window), so the lagging-but-in-window
    // consumer must drain the full delete+insert pair — the r15
    // behavior (vacuum breaking an in-floor consumer) was the gap the
    // retention floor left open.
    lake.upsert(rows(0 until 10, amt = i => s"u$i").coalesce(1),
      Schemas.Nfp, Seq("chain_name", "transaction_hash"), retain = true)
    lake.vacuum(Schemas.Nfp, keepLast = 0, staleCommitMs = 0L)
    val (resumed, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck")
    assert(resumed.size == 20 &&
      resumed.count(_.getAs[String]("_change_type") == "delete") == 10,
      s"in-window consumer starved by vacuum: ${resumed.size} rows")

    // beyond the window: shrink the floor, stack enough commits for
    // TWO retention cuts (the cut keeps two checkpoint generations),
    // vacuum, and a from-the-beginning consumer must refuse LOUDLY at
    // the version-range boundary BEFORE touching any file
    lake.setTableProperties(Schemas.Nfp,
      Map("manifest.minRetainedCommits" -> "4"))
    (0 until 40).foreach(j =>
      lake.append(rows(1000 + j * 5 until 1000 + j * 5 + 5)
        .coalesce(1), Schemas.Nfp))
    lake.vacuum(Schemas.Nfp, keepLast = 0, staleCommitMs = 0L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(0L)), s"$tmp/ck-late")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("expired by manifest retention")),
      s"beyond-window consumer failed for the wrong reason: ${chain(e)}")
  }
}
