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

  test("a checkpoint resumed across a vacuum of needed history fails LOUDLY") {
    val root = Files.createTempDirectory("lake-cs3").toString
    val tmp = Files.createTempDirectory("lake-cs3-ck").toString
    val lake = new Lake(spark, root)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    // drain through the append only
    val (first, _) = drain(Streaming.changeStream(spark, root, Schemas.Nfp,
      startingVersion = Some(0L)), s"$tmp/ck")
    assert(first.size == 10)
    // a retained upsert commits delete+insert; then vacuum expires the
    // retired pre-upsert files BEFORE the stream consumed that commit
    lake.upsert(rows(0 until 10, amt = i => s"u$i").coalesce(1),
      Schemas.Nfp, Seq("chain_name", "transaction_hash"), retain = true)
    lake.vacuum(Schemas.Nfp, keepLast = 0, staleCommitMs = 0L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(Streaming.changeStream(spark, root, Schemas.Nfp,
        startingVersion = Some(0L)), s"$tmp/ck")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("invalidated") ||
      m.contains("vacuum-expired") || m.contains("missing file")),
      s"stream failed for the wrong reason: ${chain(e)}")
  }
}
