package graft.streaming

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.ManifestPartitioningIndex
import graft.v3.Lake

/** The lake's STREAMING change feed — `readStream.format("lake-changes")`
  * over a lake table's commit log: one micro-batch per manifest
  * commit range, each row a change the committing version made
  * (`_change_type` = 'insert'/'delete', `_commit_version` = the
  * commit), the Delta-style CDF stream that lets a downstream
  * incremental consumer chain onto a lake table instead of
  * batch-polling [[graft.v3.Lake.tableChanges]].
  *
  * Offsets ARE manifest commit versions — the commit log already
  * totally orders the table's history, so the stream needs no side
  * state: `latestOffset` is one commit-log listing, and a micro-batch
  * `(start, end]` plans from [[graft.v3.Lake.changePlanBetween]] (the
  * commit-grain feed: rewrite-only compaction/clustering commits
  * contribute nothing, retained files resolve from the retention
  * area). Planning is manifest-served — zero directory listings —
  * and each batch scans exactly the changed files through Spark's own
  * DSv2 parquet machinery over a [[ManifestPartitioningIndex]].
  *
  * INVALIDATION IS LOUD: a checkpoint resumed after manifest
  * retention expired its next commit, or after [[graft.v3.Lake.vacuum]]
  * deleted a retired file the feed still needs, fails the stream with
  * the reason — a change feed that silently skips history corrupts
  * every consumer joining deletes by key (LakeChangeStreamSpec pins
  * both refusals).
  *
  * Options: `root` + `table` (required), `startingVersion` (first
  * batch starts AFTER this commit; default = the latest version at
  * stream start, i.e. only new changes — pass 0 to replay the whole
  * retained history), `startingTimestamp` (epoch millis or ISO-8601
  * instant, resolved to the version current AT that wall-clock via
  * the commit log's `#ts` headers — mutually exclusive with
  * `startingVersion`; an instant predating the table's COMPLETE
  * retained history replays from the beginning, one predating
  * EXPIRED history refuses loudly rather than silently skipping the
  * expired changes), `maxVersionsPerBatch` (admission control: at
  * most this many commits per micro-batch; default unbounded),
  * `maxBytesPerBatch` (admission by the commits' ADDED bytes — the
  * published formats' maxBytesPerTrigger: a consumer resuming after
  * lag drains in budget-sized micro-batches instead of one giant
  * catch-up batch; at least one commit always admits, and the
  * every-16th checkpoint commit ends the batch it starts),
  * `keys` (comma list, the table's upsert keys) — ENRICHED mode:
  * each micro-batch emits ROW-GRAIN changes (Delta CDF's
  * `update_preimage`/`update_postimage` for rewritten rows that
  * actually changed, unchanged rewritten rows emit nothing) via the
  * same per-rewrite-commit keyed join the 4-arg `table_changes` TVF
  * serves in batch ([[graft.v3.Lake.changesBetweenCommitsEnriched]]);
  * the join's churn-sized output stages under the stream's checkpoint
  * and is GC'd as the engine acknowledges batches.
  * `Trigger.AvailableNow` is supported natively (the stream pins the
  * target version at start and drains up to it, honoring the
  * admission caps per batch). */
class LakeChangesProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "lake-changes"

  private def lakeOf(options: CaseInsensitiveStringMap): (String, String) = {
    val root = Option(options.get("root")).getOrElse(throw
      new IllegalArgumentException("lake-changes needs option 'root'"))
    val table = Option(options.get("table")).getOrElse(throw
      new IllegalArgumentException("lake-changes needs option 'table'"))
    (root, table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (root, table) = lakeOf(options)
    LakeChangesProvider.changeSchema(
      new Lake(SparkSession.active, root).effectiveSchema(table))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (root, table) = lakeOf(opts)
    new LakeChangesTable(root, table, schema)
  }
}

object LakeChangesProvider {
  /** The feed's schema: the table's columns (declared order) plus the
    * two change-metadata columns. */
  def changeSchema(tableSchema: StructType): StructType =
    tableSchema.add("_change_type", StringType)
      .add("_commit_version", LongType)
}

private[graft] class LakeChangesTable(root: String, lakeTable: String,
    schema0: StructType) extends Table with SupportsRead {

  override def name(): String = s"lake-changes($root/$lakeTable)"

  override def schema(): StructType = schema0

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.MICRO_BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = schema0
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new LakeChangeStream(SparkSession.active, root, lakeTable,
          schema0,
          Option(options.get("startingVersion")).map(_.toLong),
          Option(options.get("maxVersionsPerBatch")).map(_.toLong),
          Option(options.get("startingTimestamp")),
          Option(options.get("maxBytesPerBatch")).map(_.toLong),
          Option(options.get("keys")).map(_.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq),
          checkpointLocation)
      override def description(): String =
        s"LakeChangesScan($lakeTable)"
    }
  }
}

/** One committed-version offset in the table's commit log, stamped
  * with the manifest INCARNATION that minted it: a checkpoint resumed
  * across dropTable+recreate must refuse loudly (the new incarnation's
  * commit log restarts at v1 — a bare version would silently stall or
  * mix two tables' histories). Pre-r15 checkpoints (bare numbers)
  * deserialize with an empty incarnation and skip the check. */
private[graft] case class LakeCommitOffset(version: Long,
                                           inc: String = "") extends Offset {
  override def json(): String =
    if (inc.isEmpty) version.toString else s"$inc:$version"
}

private[graft] object LakeCommitOffset {
  def parse(json: String): LakeCommitOffset = {
    val cut = json.lastIndexOf(':')
    if (cut < 0) LakeCommitOffset(json.toLong)
    else LakeCommitOffset(json.substring(cut + 1).toLong,
      json.substring(0, cut))
  }
}

private[graft] class LakeChangeStream(
    spark: SparkSession,
    root: String,
    lakeTable: String,
    outSchema: StructType,
    startingVersion: Option[Long],
    maxVersionsPerBatch: Option[Long],
    startingTimestamp: Option[String] = None,
    maxBytesPerBatch: Option[Long] = None,
    keysOpt: Option[Seq[String]] = None,
    checkpointLocation: String = "")
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  maxVersionsPerBatch.foreach(m => require(m > 0,
    s"maxVersionsPerBatch must be positive (got $m)"))
  maxBytesPerBatch.foreach(m => require(m > 0,
    s"maxBytesPerBatch must be positive (got $m)"))
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "lake-changes takes startingVersion OR startingTimestamp, not both")
  keysOpt.foreach(ks => require(ks.nonEmpty,
    "lake-changes option 'keys' must name at least one key column"))

  private val lake = new Lake(spark, root)
  LakeChangeStream.registerSeam(root, lakeTable, lake.listCalls)

  /** `startingTimestamp` resolved against the commit log's `#ts`
    * headers: the stream carries every change committed strictly
    * AFTER the instant (the state current AT it is the consumer's
    * initial snapshot — [[graft.v3.Lake.versionAtTimestamp]], the
    * same resolution `TIMESTAMP AS OF` uses, loud on expired
    * pre-history). Accepts epoch millis or an ISO-8601 instant.
    * Resolution is DEFERRED to [[initialOffset]] — Spark calls that
    * only when no checkpointed offset exists, so a long-running
    * stream restarted after retention expired the pre-timestamp
    * history resumes from its checkpoint instead of crashing on a
    * start instant it no longer needs. */
  private def resolveStart(): Option[Long] =
    startingVersion.orElse(startingTimestamp.map { ts =>
      val millis =
        (if (ts.nonEmpty && ts.forall(_.isDigit)) ts.toLongOption
          else None)
        .orElse(
          try Some(java.time.Instant.parse(ts).toEpochMilli)
          catch { case _: java.time.format.DateTimeParseException => None })
        .orElse(
          try Some(java.sql.Timestamp.valueOf(ts).getTime)
          catch { case _: IllegalArgumentException => None })
        .getOrElse(throw new IllegalArgumentException(
          s"startingTimestamp '$ts' is not epoch millis, an ISO-8601 " +
            "instant, or 'yyyy-mm-dd hh:mm:ss'"))
      // an instant that predates the table's whole history means
      // "everything": when the history is COMPLETE (v1 still
      // retained, or no commits yet) replay from version 0 - the
      // at-or-after contract is honored because nothing precedes the
      // instant. When v1 has been EXPIRED by retention, keep the loud
      // versionAtTimestamp refusal: starting from the earliest
      // retained version (what some published sources do) silently
      // skips the expired changes, which corrupts any consumer
      // joining deletes by key - an intentional divergence.
      val vs = lake.commitVersions(lakeTable)
      val fullHistory = vs.isEmpty || vs.headOption.exists(_._1 == 1L)
      // `exists`, NOT `forall`: on a legacy table whose retained
      // commits carry no #ts header at all, collectFirst is None and
      // a forall would be vacuously true — silently replaying the
      // whole history for ANY startingTimestamp (a future one
      // included). With exists the no-timestamp case falls through
      // to versionAtTimestamp's loud "no commit timestamps" refusal;
      // an empty table (no commits yet) still replays from 0.
      val predatesAll = vs.isEmpty ||
        vs.collectFirst { case (_, Some(t)) => t }.exists(millis < _)
      if (fullHistory && predatesAll) 0L
      else lake.versionAtTimestamp(lakeTable, millis)
    })
  private val tableDir = new Path(s"$root/$lakeTable")
  private val tableSchema = StructType(outSchema.fields.dropRight(2))
  private val partCols =
    Seq("chain_name").filter(tableSchema.fieldNames.contains)
  private val partSchema =
    StructType(tableSchema.fields.filter(f => partCols.contains(f.name)))
  private val dataSchema =
    StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))

  private def incAndLatest: (String, Long) =
    lake.incarnationAndLatest(lakeTable).getOrElse(("", 0L))

  /** Refuse an offset minted by a DIFFERENT manifest incarnation —
    * the table was dropped and recreated since the checkpoint, and
    * the new commit log's version numbers have no relation to the
    * old ones. Pre-incarnation offsets (empty inc) pass. */
  private def requireSameIncarnation(o: LakeCommitOffset,
                                     cur: String): Unit =
    require(o.inc.isEmpty || cur.isEmpty || o.inc == cur,
      s"lake-changes checkpoint of $lakeTable was written by manifest " +
        s"incarnation ${o.inc}, but the table has been dropped and " +
        s"recreated (current incarnation $cur) - the checkpointed " +
        "version numbers no longer refer to this table's history; " +
        "restart the stream from a fresh checkpoint")

  /** AvailableNow pins its drain target when the query starts. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(incAndLatest._2)

  override def initialOffset(): Offset = {
    val (inc, latest) = incAndLatest
    LakeCommitOffset(resolveStart().getOrElse(latest), inc)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control form")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LakeCommitOffset]
    val (inc, latest) = incAndLatest
    requireSameIncarnation(s, inc)
    // while the table is DROPPED (no manifest -> empty current inc)
    // the start offset's incarnation must survive the trigger: a
    // re-stamp with "" would launder the guard out of the checkpoint,
    // and a later recreate would silently continue the old history
    val outInc = if (inc.nonEmpty) inc else s.inc
    val upper = availableNowTarget.fold(latest)(t => math.min(t, latest))
    val vCapped = maxVersionsPerBatch.fold(upper)(
      m => math.min(upper, s.version + m))
    // bytes-based admission (the published formats' maxBytesPerTrigger):
    // advance while the commits' ADDED bytes fit the budget — always at
    // least one commit so the stream can never stall, and a checkpoint
    // commit (no cheap byte estimate) ends the batch it starts
    val capped = maxBytesPerBatch match {
      case None => vCapped
      case Some(budget) =>
        var v = s.version
        var bytes = 0L
        var stop = false
        while (!stop && v < vCapped) {
          lake.commitAddedBytes(lakeTable, v + 1) match {
            case Some(b) if v == s.version || bytes + b <= budget =>
              bytes += b; v += 1
            case None if v == s.version => v += 1; stop = true
            case _ => stop = true
          }
        }
        v
    }
    LakeCommitOffset(math.max(s.version, capped), outInc)
  }

  override def reportLatestOffset(): Offset = {
    val (inc, latest) = incAndLatest
    LakeCommitOffset(latest, inc)
  }

  override def deserializeOffset(json: String): Offset =
    LakeCommitOffset.parse(json)

  /** Enriched-mode staging GC: once the engine acknowledges a batch,
    * every staged range ending at or before it is dead. Ranges parse
    * from the DIRECTORY NAMES (`b<from>-<to>`), not instance state, so
    * a restarted stream reaps its predecessor's acknowledged staging
    * too — and the reap runs REGARDLESS of this restart's own mode
    * (an enriched checkpoint resumed without `keys=` must not leave
    * its predecessor's ranges unreaped forever; the grain-change
    * itself refuses loudly in [[planInputPartitions]] via the pinned
    * keys marker, this just keeps the sweep unconditional); deletion
    * is best-effort (an orphan costs disk until the next commit,
    * never correctness — replay overwrites in place). */
  override def commit(end: Offset): Unit = {
    if (checkpointLocation.isEmpty) return
    val v = end.asInstanceOf[LakeCommitOffset].version
    Seq("__enriched", "__changes").foreach { area =>
      val dir = new Path(s"$checkpointLocation/$area")
      try {
        if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
          val to = st.getPath.getName.stripPrefix("b").split('-')
            .lastOption.flatMap(_.toLongOption)
          if (to.exists(_ <= v))
            try fs.delete(st.getPath, true)
            catch { case _: java.io.IOException => () }
        }
      } catch { case _: java.io.IOException => () }
    }
  }

  override def stop(): Unit = ()

  /** The STAGING filesystem — resolved from the checkpoint location,
    * NOT the lake root: the two commonly live on different stores
    * (s3a lake, hdfs/file checkpoints), and a root-resolved handle
    * would throw Wrong-FS on the first enriched batch. */
  private lazy val fs =
    new Path(if (checkpointLocation.nonEmpty) checkpointLocation else root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The feed's GRAIN (file-grain vs `keys=` row-grain enriched, and
    * WHICH keys) is pinned to the checkpoint: the offsets alone don't
    * record it, so a stream resumed with a different `keys=` option
    * would silently change what a batch's rows MEAN mid-stream (a
    * consumer keyed on update_pre/postimage pairs suddenly fed raw
    * file-grain delete+insert, or pairs joined on different keys).
    * First plan writes the marker (`__graft_keys`: the sorted key list,
    * or "-" for file-grain); every later plan — this run's or a
    * restart's — refuses loudly on mismatch. Pre-r18 checkpoints have
    * no marker and adopt this run's mode (documented migration). */
  private lazy val keysGuard: Unit = {
    if (checkpointLocation.nonEmpty) {
      val marker = new Path(s"$checkpointLocation/__graft_keys")
      val current = keysOpt.map(_.mkString(",")).getOrElse("-")
      def stored(): Option[String] =
        try {
          val in = fs.open(marker)
          try Some(new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => None }
      def refuse(s: String): Unit = require(s == current,
        s"lake-changes checkpoint of $lakeTable was written with " +
          s"keys='$s' but this restart passed keys='$current' - the " +
          "feed's grain cannot change mid-stream (downstream state " +
          "is keyed on it); restart from a fresh checkpoint")
      stored() match {
        case Some(s) => refuse(s)
        case None =>
          // first plan mints the marker. UNIQUELY-NAMED tmp + tolerant
          // rename: rival drivers of the same checkpoint may mint
          // concurrently (same content for a legitimate same-keys
          // race), and the local FS's checksum shadow files make even
          // a same-name create/delete race throw — whoever loses just
          // verifies the surviving marker below
          val tmp = new Path(s"$checkpointLocation/" +
            s".__graft_keys-${java.util.UUID.randomUUID()}")
          try {
            val out = fs.create(tmp, true)
            try out.write(current.getBytes("UTF-8")) finally out.close()
            if (!fs.rename(tmp, marker)) fs.delete(tmp, false)
          } catch {
            case _: java.io.IOException =>
              try fs.delete(tmp, false)
              catch { case _: java.io.IOException => () }
          }
          stored().foreach(refuse)
      }
    }
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    keysGuard
    val so = start.asInstanceOf[LakeCommitOffset]
    requireSameIncarnation(so, incAndLatest._1)
    val from = so.version
    val to = end.asInstanceOf[LakeCommitOffset].version
    keysOpt match {
      case Some(keys) => planEnriched(so, from, to, keys)
      case None =>
        // the offset's incarnation rides INTO the plan (checked against
        // the same listing the plan reads from): the pre-check above
        // races a dropTable+recreate landing between it and the plan's
        // listing, which would silently emit the NEW table's commits
        // as a continuation of the old feed
        val plan = lake.changePlanBetween(lakeTable, from, to,
          Option(so.inc).filter(_.nonEmpty))
        if (plan.forall { case (_, _, fs0) => lake.changeFilesPlain(fs0) })
          // DV-free range (the overwhelming common case): zero-copy —
          // each commit side plans straight over its manifest entries
          plan.flatMap {
            case (v, kind, entries) =>
              val index = new ManifestPartitioningIndex(spark, tableDir,
                entries.map(f => (f.path, f.bytes)), partSchema)
              ParquetScanBuilder(spark, index, tableSchema, dataSchema,
                  CaseInsensitiveStringMap.empty()).build().toBatch
                .planInputPartitions()
                .map(p => TaggedChangePartition(p, kind, v))
          }.toArray
        else
          // a commit in the range touches deletion vectors (vector'd
          // removes, dv-grown position diffs): the row set is no
          // longer a plain union of whole files, so the batch
          // materializes the DV-aware change feed once under the
          // checkpoint (same idempotent staging discipline as the
          // enriched mode; churn-sized, GC'd on engine commit)
          stagePlan("__changes",
            lake.changesBetweenCommits(lakeTable, from, to,
              Option(so.inc).filter(_.nonEmpty)), from, to)
            .map(p => StagedChangePartition(p): InputPartition)
    }
  }

  /** Materialize `df` under `<checkpoint>/<area>/b<from>-<to>` (once —
    * the `_graft_staged` sentinel makes a re-planned batch reuse it)
    * and plan the staged parquet. Shared by the enriched mode and the
    * DV-batch fallback.
    *
    * CONCURRENT RESTARTS of the same stream (two drivers racing on
    * one checkpoint — an orchestrator double-start, a zombie driver)
    * can plan the SAME range simultaneously; two overwrite jobs into
    * one directory would tear each other's output mid-write, so
    * staging SERIALIZES on a create-exclusive per-range lock: the
    * winner writes and publishes the sentinel, losers wait for the
    * sentinel and reuse (the range's content is deterministic from
    * the commit log, so whoever wins writes the same bytes). A lock
    * whose holder crashed breaks by age; a held lock that outlives
    * the wait refuses loudly rather than reading a possibly-torn
    * stage. */
  private def stagePlan(area: String,
                        df: => org.apache.spark.sql.DataFrame,
                        from: Long, to: Long): Array[InputPartition] = {
    require(checkpointLocation.nonEmpty,
      s"lake-changes $area staging needs the stream's checkpointLocation")
    val stage = new Path(s"$checkpointLocation/$area/b$from-$to")
    val staged = new Path(stage, "_graft_staged")
    val lock = new Path(s"$checkpointLocation/$area/.b$from-$to.lock")
    val staleLockMs = 600000L
    val deadline = System.currentTimeMillis() + 300000L
    // SAME-JVM rivals (two streams of one driver, the common
    // double-start) serialize deterministically on a process mutex;
    // the filesystem lock below covers cross-JVM rivals BEST-EFFORT
    // (Hadoop's local create(overwrite=false) is check-then-create,
    // not O_EXCL — a slipped-through loser's write job dies on the
    // winner's overwrite and simply retries: the content is
    // deterministic, so whoever completes writes the same bytes).
    val jvmLock = LakeChangeStream.stageLock(stage.toString)
    var done = fs.exists(staged)
    while (!done) {
      val claimed = jvmLock.synchronized {
        if (fs.exists(staged)) { done = true; false }
        else
          try { fs.create(lock, false).close(); true }
          catch { case _: java.io.IOException => false }
      }
      if (done) ()
      else if (claimed) {
        try jvmLock.synchronized {
          // double-check under the lock: a rival may have completed
          // between our sentinel probe and the claim
          if (!fs.exists(staged)) {
            df.write.mode("overwrite").parquet(stage.toString)
            fs.create(staged, true).close()
          }
          done = true
        } catch {
          // a cross-JVM rival slipped the non-atomic claim and its
          // overwrite tore ours mid-write: lost the race — re-check
          // the sentinel and retry (deterministic content)
          case e @ (_: java.io.IOException
              | _: org.apache.spark.SparkException) =>
            if (System.currentTimeMillis() > deadline) throw e
        } finally fs.delete(lock, false)
      } else {
        // a rival holds the range: wait for its sentinel (reuse), a
        // vanished lock (retry the claim), or break a crashed
        // holder's stale claim
        val holder =
          try Option(fs.getFileStatus(lock))
          catch { case _: java.io.FileNotFoundException => None }
        holder match {
          case Some(st) if System.currentTimeMillis() -
              st.getModificationTime > staleLockMs =>
            fs.delete(lock, false) // crashed holder; re-claim next spin
          case Some(_) =>
            if (fs.exists(staged)) done = true
            else if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"lake-changes staging lock $lock held beyond the " +
                  "wait budget - a rival driver is still staging this " +
                  "range (or crashed without aging out); refusing to " +
                  "read a possibly-torn stage")
            else Thread.sleep(50)
          case None => () // released: retry the claim immediately
        }
      }
    }
    val files = fs.listStatus(stage)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen)).toSeq
    if (files.isEmpty) return Array.empty
    val index = new ManifestPartitioningIndex(spark, stage, files,
      new StructType())
    ParquetScanBuilder(spark, index, outSchema, outSchema,
        CaseInsensitiveStringMap.empty()).build().toBatch
      .planInputPartitions()
  }

  /** ENRICHED micro-batch plan (`keys=` set): the range's row-grain
    * change feed ([[graft.v3.Lake.changesBetweenCommitsEnriched]] —
    * one keyed equi-join per REWRITE commit, churn-sized, the same
    * join the 4-arg `table_changes` TVF serves in batch) materializes
    * once into a staging dir under the stream's checkpoint, and the
    * batch scans the staged parquet. Staging is the price of row-grain
    * enrichment through a DSv2 file scan (a micro-batch plan is a set
    * of file partitions, not an arbitrary join plan); it is CHURN-
    * sized — never table-sized — deterministic from the commit log
    * (crash replay overwrites the same range to the same content),
    * and GC'd at engine [[commit]]. Delta materializes its CDF under
    * `_change_data` at WRITE time for the same reason; this does it
    * lazily at read time, so non-CDC writers pay nothing. */
  private def planEnriched(so: LakeCommitOffset, from: Long, to: Long,
                           keys: Seq[String]): Array[InputPartition] = {
    // idempotent staging (stagePlan): Spark may plan the SAME batch
    // more than once (statistics pass, recovery re-plan) — a blind
    // overwrite would mint new part-file names under partitions
    // already handed out. The range's content is deterministic from
    // the commit log, so a completed stage is simply reused; only an
    // absent or torn stage (crash mid-write) is (re)written. The
    // completion marker is OUR OWN sentinel, written after the job —
    // _SUCCESS alone would vanish under
    // mapreduce.fileoutputcommitter.marksuccessfuljobs=false (common
    // on object stores) and re-arm the blind overwrite.
    stagePlan("__enriched",
      lake.changesBetweenCommitsEnriched(lakeTable, from, to,
        keys, Option(so.inc).filter(_.nonEmpty)), from, to)
  }

  /** Built ONCE per stream, not per micro-batch: the factory is
    * deterministic in (schemas, session conf) — all fixed for the
    * stream's life — and each `ParquetScanBuilder.createReaderFactory`
    * serializes + broadcasts the full Hadoop Configuration (~MBs,
    * profiled as per-batch `Configuration.write` time on the stream
    * thread). Spark calls [[createReaderFactory]] for every batch;
    * caching turns 1–3 conf broadcasts per micro-batch into 1–3 per
    * stream. */
  private lazy val readerFactoryOnce: PartitionReaderFactory =
    keysOpt match {
      case Some(_) =>
        // enriched batches scan their STAGED parquet: the change-tag
        // columns are real data columns there — plain passthrough
        val empty = new ManifestPartitioningIndex(spark,
          new Path(s"$checkpointLocation/__enriched"), Seq.empty,
          new StructType())
        ParquetScanBuilder(spark, empty, outSchema, outSchema,
            CaseInsensitiveStringMap.empty()).build().toBatch
          .createReaderFactory()
      case None =>
        // the parquet reader factory is file-list-independent (files
        // ride in each InputPartition) - build it once over an empty
        // index
        val empty = new ManifestPartitioningIndex(spark, tableDir,
          Seq.empty, partSchema)
        val delegate = ParquetScanBuilder(spark, empty, tableSchema,
            dataSchema, CaseInsensitiveStringMap.empty()).build().toBatch
          .createReaderFactory()
        // delegate rows flow data-then-partition; map them (plus the
        // two tag fields) back into the declared schema order
        val joined = StructType(dataSchema.fields ++ partSchema.fields)
          .add("_change_type", StringType).add("_commit_version", LongType)
        val ordinals = outSchema.fields.map(f => joined.fieldIndex(f.name))
        val tagged = TaggedChangeReaderFactory(delegate,
          ordinals, joined.fields.map(_.dataType))
        // DV-batch partitions read their STAGED parquet (tag columns
        // are real data there): a second passthrough delegate,
        // dispatched by partition type — batches of both kinds can
        // interleave across the stream's life
        val stagedEmpty = new ManifestPartitioningIndex(spark,
          new Path(s"$checkpointLocation/__changes"), Seq.empty,
          new StructType())
        val staged = ParquetScanBuilder(spark, stagedEmpty, outSchema,
            outSchema, CaseInsensitiveStringMap.empty()).build().toBatch
          .createReaderFactory()
        DispatchingChangeReaderFactory(tagged, staged)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    readerFactoryOnce

  override def toString: String =
    s"LakeChangeStream($lakeTable, starting=$startingVersion)"
}

private[graft] object LakeChangeStream {
  /** Per-stage-path process mutexes for the staging serialization
    * (bounded: clear-all past 256 — a stage path is hot only while
    * its batch plans). */
  private val stageLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[streaming] def stageLock(path: String): Object = {
    if (stageLocks.size > 256) stageLocks.clear()
    stageLocks.computeIfAbsent(path, _ => new Object)
  }

  /** Test/probe seam: each stream's listing COUNTER, keyed by
    * (root, table) — zero-listing assertions must observe the
    * CONSUMER's own planning instance (listCalls is per-Lake), not an
    * unrelated Lake over the same root, which would make the check
    * vacuous. Keyed (a last-instance handle races any concurrent
    * stream construction) and holding only the AtomicLong, never the
    * Lake (a pinned Lake retains its manifest caches and SparkSession
    * for the JVM's life). Bounded by oldest-first eviction. */
  private val listSeams = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.atomic.AtomicLong]()
  private val seamOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  private[streaming] def registerSeam(root: String, table: String,
      counter: java.util.concurrent.atomic.AtomicLong): Unit =
    seamOrder.synchronized {
      if (listSeams.put((root, table), counter) != null)
        seamOrder.remove((root, table))
      seamOrder.add((root, table))
      while (listSeams.size > 64) {
        val oldest = seamOrder.poll()
        if (oldest == null) return
        listSeams.remove(oldest)
      }
    }

  /** The listing count of the stream consuming (root, table); None =
    * no such stream was constructed in this JVM. */
  private[graft] def listCallsOf(root: String, table: String)
      : Option[Long] =
    Option(listSeams.get((root, table))).map(_.get())
}

/** A delegate parquet partition tagged with the change it carries. */
private[graft] case class TaggedChangePartition(
    delegate: InputPartition, changeType: String, commitVersion: Long)
  extends InputPartition

/** A partition over a batch's STAGED change parquet (the DV-batch
  * fallback): tag columns are data columns there — plain passthrough. */
private[graft] case class StagedChangePartition(delegate: InputPartition)
  extends InputPartition

/** Dispatches per partition kind: tagged manifest-file partitions
  * through the wrapping factory, staged partitions through the
  * passthrough one. */
private[graft] case class DispatchingChangeReaderFactory(
    tagged: TaggedChangeReaderFactory,
    staged: PartitionReaderFactory) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case s: StagedChangePartition => staged.createReader(s.delegate)
    case t: TaggedChangePartition => tagged.createReader(t)
    case other => throw new IllegalStateException(
      s"unexpected change partition $other")
  }
}

/** Wraps the parquet readers: every delegate row is appended the
  * partition's (changeType, commitVersion) tag and projected into the
  * declared column order as one unsafe row. */
private[graft] case class TaggedChangeReaderFactory(
    delegate: PartitionReaderFactory,
    ordinals: Array[Int],
    joinedTypes: Array[org.apache.spark.sql.types.DataType])
  extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TaggedChangePartition]
    val inner = delegate.createReader(p.delegate)
    val tag = new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.changeType), p.commitVersion))
    val project = UnsafeProjection.create(
      ordinals.map(i => BoundReference(i, joinedTypes(i),
        nullable = true): org.apache.spark.sql.catalyst.expressions.Expression))
    val join = new JoinedRow()
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = project(join(inner.get(), tag))
      override def close(): Unit = inner.close()
    }
  }
}
