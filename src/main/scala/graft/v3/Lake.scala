package graft.v3

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The event lake: one directory per table, parquet inside, partitioned
  * by `chain_name`.
  *
  * The reference models a table as a flat glob of segment files named
  * `{idx}_{minBlock}_{maxBlock}_{table}.parquet` and rescans everything
  * on every read (reference v3/helpers/data_update.py:29–59,
  * v3/state.py:130). Spark-first redesign:
  *
  *  - `chain_name=` hive partitioning → directory-level pruning for the
  *    per-chain filters every reference query starts with (SURVEY.md §4
  *    "file skipping"), and `drop(chain)` becomes a partition delete
  *    instead of the reference's delete-whole-file-if-any-row-matches
  *    footgun (pool_helpers.py:218–231).
  *  - block-range file skipping comes free from parquet min/max column
  *    stats on `block_number`, so the filename index header (S7) is
  *    unnecessary.
  *  - appends are `mode("append")` atomic-enough part files; segment
  *    bookkeeping lives in the ingest loop, not in filenames.
  */
class Lake(spark: SparkSession, val root: String) {

  private def dir(table: String) = s"$root/$table"

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists(table: String): Boolean = fs.exists(new Path(dir(table)))

  /** Schema-enforced read; empty (correctly-typed) frame if the table
    * has no data yet. Filters pushed by callers reach the parquet scan
    * (predicate pushdown + partition pruning). */
  def read(table: String): DataFrame = {
    val schema = Schemas.forTable(table)
    if (!exists(table))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .option("basePath", dir(table))
        .parquet(dir(table))
  }

  /** Append one ingested segment. Data is repartitioned by chain before
    * the partitioned write so each chain gets coherent files. */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append")
      .partitionBy("chain_name")
      .parquet(dir(table))

  /** Local resume point: max block currently in the lake for this
    * chain (optionally one pool) — reference data_update.py:163–189. */
  def maxBlock(table: String, chain: String,
               pool: Option[String] = None): Option[Long] = {
    if (!exists(table)) return None
    val base = read(table).filter(col("chain_name") === chain)
    val filtered = pool.fold(base)(p => base.filter(col("address") === p))
    val row = filtered.agg(max(col("block_number"))).first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** Drop one chain's rows from a table — a partition-directory delete,
    * fixing the reference's whole-file deletion that could take other
    * chains' rows with it (SURVEY.md §7.4 bug list). */
  def dropChain(table: String, chain: String): Boolean = {
    val p = new Path(s"${dir(table)}/chain_name=$chain")
    fs.exists(p) && fs.delete(p, true)
  }

  /** Drop a whole table (its snapshot manifests go with it — a pinned
    * read of a dropped table has nothing true left to say). */
  def dropTable(table: String): Boolean = {
    val p = new Path(dir(table))
    val s = snapDir(table)
    if (fs.exists(s)) fs.delete(s, true)
    fs.exists(p) && fs.delete(p, true)
  }

  /** Per-file inventory of one table: (chain_name, path, bytes). The
    * small-files problem is what incremental appends produce — every
    * ingest segment lands its own part files, and a year of 200k-row
    * pulls leaves thousands of KB-scale files whose open/footer cost
    * dominates scans. */
  def fileInventory(table: String): Seq[(String, String, Long)] = {
    if (!exists(table)) return Seq.empty
    val it = fs.listFiles(new Path(dir(table)), true)
    val out = Seq.newBuilder[(String, String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toString
      if (f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith(".")) {
        val chain = p.split('/').collectFirst {
          case seg if seg.startsWith("chain_name=") =>
            seg.stripPrefix("chain_name=")
        }.getOrElse("")
        out += ((chain, p, f.getLen))
      }
    }
    out.result().sortBy(t => (t._1, t._2))
  }

  /** Deterministic compaction plan: group each chain's files into
    * target-sized bins by size-descending running-sum bucketing
    * (sorted next-fit — the [[graft.llm.Chunking]] packSequences rule
    * applied to files: sort by (bytes desc, path), bin =
    * cum_before ÷ targetBytes, so every bin except possibly the last
    * holds ≥ targetBytes÷2 once full and a file larger than the
    * target gets its own bin). File inventories are human-sized state
    * (thousands of entries — the model-state rule), so the plan is a
    * driver computation over [[fileInventory]]; EXECUTION is
    * distributed: each bin rewrites via one partitioned read+write.
    * Returns (chain, bin, path, bytes); bins with one file need no
    * rewrite (already compact) and are flagged by the caller. */
  def compactionPlan(table: String,
                     targetBytes: Long): Seq[(String, Int, String, Long)] = {
    require(targetBytes > 0, "targetBytes must be positive")
    fileInventory(table).groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (chain, files) =>
        val sorted = files.map(f => (f._2, f._3))
          .sortBy { case (p, b) => (-b, p) }
        var cum = 0L
        sorted.map { case (p, b) =>
          val bin = (cum / targetBytes).toInt
          cum += b
          (chain, bin, p, b)
        }
    }
  }

  /** Execute a compaction plan for one table: rewrite each multi-file
    * bin into a single coalesced file set, preserving rows exactly
    * (CompactionSpec proves bag equality). Single-file bins are left
    * untouched — rewriting them would only churn data. */
  def compact(table: String, targetBytes: Long): Int = {
    val plan = compactionPlan(table, targetBytes)
    val multi = plan.groupBy(t => (t._1, t._2)).filter(_._2.size > 1)
    if (multi.isEmpty) return 0
    var rewritten = 0
    multi.toSeq.sortBy(_._1).foreach { case ((chain, _), files) =>
      val paths = files.map(_._3)
      val schema = Schemas.forTable(table)
      val merged = spark.read.schema(schema)
        .option("basePath", dir(table))
        .parquet(paths: _*)
        .drop("chain_name")
        .coalesce(1)
      val tmp = new Path(s"${dir(table)}/chain_name=$chain/.compact-tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      // land the compacted files, then delete the originals — a crash
      // between the two leaves duplicate rows visible (parquet lake
      // without a transaction log; the v3 lake's ingest loop dedups on
      // resume, and real deployments put Delta/Iceberg underneath)
      val tgtDir = new Path(s"${dir(table)}/chain_name=$chain")
      val stamp = System.nanoTime()
      var i = 0
      // fs.rename signals failure by RETURNING false on HDFS (cross-fs
      // moves, permissions) rather than throwing; landing must be
      // all-or-nothing BEFORE the originals are deleted, else a failed
      // rename would silently lose the bin's rows. On any failure the
      // landed part-files are rolled back and the bin is skipped —
      // worst case is the documented duplicate-rows crash window,
      // never data loss.
      val landed = scala.collection.mutable.ArrayBuffer.empty[Path]
      val allRenamed = fs.listStatus(tmp)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .forall { st =>
          val dst = new Path(tgtDir, f"compacted-$stamp-$i%05d.parquet")
          i += 1
          val ok = fs.rename(st.getPath, dst)
          if (ok) landed += dst
          ok
        }
      if (!allRenamed) {
        landed.foreach(p => fs.delete(p, false))
        fs.delete(tmp, true)
      } else {
        fs.delete(tmp, true)
        paths.foreach(p => fs.delete(new Path(p), false))
        rewritten += 1
      }
    }
    rewritten
  }

  /** Keyed UPSERT — the CDC-apply operator (MERGE INTO's
    * insert/update/delete semantics) for the parquet lake: incoming
    * rows replace existing rows with the same key, new keys insert,
    * and rows whose `deleteCol` is true remove their key. The batch
    * must be unique per key (compact a raw change stream with
    * [[graft.ops.Ops.lastPerKey]] first — the require below fails fast
    * otherwise, because silently letting two versions of a key race
    * the union is the classic CDC corruption).
    *
    * Scale shape: ONE anti-join of the current table against the
    * batch's keys (shuffle on the key) plus the batch itself, and the
    * rewrite touches ONLY the chain partitions the batch names —
    * dynamic partition overwrite, the other partitions' files are
    * never opened. A chain whose every row is deleted gets its
    * partition directory dropped explicitly (dynamic overwrite only
    * rewrites partitions present in the output). Crash window: the
    * partition overwrite is not atomic on a bare parquet lake — same
    * documented window as [[compact]]; real deployments put an ACID
    * table format underneath. */
  /** `checkUnique = false` skips the per-batch uniqueness aggregate —
    * ONLY for callers that just established it structurally (e.g.
    * [[graft.streaming.Streaming.upsertStream]] compacts with
    * lastPerKey immediately before; re-checking would re-shuffle the
    * batch to prove a property its own plan guarantees). */
  def upsert(updates: DataFrame, table: String, keys: Seq[String],
             deleteCol: Option[String] = None,
             checkUnique: Boolean = true): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val schema = Schemas.forTable(table)
    if (checkUnique) {
      val dups = updates.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dups == 0L,
        s"upsert batch has multiple rows per key ${keys.mkString(",")} - " +
          "compact the change stream to latest-per-key first (Ops.lastPerKey)")
    }
    val chains = updates.select(col("chain_name")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (chains.isEmpty) return
    val curTouched = read(table)
      .filter(col("chain_name").isInCollection(chains))
    val survivors = curTouched.join(
      updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    // NULL deleteCol (e.g. a change file written before the column
    // existed, read back as typed nulls) means "not a tombstone" —
    // without the coalesce such rows would be anti-joined out of
    // survivors AND dropped from inserts: a silent delete
    val inserts = deleteCol.fold(updates)(c =>
      updates.filter(!coalesce(col(c), lit(false))).drop(c))
    val cols = schema.fieldNames.toSeq.map(col)
    val merged = survivors.select(cols: _*)
      .unionByName(inserts.select(cols: _*))
      .localCheckpoint() // cut lineage: the write overwrites its input
    val remaining = merged.select(col("chain_name")).distinct()
      .collect().map(_.getString(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("chain_name").parquet(dir(table))
    chains.filterNot(remaining).foreach(dropChain(table, _))
  }

  // ── Snapshots: manifest-based time travel ──────────────────────────
  //
  // The exact-reproducibility need every training-data lake hits:
  // "read the corpus EXACTLY as it was when run X trained", while
  // appends keep landing. A snapshot is one manifest file listing the
  // table's data files at commit time (paths relative to the table
  // dir, so the lake can move) — the Iceberg/Delta idea at its
  // smallest: metadata names files, readers plan from metadata, and a
  // version is immutable because parquet files are append-only.
  // Manifests are driver-small (file lists, thousands of entries — the
  // model-state rule); the READ is a normal distributed parquet scan
  // over exactly the named files, partition values still parsed from
  // the paths. COMPACTION rewrites files, so it invalidates snapshots
  // taken before it; [[readAt]] detects missing files and fails loudly
  // with the invalidating paths instead of silently returning a
  // partial corpus — retention policy (keep pre-compaction files until
  // snapshots expire) is a deployment concern layered above, exactly
  // as in the published table formats.

  // manifests live OUTSIDE the table directory: anything under it —
  // even underscore-prefixed — can trip partition discovery on the
  // live read's recursive listing
  private def snapDir(table: String) = new Path(s"$root/_snapshots/$table")

  /** Commit the table's current file set as the next snapshot version.
    * Returns the new version number (1-based). Concurrency: the
    * version file is created with create-exclusive semantics; on a
    * collision (two writers snapshotting at once) the later writer
    * retries with the next number. */
  def snapshot(table: String): Long = {
    val base = fs.makeQualified(new Path(dir(table))).toString
    val files = fileInventory(table).map(_._2)
      .map(_.stripPrefix(base).stripPrefix("/"))
      .sorted
    fs.mkdirs(snapDir(table))
    var v = snapshotVersions(table).lastOption.getOrElse(0L) + 1
    var done = false
    while (!done) {
      val p = new Path(snapDir(table), f"v$v%09d.txt")
      try {
        val out = fs.create(p, false) // create-exclusive: no overwrite
        out.write(files.mkString("\n").getBytes("UTF-8"))
        out.close()
        done = true
      } catch {
        case _: java.io.IOException if fs.exists(p) => v += 1 // raced
      }
    }
    v
  }

  /** All committed snapshot versions, ascending. */
  def snapshotVersions(table: String): Seq[Long] = {
    if (!fs.exists(snapDir(table))) return Seq.empty
    fs.listStatus(snapDir(table)).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toLong)
      .sorted
  }

  /** Incremental read: ONLY the rows appended after snapshot
    * `sinceVersion` — the incremental-ETL primitive (downstream
    * pipelines process what's new, no streaming infrastructure
    * needed). Implemented as a manifest set-difference: files in the
    * target snapshot (or the live inventory when `upTo` is None) that
    * the base manifest doesn't name. Parquet files are append-only, so
    * file-level difference IS row-level difference — as long as no
    * compaction ran in between; a compacted file would appear "new"
    * while carrying old rows, so this fails loudly if any base-
    * manifest file has vanished (same invalidation contract as
    * [[readAt]]). */
  def readSince(table: String, sinceVersion: Long,
                upTo: Option[Long] = None): DataFrame = {
    val baseFiles = manifestFiles(table, sinceVersion).toSet
    val gone = baseFiles.filterNot(r =>
      fs.exists(new Path(s"${dir(table)}/$r")))
    require(gone.isEmpty,
      s"snapshot v$sinceVersion of $table invalidated (compaction ran " +
        s"since) - incremental read would mistake rewritten files for " +
        s"new rows: ${gone.take(5).mkString(", ")}")
    val target = upTo match {
      case Some(v) => manifestFiles(table, v)
      case None =>
        val base = fs.makeQualified(new Path(dir(table))).toString
        fileInventory(table).map(_._2)
          .map(_.stripPrefix(base).stripPrefix("/"))
    }
    val fresh = target.filterNot(baseFiles)
    if (fresh.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.forTable(table))
    // the TARGET's files must exist too: a compaction after the target
    // snapshot would otherwise surface as a raw path-not-found (or a
    // silent partial read under ignoreMissingFiles) instead of this
    // API's loud-invalidation contract
    val freshGone = fresh.filterNot(r =>
      fs.exists(new Path(s"${dir(table)}/$r")))
    require(freshGone.isEmpty,
      s"incremental read of $table invalidated - target files missing " +
        s"(compacted or expired): ${freshGone.take(5).mkString(", ")}")
    spark.read.schema(Schemas.forTable(table))
      .option("basePath", dir(table))
      .parquet(fresh.map(r => s"${dir(table)}/$r"): _*)
  }

  private def manifestFiles(table: String, version: Long): Seq[String] = {
    val p = new Path(snapDir(table), f"v$version%09d.txt")
    require(fs.exists(p), s"no snapshot v$version for table $table")
    val in = fs.open(p)
    val body = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    body.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Read the table EXACTLY as of snapshot `version`. Fails loudly if
    * any manifest file is gone (compacted/expired) — a partial corpus
    * silently standing in for a pinned one is the failure mode this
    * API exists to prevent. */
  def readAt(table: String, version: Long): DataFrame = {
    val rel = manifestFiles(table, version)
    if (rel.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.forTable(table))
    val abs = rel.map(r => s"${dir(table)}/$r")
    val missing = abs.filterNot(a => fs.exists(new Path(a)))
    require(missing.isEmpty,
      s"snapshot v$version of $table invalidated - missing files " +
        s"(compacted or expired): ${missing.take(5).mkString(", ")}" +
        (if (missing.size > 5) s" (+${missing.size - 5} more)" else ""))
    spark.read.schema(Schemas.forTable(table))
      .option("basePath", dir(table))
      .parquet(abs: _*)
  }
}
