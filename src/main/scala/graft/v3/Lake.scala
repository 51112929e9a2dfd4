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

  /** Drop a whole table. */
  def dropTable(table: String): Boolean = {
    val p = new Path(dir(table))
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
}
