package graft.plans

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId, Expression}
import org.apache.spark.sql.execution.datasources.{PartitionPath, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.StructType

/** The DSv2 face of the manifest-served index: a
  * [[PartitioningAwareFileIndex]] built from (path, bytes) manifest
  * entries — ZERO filesystem calls at plan time, like the V1
  * [[ManifestFileIndex]] — in the shape Spark's DataSourceV2 parquet
  * scan machinery (`ParquetScanBuilder` → `ParquetScan`) consumes.
  * Partition pruning, split sizing and filter pushdown all run against
  * the synthetic [[FileStatus]] entries; partition values are parsed
  * from the paths' Hive `col=value` segments via
  * [[ManifestFileIndex.partitionRow]] (n-column layouts included,
  * loud refusal when a path can't serve the declared columns).
  *
  * Construction is sized for million-file tables (ManifestProbe's
  * dsv2_index_build): files group into leaf dirs by STRING prefix —
  * one `Path` per file for the status plus one per distinct dir,
  * never a second per-file `Path.getParent` (each of which allocates
  * and normalizes a URI) — and [[leafFiles]] is lazy because the
  * partitioned scan path (`listFiles` → partition pruning →
  * [[leafDirToChildrenFiles]]) never consults it; it materializes
  * only if some caller walks the flat file map.
  *
  * The index is immutable — a manifest version IS a fixed file set;
  * [[refresh]] is a no-op and each catalog `loadTable` builds (or
  * serves from the per-version cache) one against the then-current
  * (or `VERSION AS OF`-pinned) manifest.
  */
class ManifestPartitioningIndex private (
    spark: SparkSession,
    tableDir: Path,
    dirMap: Map[Path, Array[FileStatus]],
    partSchema: StructType,
    stats: Option[DataSkipping.FileStatsProvider])
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  def this(spark: SparkSession, tableDir: Path,
           files: Seq[(String, Long)], // (absPath, bytes)
           partSchema: StructType,
           stats: Option[DataSkipping.FileStatsProvider] = None) =
    this(spark, tableDir,
      ManifestPartitioningIndex.buildDirMap(files), partSchema, stats)

  /** Data-skipping pass over the parent's partition-pruned listing:
    * pushed data-filter conjuncts compile once per plan
    * ([[DataSkipping.compile]]) and each surviving file is tested
    * against its known per-column [min, max] — files that provably
    * cannot match are never scheduled. Stats come from the provider's
    * already-loaded cache (the `_filestats` sidecar, warmed at commit
    * time) — ZERO footer or filesystem I/O here, preserving the
    * index's zero-I/O planning contract; unknown stats keep the file.
    * Row-level (UPDATE/MERGE) scans never reach this path: they push
    * no data filters by design — a group-based rewrite must read
    * every row of each replaced file. */
  /** Skip-pruned listings memoized per filter set: Spark walks
    * listFiles several times while planning ONE query (statistics,
    * pushdown, partitions), and repeated identical query TEXT walks
    * again with fresh exprIds — the index is immutable, so the pruned
    * result is too. Keyed by the expressions' toString after a
    * STRUCTURAL exprId normalization (every [[AttributeReference]]
    * rebuilt with exprId 0) — never a text regex over the rendered
    * string, which would also mangle string LITERALS that happen to
    * contain `#<digits>` (e.g. `sku = 'item#1'` vs `'item#2'`) and
    * collide two different filters onto one cached pruning. Safe
    * because the index serves one table's scan output, where
    * attribute names are unambiguous. Bounded. */
  private val listCache = new java.util.concurrent.ConcurrentHashMap[
    String,
    Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory]]()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    val compiled =
      if (stats.isEmpty || dataFilters.isEmpty) None
      else DataSkipping.compile(dataFilters)
    compiled match {
      case Some(test) =>
        val key = (partitionFilters.iterator ++ dataFilters.iterator)
          .map(_.transform {
            case a: AttributeReference =>
              AttributeReference(a.name, a.dataType, a.nullable,
                a.metadata)(exprId = ExprId(0),
                qualifier = Seq.empty)
          }.toString).mkString("|")
        val hit = listCache.get(key)
        if (hit != null) return hit
        val base = super.listFiles(partitionFilters, dataFilters)
        val p = stats.get
        var candidates = 0L
        var kept = 0L
        val out = base.map { pd =>
          val files = pd.files.filter { f =>
            candidates += 1
            val keep = test.mayMatch(
              c => p.range(f.getPath, f.getLen, c),
              c => p.nulls(f.getPath, f.getLen, c))
            if (keep) kept += 1
            keep
          }
          if (files.length == pd.files.length) pd else pd.copy(files = files)
        }.filter(_.files.nonEmpty)
        DataSkipping.record(tableDir.toString, candidates, kept)
        if (listCache.size > 32) listCache.clear()
        listCache.put(key, out)
        out
      case None => super.listFiles(partitionFilters, dataFilters)
    }
  }

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    dirMap

  /** This index with one commit's delta applied — the O(batch)
    * alternative to a full rebuild when a query arrives one (or a few)
    * DELTA commits past a cached index. Only the leaf dirs the commit
    * touched are re-materialized (their [[FileStatus]] arrays rebuilt);
    * every other dir SHARES its array and `Path` objects with this
    * index, so at 10⁶ files a typical append patches in O(batch + one
    * dir) instead of the ~3 s full construction ManifestProbe measured
    * (`dsv2_plan_after_commit`). The partition spec re-derives from the
    * dir KEYS only — O(dirs), not O(files). Caller contract: `adds`
    * are (absPath, bytes) and `removesAbs` absolute paths, exactly as
    * the manifest delta records them after qualification. */
  def patched(adds: Seq[(String, Long)],
              removesAbs: Set[String]): ManifestPartitioningIndex = {
    def dirOf(p: String): String = {
      val cut = p.lastIndexOf('/')
      if (cut <= 0) p else p.substring(0, cut)
    }
    val touched = (adds.map(t => dirOf(t._1)) ++
      removesAbs.map(dirOf)).toSet
    val addByDir = adds.groupBy(t => dirOf(t._1))
    val next = scala.collection.mutable.Map.empty[Path, Array[FileStatus]]
    leafDirToChildrenFiles.foreach { case (d, arr) =>
      if (!touched.contains(d.toString)) next.put(d, arr)
      else {
        val kept = if (removesAbs.isEmpty) arr
          else arr.filterNot(s => removesAbs.contains(s.getPath.toString))
        val added = addByDir.getOrElse(d.toString, Seq.empty)
          .map { case (p, b) => ManifestPartitioningIndex.mkStatus(p, b) }
        val merged = kept ++ added
        if (merged.nonEmpty) next.put(d, merged)
      }
    }
    // dirs born in this commit (a new partition's first file)
    (addByDir.keySet -- leafDirToChildrenFiles.keysIterator
        .map(_.toString)).foreach { d =>
      next.put(new Path(d), addByDir(d)
        .map { case (p, b) => ManifestPartitioningIndex.mkStatus(p, b) }
        .toArray)
    }
    new ManifestPartitioningIndex(spark, tableDir, next.toMap, partSchema,
      stats)
  }

  /** (file count, total bytes) — the cheap consistency fingerprint the
    * cache compares against the manifest's own entry set before
    * trusting a patched index (mismatch → full rebuild, never a wrong
    * plan). */
  def fingerprint: (Long, Long) = {
    var n = 0L; var b = 0L
    leafDirToChildrenFiles.values.foreach { arr =>
      n += arr.length; arr.foreach(b += _.getLen)
    }
    (n, b)
  }

  override lazy val leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new mutable.LinkedHashMap[Path, FileStatus]()
    leafDirToChildrenFiles.values.foreach(_.foreach(s => m.put(s.getPath, s)))
    m
  }

  private val spec: PartitionSpec =
    if (partSchema.isEmpty) PartitionSpec.emptySpec
    else PartitionSpec(partSchema,
      leafDirToChildrenFiles.keys.toSeq.sortBy(_.toString).map { d =>
        PartitionPath(InternalRow.fromSeq(
          ManifestFileIndex.partitionRow(d.toString, partSchema)), d)
      })

  override def partitionSpec(): PartitionSpec = spec

  override def rootPaths: Seq[Path] = Seq(tableDir)

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = fingerprint._2
}

object ManifestPartitioningIndex {
  /** FULL (O(files)) constructions since JVM start — the test/probe
    * seam that lets specs assert an index was served from cache or
    * PATCHED (O(batch)) rather than rebuilt, without reaching into
    * planner internals. `patched` copies don't count. */
  val builds = new java.util.concurrent.atomic.AtomicLong(0L)

  private def mkStatus(p: String, b: Long): FileStatus =
    new FileStatus(b, false, 1, 134217728L, 0L, new Path(p))

  private def buildDirMap(files: Seq[(String, Long)])
      : Map[Path, Array[FileStatus]] = {
    builds.incrementAndGet()
    files.groupBy { case (p, _) =>
      val cut = p.lastIndexOf('/')
      if (cut <= 0) p else p.substring(0, cut)
    }.map { case (dir, fs) =>
      new Path(dir) -> fs.map { case (p, b) => mkStatus(p, b) }.toArray
    }
  }
}
