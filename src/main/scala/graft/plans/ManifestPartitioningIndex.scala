package graft.plans

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
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
class ManifestPartitioningIndex(
    spark: SparkSession,
    tableDir: Path,
    files: Seq[(String, Long)], // (absPath, bytes)
    partSchema: StructType)
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private def mkStatus(p: String, b: Long): FileStatus =
    new FileStatus(b, false, 1, 134217728L, 0L, new Path(p))

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    files.groupBy { case (p, _) =>
      val cut = p.lastIndexOf('/')
      if (cut <= 0) p else p.substring(0, cut)
    }.map { case (dir, fs) =>
      new Path(dir) -> fs.map { case (p, b) => mkStatus(p, b) }.toArray
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

  override def sizeInBytes: Long = files.map(_._2).sum
}
