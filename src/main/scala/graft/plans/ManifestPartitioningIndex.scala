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
  * The index is immutable — a manifest version IS a fixed file set;
  * [[refresh]] is a no-op and each catalog `loadTable` builds a fresh
  * one against the then-current (or `VERSION AS OF`-pinned) manifest.
  */
class ManifestPartitioningIndex(
    spark: SparkSession,
    tableDir: Path,
    files: Seq[(String, Long)], // (absPath, bytes)
    partSchema: StructType)
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val statuses: Seq[FileStatus] = files.map { case (p, b) =>
    new FileStatus(b, false, 1, 134217728L, 0L, new Path(p))
  }

  override val leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new mutable.LinkedHashMap[Path, FileStatus]()
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)
      .map { case (d, fs) => d -> fs.toArray }

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
