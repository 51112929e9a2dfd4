package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] served entirely from lake manifest metadata: Spark
  * plans the scan — partition pruning, split sizing, filter pushdown —
  * from the (partition value, path, byte length) entries the lake's
  * commit already recorded, with ZERO filesystem calls at plan time.
  *
  * This is the piece that removes O(files) directory listings from the
  * read path: `spark.read.parquet(dir)` (and even an explicit file
  * list) makes the driver list or stat every file before planning,
  * which at millions of files on an object store is the dominant query
  * cost — the published table formats exist to serve exactly this
  * index from metadata instead (reference rescans its whole segment
  * glob per read, v3/helpers/data_update.py:29–59; this is the
  * opposite design point). Synthetic [[FileStatus]] entries carry the
  * manifest's byte lengths, so split planning sees true sizes; row
  * counts, footer stats and blooms stay where they live — in the files
  * — and are consumed by the normal parquet reader on the executors.
  *
  * The index is immutable (a manifest version IS a fixed file set);
  * [[refresh]] is a no-op and a new read plans against a fresh index.
  */
class ManifestFileIndex(
    tableDir: Path,
    entries: Seq[(String, String, Long)], // (partitionValue, absPath, bytes)
    override val partitionSchema: StructType) extends FileIndex {

  require(partitionSchema.fields.length <= 1,
    "ManifestFileIndex supports zero or one partition column")

  // one PartitionDirectory per partition value, built once; synthetic
  // FileStatus (mtime 0, block size irrelevant — split sizing uses
  // maxPartitionBytes) so no stat call ever happens
  private val dirs: Seq[(InternalRow, Seq[FileStatus])] =
    if (partitionSchema.isEmpty)
      Seq((InternalRow.empty, entries.map(mkStatus)))
    else entries.groupBy(_._1).toSeq.sortBy(_._1).map { case (pv, fs) =>
      // Spark stages a null partition value under the Hive sentinel
      // directory and its own partitioned reader decodes it back to
      // null — mirror that here, or the same table returns the
      // literal sentinel string when the manifest serves the scan and
      // null when the listing fallback does
      val row =
        if (pv == org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
          InternalRow(null)
        else InternalRow(UTF8String.fromString(pv))
      (row, fs.map(mkStatus))
    }

  private def mkStatus(e: (String, String, Long)): FileStatus =
    new FileStatus(e._3, false, 1, 134217728L, 0L, new Path(e._2))

  override def rootPaths: Seq[Path] = Seq(tableDir)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
      else {
        // bind the filters to the single-column partition row and
        // evaluate per partition — InMemoryFileIndex's pruning, minus
        // the listing that feeds it
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            BoundReference(partitionSchema.fieldIndex(a.name),
              a.dataType, a.nullable)
        }
        val pred = Predicate.createInterpreted(bound)
        pred.initialize(0)
        dirs.filter { case (row, _) => pred.eval(row) }
      }
    kept.map { case (row, sts) => PartitionDirectory(row, sts.toArray) }
  }

  override def inputFiles: Array[String] = entries.map(_._2).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_._3).sum
}

object ManifestFileIndex {
  /** A DataFrame over exactly `entries`, planned from the manifest
    * index (no filesystem access until executors open the files).
    * `schema` is the full table schema; `partitionCol` names the
    * hive-partition column whose values come from `entries`. Column
    * order follows HadoopFsRelation's data-then-partition convention —
    * callers wanting declared order re-select. */
  def relation(spark: SparkSession, tableDir: Path,
               entries: Seq[(String, String, Long)], schema: StructType,
               partitionCol: String,
               options: Map[String, String] = Map.empty): DataFrame = {
    val partitionSchema =
      StructType(schema.fields.filter(_.name == partitionCol))
    val dataSchema =
      StructType(schema.fields.filterNot(_.name == partitionCol))
    val index = new ManifestFileIndex(tableDir, entries, partitionSchema)
    val rel = HadoopFsRelation(index, partitionSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat(), options)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
