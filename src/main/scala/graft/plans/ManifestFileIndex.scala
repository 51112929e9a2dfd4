package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] served entirely from lake manifest metadata: Spark
  * plans the scan — partition pruning, split sizing, filter pushdown —
  * from the (path, byte length) entries the lake's commit already
  * recorded, with ZERO filesystem calls at plan time.
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
  * Partition values are parsed from each path's Hive `col=value`
  * segments for EVERY column of `partitionSchema` (n-column layouts
  * like `chain_name=…/dt=…` plan and prune exactly like the 1-column
  * lake default; non-string columns go through Spark's own cast). A
  * path missing any declared partition column fails LOUDLY at index
  * construction — silently degrading a `chain/date` layout to an
  * unpartitioned scan would serve wrong partition values for every
  * row.
  *
  * The index is immutable (a manifest version IS a fixed file set);
  * [[refresh]] is a no-op and a new read plans against a fresh index.
  */
class ManifestFileIndex(
    tableDir: Path,
    files: Seq[(String, Long)], // (absPath, bytes)
    override val partitionSchema: StructType,
    stats: Option[DataSkipping.FileStatsProvider] = None) extends FileIndex {

  private def rowOf(path: String): Seq[Any] =
    ManifestFileIndex.partitionRow(path, partitionSchema)

  // one PartitionDirectory per distinct partition-value tuple, built
  // once; synthetic FileStatus (mtime 0, block size irrelevant —
  // split sizing uses maxPartitionBytes) so no stat call ever happens
  private val dirs: Seq[(InternalRow, Seq[FileStatus])] =
    if (partitionSchema.isEmpty)
      Seq((InternalRow.empty, files.map(mkStatus)))
    else files.groupBy(e => rowOf(e._1)).toSeq
      .sortBy(_._1.map(v => if (v == null) "" else v.toString)
        .mkString("\u0000"))
      .map { case (vals, fs) =>
        (InternalRow.fromSeq(vals), fs.map(mkStatus))
      }

  private def mkStatus(e: (String, Long)): FileStatus =
    new FileStatus(e._2, false, 1, 134217728L, 0L, new Path(e._1))

  override def rootPaths: Seq[Path] = Seq(tableDir)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
      else {
        // bind the filters to the partition row by field position and
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
    // data skipping over the partition-pruned survivors — same
    // compile-once / cache-only-lookup contract as the DSv2 twin
    // ([[ManifestPartitioningIndex.listFiles]]); no provider or no
    // usable conjunct = the historical no-overhead path
    val compiled =
      if (stats.isEmpty || dataFilters.isEmpty) None
      else DataSkipping.compile(dataFilters)
    compiled match {
      case Some(test) =>
        val p = stats.get
        var candidates = 0L
        var kd = 0L
        val out = kept.flatMap { case (row, sts) =>
          val fs = sts.filter { s =>
            candidates += 1
            val keep = test.mayMatch(
              c => p.range(s.getPath, s.getLen, c),
              c => p.nulls(s.getPath, s.getLen, c))
            if (keep) kd += 1
            keep
          }
          if (fs.isEmpty) None else Some(PartitionDirectory(row, fs.toArray))
        }
        DataSkipping.record(tableDir.toString, candidates, kd)
        out
      case None =>
        kept.map { case (row, sts) => PartitionDirectory(row, sts.toArray) }
    }
  }

  override def inputFiles: Array[String] = files.map(_._1).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._2).sum
}

object ManifestFileIndex {
  /** One partition value parsed from a path segment: Hive-unescaped,
    * the null sentinel decoded back to null (mirroring Spark's own
    * partitioned reader), non-string types through Spark's cast. */
  private def castValue(raw: String,
                        dt: org.apache.spark.sql.types.DataType): Any =
    if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
    else {
      val s = UTF8String.fromString(
        ExternalCatalogUtils.unescapePathName(raw))
      dt match {
        case StringType => s
        // session timezone, exactly like Spark's own partition-value
        // parsing — a fixed zone would decode timestamp partitions
        // differently from the listing fallback
        case other => Cast(Literal(s, StringType), other,
          Some(org.apache.spark.sql.internal.SQLConf.get
            .sessionLocalTimeZone)).eval(null)
      }
    }

  /** A path's partition row: one value per `partitionSchema` field,
    * located by `name=` segment anywhere in the path — shared by the
    * V1 index above and the DSv2 [[ManifestPartitioningIndex]]. A
    * path missing any declared column fails LOUDLY: silently
    * degrading would plan wrong partition values for every row. */
  private[graft] def partitionRow(path: String,
                                  partitionSchema: StructType): Seq[Any] = {
    val segs = path.split('/')
    partitionSchema.fields.map { f =>
      val pre = f.name + "="
      segs.collectFirst { case s if s.startsWith(pre) =>
        castValue(s.stripPrefix(pre), f.dataType)
      }.getOrElse(throw new IllegalStateException(
        s"manifest entry '$path' has no '${f.name}=' partition " +
          "segment - the manifest cannot serve this layout for the " +
          s"declared partition columns ${partitionSchema.fieldNames
            .mkString("(", ", ", ")")}; refusing rather than plan " +
          "wrong partition values"))
    }.toSeq
  }

  /** A DataFrame over exactly `entries`, planned from the manifest
    * index (no filesystem access until executors open the files).
    * `schema` is the full table schema; `partitionCols` names the
    * hive-partition columns (in layout order) whose values are parsed
    * from the entry paths. Column order follows HadoopFsRelation's
    * data-then-partition convention — callers wanting declared order
    * re-select. */
  def relation(spark: SparkSession, tableDir: Path,
               entries: Seq[(String, Long)], schema: StructType,
               partitionCols: Seq[String],
               options: Map[String, String] = Map.empty,
               stats: Option[DataSkipping.FileStatsProvider] = None)
      : DataFrame = {
    val missing = partitionCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"partition column(s) ${missing.mkString(", ")} not in schema")
    val partitionSchema = StructType(
      partitionCols.map(c => schema.fields.find(_.name == c).get))
    val dataSchema =
      StructType(schema.fields.filterNot(f => partitionCols.contains(f.name)))
    val index = new ManifestFileIndex(tableDir, entries, partitionSchema,
      stats)
    val rel = HadoopFsRelation(index, partitionSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat(), options)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
