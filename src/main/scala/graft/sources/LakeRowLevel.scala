package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.WriteJobDescription
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.{FileBatchWrite, FileWriterFactory}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.plans.ManifestPartitioningIndex
import graft.v3.Lake

/** Group-based (copy-on-write) row-level operations — the DSv2
  * machinery behind SQL `UPDATE` and `MERGE INTO` (and the
  * untranslatable-predicate `DELETE` fallback) on lake tables.
  *
  * Spark's analyzer rewrites the command into a `ReplaceData` plan:
  * read the affected rows through THIS operation's scan, apply the
  * update/merge actions, and hand the complete replacement rows to
  * THIS operation's write. The lake's contract for that pair:
  *
  *  - ONE shared scan per operation (Spark plans the table several
  *    times — the main rewrite read and the runtime group-filter
  *    subquery — and all of them must agree on what "the read" was);
  *  - the scan exposes `chain_name` as its runtime filter attribute,
  *    so Spark's `RowLevelOperationRuntimeGroupFiltering` narrows the
  *    rewrite to the PARTITIONS holding matched rows (`SELECT
  *    DISTINCT chain_name WHERE <cond>` feeds `scan.filter(...)`) —
  *    group granularity = partition, the classic hive-layout CoW;
  *  - the write stages through Spark's own parquet write path
  *    (dynamic partitioning, task-attempt commit protocol), then
  *    lands in ONE manifest transaction that removes exactly the
  *    files the scan planned — optimistic concurrency included: a
  *    commit that retired any of them first aborts this one loudly
  *    with nothing published ([[Lake.ConcurrentWriteException]];
  *    re-run the statement to re-plan).
  *
  * Replaced files are RETAINED (moved to the retention area), so
  * pinned `VERSION AS OF` / `TIMESTAMP AS OF` reads taken before the
  * update stay readable until vacuum — the same lifecycle as the SQL
  * DELETE surface. Translatable DELETEs never reach this path:
  * Spark's `OptimizeMetadataOnlyDeleteFromTable` downgrades them to
  * [[LakeTable.deleteWhere]]'s metadata-only shapes first.
  */
private[graft] class LakeRowLevelOperation(
    spark: SparkSession,
    lake: Lake,
    lakeTable: String,
    tableDir: Path,
    entries: Seq[(String, Long)],
    tableSchema: StructType,
    partCols: Seq[String],
    cmd: RowLevelOperation.Command,
    cacheKey: Option[(String, Long)] = None) extends RowLevelOperation {

  /** The FULL-table index for this operation's scan: served from the
    * same per-(root, table, incarnation, version, schema) cache the
    * SELECT path uses when the entries came from the current manifest
    * (`cacheKey`), so a full-table UPDATE/MERGE — or one whose group
    * filter didn't parse — doesn't pay the O(files) rebuild the probe
    * measured at ~3 s per 10⁶ entries. Runtime-NARROWED sets stay
    * fresh-built (they're statement-specific subsets, O(matched
    * partitions) anyway). */
  private[sources] def fullIndex(partSchema: StructType)
      : ManifestPartitioningIndex = cacheKey match {
    // the stats provider rides along because the cached instance also
    // serves later SELECTs of the same version; THIS operation's scan
    // never triggers it (row-level scans push no data filters — a
    // group-based rewrite must read every row of each replaced file)
    case Some((inc, v)) =>
      LakeTable.cachedIndex(lake.root, lakeTable, inc, v, tableSchema,
        () => new ManifestPartitioningIndex(spark, tableDir, entries,
          partSchema, stats = Some(lake.statsProvider(lakeTable))))
    case None =>
      new ManifestPartitioningIndex(spark, tableDir, entries, partSchema,
        stats = Some(lake.statsProvider(lakeTable)))
  }

  /** What the write replaces: the file set the shared scan ULTIMATELY
    * planned. Starts as the full table; runtime group filtering and
    * the final `planInputPartitions` narrow it. Ordering is safe by
    * construction: the group-filter subquery executes strictly before
    * the main scan plans, and the write commits strictly after. */
  private[sources] val replaced =
    new java.util.concurrent.atomic.AtomicReference[Seq[(String, Long)]](
      entries)

  override def command(): RowLevelOperation.Command = cmd

  private lazy val sharedScan =
    new LakeRowLevelScan(spark, tableDir, entries, tableSchema,
      partCols, this)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = sharedScan
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new LakeReplaceWrite(spark, lake,
        lakeTable, info.schema(), partCols, LakeRowLevelOperation.this)
    }

  /** At least one metadata attribute is REQUIRED for group-based
    * writes to receive projected rows at all: Spark tags every
    * ReplaceData row `WRITE_WITH_METADATA_OPERATION` and only the
    * metadata-projecting write task applies the row projection — with
    * no metadata attributes the fallback task hands writers the RAW
    * query rows (operation column included, positions shifted).
    * The partition column doubles as the metadata attribute: it
    * resolves against the relation's own output (no metadata-column
    * machinery), and the writer simply ignores the metadata side —
    * the projected data row already carries it. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    (if (partCols.nonEmpty) partCols else Seq(tableSchema.fieldNames.head))
      .map(c => Expressions.column(c)).toArray

  override def description(): String =
    s"LakeRowLevelOperation($cmd, $lakeTable)"
}

/** The operation's shared scan: plans over the manifest entry set
  * (zero listings), delegates actual parquet reading to Spark's own
  * `ParquetScan` over a [[ManifestPartitioningIndex]], and narrows to
  * matched partitions when the runtime group filter arrives. NO
  * predicate is ever pushed INTO the parquet scan: a group-based
  * rewrite must read every row of each replaced file (a pushed row
  * filter would silently drop the unmatched rows of rewritten files);
  * pruning here is whole-file only, by partition. */
private[graft] class LakeRowLevelScan(
    spark: SparkSession,
    tableDir: Path,
    allEntries: Seq[(String, Long)],
    tableSchema: StructType,
    partCols: Seq[String],
    op: LakeRowLevelOperation) extends Scan with Batch
    with SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  @volatile private var current: Seq[(String, Long)] = allEntries

  private val partSchema =
    StructType(tableSchema.fields.filter(f => partCols.contains(f.name)))
  private val dataSchema =
    StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))

  // rows flow out of the delegate parquet reader data-then-partition;
  // declaring the same order here keeps name-based resolution honest
  override def readSchema(): StructType =
    StructType(dataSchema.fields ++ partSchema.fields)

  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    partCols.map(c => Expressions.column(c)).toArray

  /** The runtime group filter: `chain_name IN (matched values)` /
    * `chain_name = v`. Unparseable predicates prune nothing (the
    * write then conservatively replaces more than needed — correct,
    * never lossy). */
  override def filter(predicates: Array[Predicate]): Unit = {
    val chains = predicates.flatMap(chainValues)
    if (predicates.nonEmpty && predicates.forall(p =>
        chainValues(p).isDefined)) {
      val keep = chains.flatten.flatten.toSet
      current = allEntries.filter(e => keep.contains(chainOf(e._1)))
      op.replaced.set(current)
    }
  }

  private def chainOf(path: String): String =
    path.split('/').collectFirst {
      case seg if seg.startsWith("chain_name=") =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.stripPrefix("chain_name="))
    }.getOrElse("")

  /** Some(values) when the predicate is an IN/= on chain_name over
    * string literals; None = can't prune on it. */
  private def chainValues(p: Predicate): Option[Seq[Option[String]]] = {
    def ref(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case r: NamedReference =>
        r.fieldNames.sameElements(Array("chain_name"))
      case _ => false
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Option[String]] = e match {
      case l: V2Literal[_] if l.dataType == StringType =>
        Some(Option(l.value).map(_.toString))
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && ref(p.children().head) =>
        val vs = p.children().tail.map(lit)
        if (vs.forall(_.isDefined)) Some(vs.flatten.toSeq) else None
      case "=" if p.children().length == 2 =>
        if (ref(p.children()(0))) lit(p.children()(1)).map(Seq(_))
        else if (ref(p.children()(1))) lit(p.children()(0)).map(Seq(_))
        else None
      case _ => None
    }
  }

  /** Manifest-summed statistics for the rewrite's source-vs-target
    * join sizing: without them the `MERGE` target scan defaults to
    * `spark.sql.defaultSizeInBytes` and a tiny lake target merged
    * against a large source misses its broadcast. Same compression
    * factor Spark's own `FileScan.estimateStatistics` applies. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val bytes = (current.map(_._2).sum *
      spark.sessionState.conf.fileCompressionFactor).toLong
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  // the delegate is rebuilt if the entry set narrowed between calls
  // (planInputPartitions and createReaderFactory must agree); the
  // UNFILTERED set serves its index from the catalog's per-version
  // cache through the operation (full-table statements skip the
  // O(files) rebuild)
  @volatile private var built: (Seq[(String, Long)], Batch) = _
  private def delegate: Batch = synchronized {
    val snap = current
    if (built == null || (built._1 ne snap)) {
      val index =
        if (snap eq allEntries) op.fullIndex(partSchema)
        else new ManifestPartitioningIndex(spark, tableDir, snap,
          partSchema)
      built = (snap, ParquetScanBuilder(spark, index, tableSchema,
        dataSchema, CaseInsensitiveStringMap.empty()).build().toBatch)
    }
    built._2
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.replaced.set(current)
    delegate.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.createReaderFactory()

  override def description(): String =
    s"LakeRowLevelScan(${tableDir.getName}, files=${current.size})"
}

/** The operation's write: Spark's own parquet write path (dynamic
  * partition writers + the Hadoop commit protocol) staged under the
  * lake's `_tmp`, then one manifest transaction replacing exactly the
  * files the paired scan planned. */
private[graft] class LakeReplaceWrite(
    spark: SparkSession,
    lake: Lake,
    lakeTable: String,
    writeSchema: StructType,
    partCols: Seq[String],
    op: LakeRowLevelOperation) extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** Rows must arrive SORTED by the partition columns within each
    * task: the dynamic-partition writer runs in sorted mode (one open
    * file, rolls on partition change) and a revisited partition would
    * re-mint the SAME filename — a task-level FileAlreadyExists crash.
    * Inner/left-semi rewrite joins usually cluster rows by accident;
    * the full-outer plan a `WHEN NOT MATCHED BY SOURCE` MERGE builds
    * interleaves partitions and exposed it. Ordering only, NO
    * distribution requirement: a task-local sort suffices (different
    * tasks writing one partition mint distinct task-attempt
    * filenames), and a clustered distribution would add a full
    * shuffle to every rewrite. */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.unspecified()

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    partCols.map(c => Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      .toArray

  override def toBatch: BatchWrite = {
    require(partCols.forall(writeSchema.fieldNames.contains),
      s"row-level write of $lakeTable is missing partition column(s) " +
        partCols.filterNot(writeSchema.fieldNames.contains).mkString(", "))
    val tmp = lake.stagingPath(s"replace-$lakeTable")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val job = Job.getInstance(hadoopConf)
    job.setOutputKeyClass(classOf[Void])
    job.setOutputValueClass(classOf[org.apache.spark.sql.catalyst
      .InternalRow])
    org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
      .setOutputPath(job, tmp)
    val committer = org.apache.spark.internal.io.FileCommitProtocol
      .instantiate(classOf[org.apache.spark.internal.io
        .HadoopMapReduceCommitProtocol].getName,
        java.util.UUID.randomUUID().toString, tmp.toString, false)
    committer.setupJob(job)
    val allColumns = writeSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val partitionColumns =
      allColumns.filter(a => partCols.contains(a.name))
    val dataColumns =
      allColumns.filterNot(a => partCols.contains(a.name))
    val format = new ParquetFileFormat()
    val factory = format.prepareWrite(spark, job, Map.empty,
      StructType(dataColumns.map(a =>
        org.apache.spark.sql.types.StructField(a.name, a.dataType,
          a.nullable))))
    val description = new WriteJobDescription(
      java.util.UUID.randomUUID().toString,
      new SerializableConfiguration(job.getConfiguration),
      factory,
      allColumns,
      dataColumns,
      partitionColumns,
      None, // bucketSpec
      tmp.toString,
      Map.empty,
      spark.sessionState.conf.maxRecordsPerFile,
      spark.sessionState.conf.sessionLocalTimeZone,
      Seq.empty)
    val delegate = new FileBatchWrite(job, description, committer)

    new BatchWrite {
      // the Hadoop commit protocol coordinates task commits itself;
      // double coordination (the V2 layer authorizing one attempt id,
      // the MR layer asking with another) denies every task — same
      // reason Spark's own FileBatchWrite disables it
      override def useCommitCoordinator(): Boolean = false

      override def createBatchWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.DataWriterFactory =
        LakeMetadataTolerantWriterFactory(
          FileWriterFactory(description, committer))

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        // step 1: the file commit - staged part files land under
        // tmp/chain_name=... (task-attempt arbitration handled by the
        // Hadoop commit protocol, exactly as Spark's own writes)
        delegate.commit(messages)
        // step 2: the lake commit - one manifest transaction removing
        // the scanned files and adding the staged replacements;
        // retained, so pinned pre-update reads survive until vacuum
        lake.replaceStaged(lakeTable, tmp,
          removedAbs = op.replaced.get().map(_._1), retain = true)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        try delegate.abort(messages)
        finally lake.dropStaging(tmp)
      }
    }
  }

  override def description(): String = s"LakeReplaceWrite($lakeTable)"
}

/** Spark's metadata-projecting write task feeds group-based writers
  * through the TWO-argument `write(metadata, row)` (every ReplaceData
  * row is tagged WRITE_WITH_METADATA_OPERATION); the file writers
  * behind [[FileWriterFactory]] only implement the one-argument form.
  * This wrapper drops the metadata side — the projected data row
  * already carries the partition column the operation declared. */
private[graft] case class LakeMetadataTolerantWriterFactory(
    delegate: FileWriterFactory)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val d = delegate.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      override def write(record: org.apache.spark.sql.catalyst.InternalRow)
          : Unit = d.write(record)
      override def write(metadata: org.apache.spark.sql.catalyst.InternalRow,
                         record: org.apache.spark.sql.catalyst.InternalRow)
          : Unit = d.write(record)
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
      override def currentMetricsValues()
          : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        d.currentMetricsValues()
    }
  }
}
