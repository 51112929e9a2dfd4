package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.ManifestPartitioningIndex
import graft.v3.Lake

/** The lake's pure-SQL surface: a DataSourceV2 [[TableCatalog]] whose
  * tables plan through the manifest-served
  * [[graft.plans.ManifestPartitioningIndex]] — `SELECT … FROM
  * lake.nfp` costs ZERO driver filesystem listings, and Spark's native
  * time-travel syntax `VERSION AS OF v` replays a pinned snapshot
  * ([[graft.v3.Lake.readAt]]'s live/retired resolution). Register:
  *
  * {{{
  *   spark.sql.catalog.lake      = graft.sources.LakeCatalog
  *   spark.sql.catalog.lake.root = /path/to/lake
  * }}}
  *
  * Reads only: the lake's writes are manifest TRANSACTIONS
  * (optimistic concurrency, commit lock, retention) that plain
  * `INSERT INTO` cannot express, so `createTable`/`alterTable`/
  * `renameTable` refuse loudly and point at the Lake API. `DROP
  * TABLE` maps to [[graft.v3.Lake.dropTable]] — it IS a lake
  * transaction. Each `loadTable` binds the THEN-current manifest
  * version: a SQL query is a consistent snapshot read, exactly like
  * the Scala `lake.read`. */
class LakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def lake: Lake = LakeCatalog.lakeFor(SparkSession.active, root)

  /** The lake is flat (one directory per table): accept the empty
    * namespace and a cosmetic `default`. */
  private def tableOf(ident: Identifier): String = {
    val ns = ident.namespace()
    if (!(ns.isEmpty || ns.sameElements(Array("default"))))
      throw new NoSuchTableException(ident)
    ident.name()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    lake.manifestTables
      .map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `VERSION AS OF v`: Spark routes the literal here. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val t = tableOf(ident)
    if (!lake.exists(t) && !lake.hasManifest(t))
      throw new NoSuchTableException(ident)
    val entries = version match {
      case None => lake.currentEntries(t)
      case Some(v) => lake.snapshotEntries(t, v)
    }
    new LakeTable(s"$catalogName.$t", SparkSession.active,
      new Path(s"$root/$t"), entries, lake.effectiveSchema(t),
      Seq("chain_name"))
  }

  override def tableExists(ident: Identifier): Boolean =
    try { val t = tableOf(ident); lake.exists(t) || lake.hasManifest(t) }
    catch { case _: NoSuchTableException => false }

  override def dropTable(ident: Identifier): Boolean =
    try lake.dropTable(tableOf(ident))
    catch { case _: NoSuchTableException => false }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "lake tables are created by writing through the Lake API " +
        "(append/upsert/createTable) - its writes are manifest " +
        "transactions that SQL DDL cannot express")

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter lake tables through Lake.evolveSchema / setTableProperties")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "lake tables cannot be renamed through SQL")
}

object LakeCatalog {
  /** One [[Lake]] per (session, root): keeps the manifest fold cache
    * warm across queries — a per-query instance would re-fold the
    * commit log every SELECT. Also the test seam for asserting
    * zero-listing SQL plans (`lakeFor(spark, root).listCalls`). */
  private val lakes = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Lake]()
  private[graft] def lakeFor(spark: SparkSession, root: String): Lake =
    lakes.computeIfAbsent((spark, root), k => new Lake(k._1, k._2))
}

/** One lake table bound to a fixed manifest version: schema from the
  * lake's schema registry, scan built by Spark's own DSv2 parquet
  * machinery over the manifest-served index (predicate pushdown,
  * column pruning, partition pruning — all from metadata). */
private[graft] class LakeTable(
    tableName: String,
    spark: SparkSession,
    tableDir: Path,
    entries: Seq[(String, Long)],
    tableSchema: StructType,
    partCols: Seq[String]) extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = tableSchema

  override def partitioning(): Array[Transform] =
    partCols.map(Expressions.identity).toArray

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val index = new ManifestPartitioningIndex(spark, tableDir, entries,
      StructType(tableSchema.fields.filter(f => partCols.contains(f.name))))
    val dataSchema =
      StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))
    ParquetScanBuilder(spark, index, tableSchema, dataSchema, options)
  }
}
