package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo => CatalystEqualTo, Expression, In => CatalystIn, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType

/** Dynamic FILE pruning for lake scans — the Delta "dynamic file
  * pruning" / Iceberg runtime-filtering feature, re-expressed through
  * Spark's own DSv2 seam ([[SupportsRuntimeFiltering]], SPARK-35779):
  * when a lake table is the probe side of a join whose build side
  * carries a selective filter, Spark's `PartitionPruning` rule plants
  * a dynamic-pruning subquery, and at execution `BatchScanExec` hands
  * this scan the build side's ACTUAL join-key values as an `IN`
  * filter before planning input partitions. The values route into the
  * scan's own filter sets:
  *
  *  - partition columns (`chain_name`) append to `partitionFilters` —
  *    classic dynamic PARTITION pruning (Spark 4.1's stock `FileScan`
  *    does not implement the runtime-filtering interfaces, so without
  *    this wrapper the DSv2 lake path gets no DPP at all);
  *  - stats-covered data columns append to `dataFilters`, which
  *    [[graft.plans.ManifestPartitioningIndex.listFiles]] compiles
  *    through [[graft.plans.DataSkipping]] — the runtime IN-set
  *    binary-searches each file's persisted [min, max] envelope and
  *    whole FILES drop before a single task is scheduled.
  *
  * At 100 TB this is the star-join lever: a fact table clustered on
  * the join key (append order, z-order, or explicit clustering)
  * schedules O(files matching the dim side's surviving keys), not
  * O(table). Pruning is reduction-only and provable — an
  * untranslatable runtime predicate, a column without stats, or a
  * file without bounds costs pruning, never correctness (Spark
  * re-evaluates the join itself; the scan only needs to return a
  * superset).
  *
  * The wrapper is otherwise transparent: every Scan surface delegates
  * to the wrapped [[ParquetScan]], and `filter(...)` swaps in a copy
  * with the extra conjuncts (Spark re-calls `toBatch` after
  * filtering, so the new file listing takes effect). `filterAttributes`
  * lists only columns surviving column pruning: Spark RESOLVES every
  * name in the list against the scan relation's output and throws on
  * a miss (`V2ExpressionUtils.resolveRefs`), so advertising a
  * pruned-away column would fail unrelated queries outright.
  */
private[graft] class RuntimeSkippingScan(
    initial: ParquetScan,
    tableSchema: StructType,
    partCols: Set[String],
    statsCols: Set[String])
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics
  with org.apache.spark.sql.internal.connector.SupportsMetadata {

  @volatile private var current: ParquetScan = initial

  override def readSchema(): StructType = current.readSchema()
  override def toBatch: Batch = current.toBatch
  override def estimateStatistics(): Statistics =
    current.estimateStatistics()
  override def description(): String = current.description()
  override def getMetaData(): Map[String, String] = current.getMetaData()

  override def filterAttributes(): Array[NamedReference] = {
    val visible = current.readSchema().fieldNames.toSet
    (partCols ++ statsCols).filter(visible).toArray.sorted
      .map(Expressions.column)
  }

  /** Spark's materialized runtime filters (V2 predicates arrive
    * through [[SupportsRuntimeFiltering]]'s default V1 conversion).
    * NULL values drop from IN-sets before translation: a null join
    * key equi-joins nothing, and [[graft.plans.DataSkipping]]'s
    * min/max envelopes describe non-null values only. */
  override def filter(filters: Array[Filter]): Unit = {
    var pf = List.empty[Expression]
    var df = List.empty[Expression]
    def add(name: String, mk: AttributeReference => Expression): Unit =
      tableSchema.fields.find(_.name == name).foreach { f =>
        val a = AttributeReference(f.name, f.dataType, f.nullable)()
        if (partCols(name)) pf ::= mk(a) else df ::= mk(a)
      }
    filters.foreach {
      case In(col, values) =>
        val vs = values.filter(_ != null)
        if (vs.nonEmpty) add(col, a =>
          CatalystIn(a, vs.toSeq.map(v => Literal.create(v, a.dataType))))
      case EqualTo(col, v) if v != null =>
        add(col, a => CatalystEqualTo(a, Literal.create(v, a.dataType)))
      case _ => () // reduction-only: unhandled costs pruning, never rows
    }
    if (pf.nonEmpty || df.nonEmpty)
      current = current.copy(
        partitionFilters = current.partitionFilters ++ pf,
        dataFilters = current.dataFilters ++ df)
  }

  // exchange/subquery reuse compares scans for equality — delegate to
  // the wrapped case class so two identical lake scans still dedupe
  override def equals(o: Any): Boolean = o match {
    case r: RuntimeSkippingScan => current == r.current
    case _ => false
  }
  override def hashCode(): Int = current.hashCode()
}
