package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Per-file row selection against deletion vectors ([[graft.v3.Dv]]):
  * `selected(_metadata.file_path, _metadata.row_index)` — the scan
  * filter the lake plans over exactly its DV-bearing files. Two
  * selection modes per file:
  *
  *  - [[ExcludeDv]] (the scan path): a row is selected when its
  *    position is NOT in the file's deletion vector. The vector loads
  *    LAZILY ON THE EXECUTOR (one small sidecar read per file per JVM,
  *    cached in [[graft.v3.Dv.positions]]) — the task closure carries
  *    only the vector PATH, so a wide scan over many DV'd files never
  *    serializes every vector through the driver (Delta's DV
  *    descriptor design).
  *  - [[IncludePositions]] (the CDC diff legs): a row is selected when
  *    its position IS in the carried array — churn-sized by
  *    construction ("rows newly deleted by this commit"), so the
  *    positions ride in the plan directly.
  *
  * Codegen'd: one virtual call + binary search per row, only on the
  * DV'd sub-scan; whole-stage codegen spans stay intact. The per-row
  * hot path memoizes the CURRENT file's vector per thread (file_path
  * is constant across a parquet split's rows), so the map lookup and
  * path normalization run once per file change, not per row.
  */
sealed trait DvSel extends Serializable
/** Selected = position NOT in the vector at `dvPath` (survivors). */
final case class ExcludeDv(dvPath: String) extends DvSel
/** Selected = position IS in `positions` (sorted ascending). */
final case class IncludePositions(positions: Array[Long]) extends DvSel

case class DvRowSelect(
    left: Expression,  // file path (string)
    right: Expression, // row index (long)
    files: Map[String, DvSel], // normalized URI path -> selection
    conf: SerializableConfiguration)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_dv_select"

  // (current file, its positions or null, include mode) per thread:
  // expression instances are shared across an executor's concurrent
  // tasks under whole-stage codegen, so the memo must be thread-local
  @transient private lazy val memo =
    new ThreadLocal[DvRowSelect.Memo] {
      override def initialValue(): DvRowSelect.Memo = new DvRowSelect.Memo
    }

  def selected(file: UTF8String, idx: Long): Boolean = {
    val m = memo.get()
    if (m.file == null || !m.file.equals(file)) {
      m.file = file.clone()
      val key = new org.apache.hadoop.fs.Path(file.toString).toUri.getPath
      files.get(key) match {
        case Some(ExcludeDv(dvPath)) =>
          m.positions = graft.v3.Dv.positions(conf.value, dvPath)
          m.include = false
        case Some(IncludePositions(ps)) =>
          m.positions = ps
          m.include = true
        case None => // no vector for this file: every row selected
          m.positions = null
          m.include = false
      }
    }
    if (m.positions == null) true
    else {
      val in = java.util.Arrays.binarySearch(m.positions, idx) >= 0
      if (m.include) in else !in
    }
  }

  override protected def nullSafeEval(f: Any, i: Any): Any =
    selected(f.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvSelect", this)
    nullSafeCodeGen(ctx, ev, (f, i) =>
      s"${ev.value} = $ref.selected($f, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvRowSelect {
  private[functions] final class Memo {
    var file: UTF8String = _
    var positions: Array[Long] = _
    var include: Boolean = false
  }

  val Name = "graft_dv_select"

  /** Per-plan selection specs handed to the analysis-time builder by
    * a string-literal handle (a Map can't ride through call_function
    * as a Column). Entries are consumed at analysis — the resolved
    * expression instance carries the spec itself — so the registry
    * only bridges creation-to-analysis; bounded oldest-first. */
  private val specs = new java.util.concurrent.ConcurrentHashMap[
    String, (Map[String, DvSel], SerializableConfiguration)]()
  private val specOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => {
        val id = exprs(2) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"$Name spec handle must be a string literal, got $other")
        }
        val (files, conf) = Option(specs.get(id)).getOrElse(
          throw new IllegalStateException(
            s"$Name spec $id expired - plan re-analysis outlived the " +
              "bounded spec registry (rebuild the DataFrame)"))
        DvRowSelect(exprs(0), exprs(1), files, conf)
      }, "built-in")

  /** A Column selecting rows per `files` — registers the function
    * idempotently and stashes the spec for the analysis-time builder. */
  def selectCol(spark: SparkSession, file: Column, idx: Column,
                files: Map[String, DvSel],
                conf: SerializableConfiguration): Column = {
    register(spark)
    val id = java.util.UUID.randomUUID().toString
    specs.put(id, (files, conf))
    specOrder.synchronized {
      specOrder.add(id)
      while (specs.size > 256) {
        val oldest = specOrder.poll()
        if (oldest == null) specs.clear()
        else specs.remove(oldest)
      }
    }
    call_function(Name, file, idx, lit(id))
  }
}
