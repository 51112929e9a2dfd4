package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.v3.Lake

/** The lake's pure-SQL STREAMING WRITE surface —
  * `df.writeStream.format("lake")`: every micro-batch lands as one
  * lake manifest transaction (append or keyed upsert), so the
  * streaming story is SQL-complete on both ends (the `lake-changes`
  * source reads the commit log this sink writes).
  *
  * Options:
  *  - `root`, `table` (required);
  *  - `mode` = `append` (default) | `upsert`;
  *  - `keys` (comma list) — required for upsert, must include
  *    `chain_name` (the upsert contract);
  *  - `orderBy` (comma list) — when set, each batch is compacted to
  *    its latest row per key ([[graft.ops.Ops.lastPerKey]]) before
  *    the upsert; without it the batch must already be unique per
  *    key (the upsert's uniqueness gate fails fast otherwise);
  *  - `deleteCol` — boolean column marking delete rows (upsert mode);
  *  - `retain` = true|false (default false) — keep replaced files in
  *    the retention area so pinned reads survive the stream;
  *  - `txnAppId` — stable sink identity for idempotence; defaults to
  *    the query's `checkpointLocation` (present whenever a real
  *    checkpoint is configured).
  *
  * EXACTLY-ONCE across restarts: Structured Streaming replays the
  * last un-acknowledged batch after a crash. A replayed batchId ≤
  * the durable high-water ([[graft.v3.Lake.lastSinkBatch]]: the
  * `#txn=appId:batchId` commit header written ATOMICALLY with the
  * append's manifest publish, plus the post-commit progress marker
  * under `_streamtxn/`) is skipped wholesale — so appends never
  * double-apply, and upserts (already idempotent per batch) never
  * pay a second rewrite.
  *
  * 100 TB shape: the micro-batch plan executes ONCE (the incremental
  * plan materializes through a localCheckpoint in upsert mode, whose
  * planner runs several jobs over the batch); the lake write is the
  * only table-scale I/O and it is file-grain copy-on-write, sized by
  * the batch's key spread, never by table size. */
class LakeSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "lake"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    def req(k: String): String = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"lake sink needs option '$k'"))
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "upsert",
      s"lake sink mode must be 'append' or 'upsert' (got '$mode')")
    require(outputMode != OutputMode.Complete(),
      "lake sink does not support Complete output mode - a lake table " +
        "is a log, not a replaceable materialization; use append/update")
    val keys = parameters.get("keys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    if (mode == "upsert") require(keys.nonEmpty,
      "lake sink in upsert mode needs option 'keys' " +
        "(comma-separated, including chain_name)")
    val orderBy = parameters.get("orderBy")
      .orElse(parameters.get("orderby"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("txnappid"))
      .orElse(parameters.get("checkpointLocation"))
      .orElse(parameters.get("checkpointlocation"))
      .getOrElse(throw new IllegalArgumentException(
        "lake sink needs a stable identity for exactly-once: set " +
          "option 'txnAppId' (or a 'checkpointLocation', which is " +
          "used by default)"))
    new LakeSink(sqlContext.sparkSession, req("root"), req("table"),
      mode, keys, orderBy,
      parameters.get("deleteCol").orElse(parameters.get("deletecol")),
      parameters.get("retain").exists(_.equalsIgnoreCase("true")),
      appId)
  }
}

private[graft] class LakeSink(
    spark: SparkSession,
    root: String,
    table: String,
    mode: String,
    keys: Seq[String],
    orderBy: Seq[String],
    deleteCol: Option[String],
    retain: Boolean,
    appId: String) extends Sink {

  private val lake = new Lake(spark, root)

  /** Test seam: batches skipped as already-durable (replay). */
  private[graft] val skips = new java.util.concurrent.atomic.AtomicLong

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (batchId <= lake.lastSinkBatch(table, appId)) {
      // replayed batch (crash between the sink's commit and the
      // engine's own commit log) - already durable, skip wholesale
      skips.incrementAndGet()
      return
    }
    // materialize the micro-batch as a BATCH frame: the incremental
    // plan Spark hands a V1 sink cannot be re-planned with batch
    // transforms (the classic addBatch pitfall), so convert its
    // InternalRow RDD explicitly - one pass, batch-sized
    val schema = data.schema
    val converter = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
    val rows = data.queryExecution.toRdd
      .map(ir => converter(ir).asInstanceOf[Row])
    val df = spark.createDataFrame(rows, schema)
    mode match {
      case "append" =>
        // the #txn header lands atomically with the manifest publish
        lake.append(df, table, Some((appId, batchId)))
      case "upsert" =>
        // localCheckpoint: the upsert planner runs several jobs over
        // the batch (uniqueness/profiling/key collect + merge write);
        // re-executing the micro-batch source per job would re-read it
        val compacted =
          if (orderBy.nonEmpty)
            graft.ops.Ops.lastPerKey(df, keys.map(col), orderBy.map(col))
              .localCheckpoint()
          else df.localCheckpoint()
        // #txn header atomic with the merge's manifest publish — same
        // exactly-once window closure as append mode; without it a
        // crash between publish and recordSinkBatch replays the batch
        // as a duplicate data-changing commit in the CDC log
        lake.upsertRetrying(compacted, table, keys,
          deleteCol = deleteCol,
          checkUnique = orderBy.isEmpty, // lastPerKey just guaranteed it
          retain = retain,
          txn = Some((appId, batchId)))
        ()
    }
    lake.recordSinkBatch(table, appId, batchId)
  }

  override def toString: String = s"LakeSink($root/$table, $mode)"
}
