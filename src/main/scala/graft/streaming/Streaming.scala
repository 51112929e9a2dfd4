package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming forms of the engine's incremental semantics
  * (SURVEY.md §2.9). The reference's ingest loop is batch; these are
  * the streaming equivalents for a lake that receives continuous file
  * drops: watermarked windowed aggregation (the streaming `resample`,
  * A7) and an exactly-once file-stream → lake appender
  * (`Trigger.AvailableNow` ≈ the reference's run-to-completion pull).
  */
object Streaming {

  /** File-source stream over a directory of parquet drops. */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Streaming resample: per-window aggregates with a watermark bound
    * on state (late rows beyond `lateness` are dropped — the streaming
    * answer to the reference's desync guard, state.py:103–106). */
  def resample(events: DataFrame, tsCol: String, every: String,
               lateness: String, aggs: Seq[org.apache.spark.sql.Column],
               keys: Seq[String] = Seq.empty): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy((window(col(tsCol), every).as("bucket") +:
        keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Incremental lake append: every file dropped into `srcDir` lands in
    * the destination exactly once (file-source checkpointing replaces
    * the reference's max-block resume scan). `AvailableNow` processes
    * the current backlog then stops — run it on a schedule for the
    * reference's batch-pull cadence, or switch the trigger for 24/7. */
  def lakeAppendStream(src: DataFrame, destDir: String,
                       checkpointDir: String,
                       partitionCols: Seq[String]): DataStreamWriter[Row] =
    src.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(partitionCols: _*)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
}
