package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a new session starts
  * when the gap to the previous event (per entity) exceeds
  * `gapMicros`. Two windows over the same (entity, time) partitioning
  * — Spark plans a single sort+shuffle, parallel over entities. */
object Sessionize {

  def sessionIds(df: DataFrame, entity: String, tsUs: String,
                 order: Seq[Column], gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
    val prev = lag(col(tsUs), 1).over(w)
    df.withColumn("session_id",
      sum(when(prev.isNull || col(tsUs) - prev > gapMicros, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start time, event count, value sum. The sum is
    * integerized to cents per-row BEFORE aggregating (floor(x*100+0.5))
    * so the result is exact integer arithmetic — independent of the
    * partial-aggregation addition order, hence identical across engines
    * and across cluster sizes. */
  def sessions(df: DataFrame, entity: String, tsUs: String,
               order: Seq[Column], gapMicros: Long,
               valueCol: String): DataFrame =
    sessionIds(df, entity, tsUs, order, gapMicros)
      .groupBy(col(entity), col("session_id"))
      .agg(min(col(tsUs)).as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("sum_value_c"))
}
