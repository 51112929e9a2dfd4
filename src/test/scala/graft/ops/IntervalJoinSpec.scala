package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Contracts of the bucketized interval join: pair-exact equality with
  * the naive theta join, no duplicate pairs at bucket boundaries, and
  * the plan shape the whole operator exists for — an equi-join, not a
  * BroadcastNestedLoopJoin/Cartesian. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def sides() = {
    val ev = Tables.events(spark, dir)
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts_us").as("lo"),
        (col("ts_us") + 300000000L).as("hi"))
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("p_ts"))
    (points, intervals)
  }

  test("matches the naive theta join pair-for-pair, at several widths") {
    val (points, intervals) = sides()
    val naive = points.join(intervals,
        col("p_ts") >= col("lo") && col("p_ts") < col("hi"))
      .select(col("incident_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    // widths below, at, and above the interval length — including one
    // that does not divide it, so intervals straddle bucket edges
    for (w <- Seq(7000001L, 60000000L, 300000000L, 1000000000L)) {
      val got = Ops.intervalJoin(points, intervals, "p_ts", "lo", "hi", w)
        .select(col("incident_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"width $w produced dup pairs")
      assert(got.toSet === naive, s"width $w diverged from theta join")
    }
  }

  test("zero-length intervals match nothing") {
    val (points, _) = sides()
    val degenerate = Seq((1L, 5000000L, 5000000L))
      .toDF("incident_id", "lo", "hi")
    val got = Ops.intervalJoin(points, degenerate, "p_ts", "lo", "hi",
      1000000L)
    assert(got.count() === 0L)
  }

  test("plans an equi-join on the bucket, not a nested loop") {
    val (points, intervals) = sides()
    val plan = Ops.intervalJoin(points, intervals, "p_ts", "lo", "hi",
      300000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("Cartesian"), s"nested loop in plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"expected an equi-join operator in plan:\n$plan")
  }
}
