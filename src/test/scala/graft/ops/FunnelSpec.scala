package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge semantics of the ordered-funnel operator: strict-after
  * ordering, broken funnels, out-of-order stages. */
class FunnelSpec extends SparkSpec {

  test("funnelStages: strict ordering, breaks, and out-of-order events") {
    import spark.implicits._
    val events = Seq(
      // user 1: full funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view — funnel stops at view
      (2L, 10L, "click"), (2L, 20L, "view"),
      // user 3: click at the SAME ts as view — strict '>' rejects it,
      // but a later click continues the funnel
      (3L, 10L, "view"), (3L, 10L, "click"), (3L, 15L, "click"),
      // user 4: purchase without a click — stops after view
      (4L, 10L, "view"), (4L, 20L, "purchase"),
      // user 5: never views — no output row at all
      (5L, 10L, "click"), (5L, 20L, "purchase"),
      // user 6: multiple views; the EARLIEST anchors the funnel
      (6L, 50L, "view"), (6L, 5L, "view"), (6L, 7L, "click")
    ).toDF("user_id", "ts_us", "event_type")
    val out = Ops.funnelStages(events, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("stages_reached"))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(20L), None, None, 1L)))
    assert(out(3L) == ((Some(10L), Some(15L), None, 2L)))
    assert(out(4L) == ((Some(10L), None, None, 1L)))
    assert(!out.contains(5L))
    assert(out(6L) == ((Some(5L), Some(7L), None, 2L)))
  }

  test("retentionCohorts: first-period anchoring, distinct per period") {
    import spark.implicits._
    val p = 100L // period
    val events = Seq(
      // user 1: cohort 0, active periods 0, 1, 1 (dup), 3
      (1L, 10L), (1L, 150L), (1L, 199L), (1L, 310L),
      // user 2: cohort 1, active periods 1, 2
      (2L, 100L), (2L, 250L),
      // user 3: cohort 0, active only period 0
      (3L, 50L)
    ).toDF("user_id", "ts_us")
    val got = Ops.retentionCohorts(events, "user_id", "ts_us", p)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L,  // users 1 and 3 in cohort 0, offset 0
      (0L, 1L) -> 1L,  // user 1 (period 1 counted once despite 2 events)
      (0L, 3L) -> 1L,  // user 1
      (1L, 0L) -> 1L,  // user 2
      (1L, 1L) -> 1L)) // user 2
  }

  test("retentionCohorts: FLOOR period bucketing for pre-epoch timestamps") {
    import spark.implicits._
    // ts −50 is period −1 under floor division; truncating div would
    // merge [−99, 99] into one double-width bucket around the origin
    val events = Seq((1L, -50L), (2L, 50L)).toDF("user_id", "ts_us")
    val got = Ops.retentionCohorts(events, "user_id", "ts_us", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((-1L, 0L) -> 1L, (0L, 0L) -> 1L))
  }
}
