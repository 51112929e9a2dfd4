package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The range-partitioned two-pass fills must equal their single-window
  * (one-task) counterparts bit for bit. */
class OpsScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("rangedForwardFill equals the global single-window forward fill") {
    val ev = Tables.events(spark, dir)
      .withColumn("pv", when(col("event_type") === "purchase", col("value")))
      .select(col("ts_us"), col("event_id"), col("pv"))

    val global = Ops.forwardFill(ev, Seq("pv"),
        order = Seq(col("ts_us"), col("event_id")), partition = Seq.empty)
      .orderBy(col("ts_us"), col("event_id")).collect()
    val ranged = Ops.rangedForwardFill(ev, Seq("pv"), on = "ts_us",
        order = Seq(col("event_id")), numBuckets = 16)
      .orderBy(col("ts_us"), col("event_id")).collect()

    assert(global.length == ranged.length)
    global.zip(ranged).foreach { case (g, r) => assert(g == r, s"$g vs $r") }
  }

  test("asofJoinRanged equals asofJoin on a keyless backward join") {
    val ev = Tables.events(spark, dir)
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("ts_us"), col("event_id"))
    val right = Ops.lastPerKey(ev.filter(col("event_type") === "login"),
        keys = Seq(col("ts_us")), order = Seq(col("event_id")))
      .select(col("ts_us"), col("value"))

    val plain = Ops.asofJoin(left, right, on = "ts_us", by = Seq.empty,
        valueCols = Seq("value"))
      .orderBy(col("ts_us"), col("event_id")).collect()
    val ranged = Ops.asofJoinRanged(left, right, on = "ts_us",
        valueCols = Seq("value"), numBuckets = 16)
      .orderBy(col("ts_us"), col("event_id")).collect()

    assert(plain.length == ranged.length && plain.nonEmpty)
    plain.zip(ranged).foreach { case (p, r) => assert(p == r, s"$p vs $r") }
  }

  test("saltedAgg equals the direct aggregation") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("v_c"),
        max(col("ts_us")).as("last_us"))
      .orderBy(col("event_type")).collect()
    val salted = Ops.saltedAgg(ev, keys = Seq(col("event_type")),
        saltBy = col("event_id"), salts = 8,
        partialAggs = Seq(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("v_c"),
          max(col("ts_us")).as("last_us")),
        finalAggs = Seq(sum(col("n")).as("n"), sum(col("v_c")).as("v_c"),
          max(col("last_us")).as("last_us")))
      .orderBy(col("event_type")).collect()
    assert(direct.length == salted.length && direct.sameElements(salted))
  }

  test("quantileNearestAgg matches Polars quantile(0.5, nearest) ranks") {
    import spark.implicits._
    // (group, values, expected nearest-median): odd n → middle element,
    // even n → upper-middle (round-half-away of the fractional index)
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L),                 // n=3 → 20
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L),         // n=4 → 3
      ("c", 7L),                                          // n=1 → 7
      ("d", 5L), ("d", 1L)                                // n=2 → 5 (sorted upper)
    ).toDF("g", "v")
    val got = df.groupBy(col("g")).agg(Ops.quantileNearestAgg(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 20L, "b" -> 3L, "c" -> 7L, "d" -> 5L), got.toString)
  }

  test("rangedForwardFill parallelizes: more than one bucket actually used") {
    val ev = Tables.events(spark, dir)
      .withColumn("pv", when(col("event_type") === "purchase", col("value")))
    val bounds = ev.stat.approxQuantile("ts_us",
      (1 until 16).map(_.toDouble / 16).toArray, 0.001)
    assert(bounds.distinct.length > 8, "quantile boundaries should spread")
  }
}
