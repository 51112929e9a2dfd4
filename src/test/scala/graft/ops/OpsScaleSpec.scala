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

  test("rangedForwardFill parallelizes: more than one bucket actually used") {
    val ev = Tables.events(spark, dir)
      .withColumn("pv", when(col("event_type") === "purchase", col("value")))
    val bounds = ev.stat.approxQuantile("ts_us",
      (1 until 16).map(_.toDouble / 16).toArray, 0.001)
    assert(bounds.distinct.length > 8, "quantile boundaries should spread")
  }
}
