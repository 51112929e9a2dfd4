package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Error-bound and merge contracts of the histogram quantile sketch
  * (the oracle row checks exact content; these check the estimator's
  * guarantees against the exact per-group percentiles). */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))

  test("estimates land within one bin width of the exact percentile") {
    val events = Tables.events(spark, dir)
    val width = 500L
    val est = Ops.histogramQuantiles(events, Seq(col("event_type")),
        floor(col("value") * 100 + 0.5).cast("long"),
        loC = 0L, hiC = 50000L, nBins = 100, quantiles = qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact rank-based percentile per group, computed by brute force:
    // the smallest value v with |{x <= v}| >= ceil(q * n)
    val byGroup = events
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byGroup.foreach { case (g, sorted) =>
      val (e50, e90, e99) = est(g)
      qs.zip(Seq(e50, e90, e99)).foreach { case ((name, num, den), e) =>
        val target = (sorted.length * num + den - 1) / den
        val exact = sorted(target.toInt - 1)
        // the estimate is the lower bound of the bin holding the exact
        // rank value: exact - width < e <= exact
        assert(e <= exact && exact - e < width,
          s"$g $name: est $e vs exact $exact (width $width)")
      }
    }
  }

  test("sketch merges: union of two halves equals the whole") {
    val events = Tables.events(spark, dir)
    def hist(df: org.apache.spark.sql.DataFrame) =
      Ops.histogramQuantiles(df, Seq(col("event_type")),
        floor(col("value") * 100 + 0.5).cast("long"),
        loC = 0L, hiC = 50000L, nBins = 100, quantiles = qs)
    val whole = hist(events)
    // additivity: computing over the UNION of two disjoint halves is
    // the same frame — the (group, bin) counts merge by addition, the
    // defining property of a mergeable sketch
    val halves = hist(events.filter(pmod(col("event_id"), lit(2)) === 0)
      .unionByName(events.filter(pmod(col("event_id"), lit(2)) === 1)))
    assert(whole.exceptAll(halves).isEmpty && halves.exceptAll(whole).isEmpty)
  }

  test("clamping: out-of-range values land in the edge bins") {
    val df = Seq(("a", -50L), ("a", 999999L), ("a", 250L)).toDF("g", "vc")
    val r = Ops.histogramQuantiles(df, Seq(col("g")), col("vc"),
        loC = 0L, hiC = 1000L, nBins = 10,
        quantiles = Seq(("p01", 1L, 100L), ("p99", 99L, 100L)))
      .collect().head
    assert(r.getLong(1) == 3L)   // n_total
    assert(r.getLong(2) == 0L)   // p01 -> clamped low bin, bound 0
    assert(r.getLong(3) == 900L) // p99 -> clamped high bin, bound 900
  }
}
