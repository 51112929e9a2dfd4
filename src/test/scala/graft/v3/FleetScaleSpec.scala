package graft.v3

import org.apache.spark.sql.functions._
import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fleet-scale variants and property tests (SURVEY.md §7.4 risk #2:
  * the reference's windows are global; our byPool variants must give
  * identical per-pool answers while partitioning every shuffle). */
class FleetScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling from a Gen (no scalatest-scalacheck bridge
    * in the offline cache; a fixed seed keeps runs reproducible). */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] = {
    var seed = Seed(42L)
    (0 until n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  test("createLiqBy over a multi-pool frame matches per-pool createLiq") {
    val mb = spark.read
      .schema(Schemas.mintBurn)
      .parquet("/root/reference/v3/data/examples/pool_mint_burn_events/example.parquet")
      .withColumn("amount", col("amount").cast("double"))
      .withColumn("tick_lower", col("tick_lower").cast("long"))
      .withColumn("tick_upper", col("tick_upper").cast("long"))
      .withColumn("type_of_event", col("type_of_event").cast("double"))
      .withColumn("as_of", col("block_number") + col("transaction_index") / lit(1e4))
      .filter(col("as_of") < 12376625.0)

    val pools = mb.select("address").distinct().as[String].collect().sorted
    assert(pools.length >= 2, "fixture should hold several pools")

    val fleet = Liquidity.createLiqBy(mb, Seq("address"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq)
      .toMap

    for (p <- pools.take(5)) {
      val single = Liquidity.createLiq(mb.filter(col("address") === p), 12376625.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val got = fleet(p)
      assert(got.map(_._1) == single.map(_._1), s"ticks for $p")
      got.zip(single).foreach { case ((_, a), (_, b)) => assertRel(a, b, 1e-9) }
    }
  }

  test("swapDFBy over a multi-pool frame matches per-pool swapDF, no keyless window") {
    val mb = spark.read
      .schema(Schemas.mintBurn)
      .parquet("/root/reference/v3/data/examples/pool_mint_burn_events/example.parquet")
      .withColumn("amount", col("amount").cast("double"))
      .withColumn("tick_lower", col("tick_lower").cast("long"))
      .withColumn("tick_upper", col("tick_upper").cast("long"))
      .withColumn("type_of_event", col("type_of_event").cast("double"))
      .withColumn("as_of", col("block_number") + col("transaction_index") / lit(1e4))
      .filter(col("as_of") < 12376625.0)
    val liqBy = Liquidity.createLiqBy(mb, Seq("address"))
    val ts = 60L

    val fleetDf = Liquidity.swapDFBy(liqBy, ts, Seq("address"))
    // the whole point: the fleet plan never funnels through a single
    // partition (the keyless window's Exchange SinglePartition)
    val plan = fleetDf.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in fleet plan:\n$plan")
    val fleet = fleetDf.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(2), r.getLong(3), r.getDouble(1),
        r.getDouble(6), r.getDouble(7))).sortBy(t => (t._1, t._2)).toSeq)
      .toMap

    val pools = liqBy.select("address").distinct().as[String].collect().sorted
    for (p <- pools.take(5)) {
      val single = Liquidity.swapDF(
          liqBy.filter(col("address") === p).drop("address"), ts)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(0),
          r.getDouble(5), r.getDouble(6))).sortBy(t => (t._1, t._2)).toSeq
      val got = fleet.getOrElse(p, Seq.empty)
      assert(got.map(t => (t._1, t._2)) == single.map(t => (t._1, t._2)),
        s"tick ranges for $p")
      got.zip(single).foreach { case (a, b) =>
        assertRel(a._3, b._3, 1e-12)
        assertRel(a._4, b._4, 1e-12)
        assertRel(a._5, b._5, 1e-12)
      }
    }
  }

  test("property: tick -> sqrtPriceX96 -> tickFloor round-trips onto the spacing grid") {
    val ticks = Gen.choose(-800000L, 800000L)
    val spacings = Gen.oneOf(1L, 10L, 60L, 200L)
    for ((t, ts) <- samples(Gen.zip(ticks, spacings))) {
      val px96 = math.pow(1.0001, t / 2.0) * SwapMath.Q96
      val floored = SwapMath.priceX96ToTickFloor(px96, ts)
      assert(floored % ts == 0)
      // floored grid tick is within one spacing below the true tick
      assert(floored <= t && t - floored < 2 * ts)
    }
  }

  test("property: amount deltas are monotone in liquidity and price width") {
    val prices = for {
      a <- Gen.choose(0.01, 10.0); w <- Gen.choose(1e-6, 1.0)
    } yield (a, a + w)
    for ((pq, liq) <- samples(Gen.zip(prices, Gen.choose(1e6, 1e24)))) {
      val (pa, pb) = pq
      val a0 = SwapMath.getAmount0Delta(pa, pb, liq)
      val a1 = SwapMath.getAmount1Delta(pa, pb, liq)
      assert(a0 >= 0 && a1 >= 0)
      assert(SwapMath.getAmount0Delta(pa, pb, liq * 2) >= a0)
      assert(SwapMath.getAmount1Delta(pa, pb + 0.1, liq) >= a1)
    }
  }

  test("property: next-price round-trips through amount deltas (in-range swap identity)") {
    // amt/liq bounded below 1e-5 of the price: below that the price
    // delta falls into the double's ulp and the identity degrades to
    // catastrophic cancellation (float64 fact, same in the reference)
    for ((p, (liq, amt)) <- samples(Gen.zip(Gen.choose(0.02, 5.0),
        Gen.zip(Gen.choose(1e18, 1e20), Gen.choose(1e15, 1e18))))) {
      // token1 in: price moves up; amount1 consumed equals input
      val p2 = SwapMath.getNextPriceAmount1(p, liq, amt, add = false)
      val back = SwapMath.getAmount1Delta(p, p2, liq)
      assert(relClose(back, amt, 1e-9), s"p=$p liq=$liq amt=$amt back=$back")
    }
  }
}
