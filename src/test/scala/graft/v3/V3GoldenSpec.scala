package graft.v3

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.v3.ingest.{Ingest, ParquetFixtureConnector}

/** End-to-end v3 pipeline against the reference's golden fixtures
  * (/root/reference/v3/data/examples — the real first ~1000 mainnet
  * swaps of UNI/ETH 30bps). Expected values were computed independently
  * with DuckDB + pure-Python float math on the published algorithm
  * (see FIXTURES.md §1, SURVEY.md §5); ingest → lake → pool → liquidity
  * → swap → series all exercised on the same lake.
  */
class V3GoldenSpec extends SparkSpec {

  private val Fixtures = "/root/reference/v3/data/examples"
  private val PoolAddr = "0x1d42064fc4beb5f8aaf85f4617ae8b3b5b8bd801"
  private val AsOf = 12376625.0

  private lazy val lakeDir =
    Files.createTempDirectory("graft-lake").toString
  private lazy val lake = new Lake(spark, lakeDir)
  private lazy val connector = new ParquetFixtureConnector(spark, Fixtures)

  private lazy val ingested: Seq[Ingest.Report] = Ingest.updateTables(
    lake, connector, PoolAddr, "ethereum", tgtMaxRows = 400)

  private lazy val pool = { ingested; new Pool(spark, lake, PoolAddr, "ethereum") }

  test("ingest loop pulls everything in row-capped segments") {
    val bySeg = ingested.map(r => r.table -> r).toMap
    // fixture row counts for (pool, chain) scope — the connector's own
    // scoped view is the source of truth the lake must reproduce
    for (t <- Schemas.allTables) {
      val (lo, hi) = connector.minMaxBlock(t, PoolAddr, "ethereum").get
      val expected = connector.read(t, hi, lo, PoolAddr, "ethereum").count()
      assert(bySeg(t).rows == expected, s"$t rows")
      val lakeRows = lake.read(t).filter(col("chain_name") === "ethereum").count()
      assert(lakeRows == expected, s"$t lake rows")
    }
    // swaps: 1001 rows at tgt 400 → must have needed several segments
    assert(bySeg(Schemas.PoolSwapEvents).segments >= 3)
  }

  test("re-running ingest appends nothing (resume from lake max block)") {
    ingested
    val again = Ingest.updateTables(lake, connector, PoolAddr, "ethereum",
      tgtMaxRows = 400)
    assert(again.forall(_.rows == 0), again.toString)
  }

  test("factory init: tickSpacing/fee/tokens") {
    assert(pool.ts == 60L)
    assert(pool.fee == 3000L)
    assert(pool.token0 == "0x1f9840a85d5af5bf1d1762f925bdaddc4201f984")
    assert(pool.token1 == "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2")
  }

  test("getPriceAt returns exact big-int price") {
    assert(pool.getPriceAt(AsOf).get == BigInt("8781412307951675691321208331"))
  }

  test("createLiq golden: 123 ticks, spot values, zero tail") {
    val liq = pool.createLiq(AsOf).orderBy(col("tick")).collect()
    assert(liq.length == 123)
    assert(liq.head.getLong(0) == -127620L)
    assertRel(liq.head.getDouble(1), 2.1615743339306317e20)
    val mid = liq.find(_.getLong(0) == -43260L).get
    assertRel(mid.getDouble(1), 2.4230749947206667e22)
    assert(liq.last.getLong(0) == 82920L)
    // beyond the last tick all liquidity is withdrawn — float residual only
    assert(math.abs(liq.last.getDouble(1)) < 1e10)
  }

  test("calcSwapDF in-range scalars golden") {
    val (ticks, inR) = pool.calcSwapDF(AsOf)
    assert(ticks.nonEmpty && ticks.sliding(2).forall(p => p.head.tickA < p.last.tickA))
    assert(inR.tick == -44040L)
    assertRel(inR.sqrtP, 0.1108370057979151)
    assertRel(inR.liquidity, 5.653338537120413e22)
    assertRel(inR.inRange0, 1.1209794725495329e21)
    assertRel(inR.inRangeToSwap0, 1.3740856632652128e19)
    assertRel(inR.inRange1, 5.043116974048383e18)
    assertRel(inR.inRangeToSwap1, 4.101852834902314e20)
  }

  test("swapIn goldens: in-range and multi-tick, both directions") {
    def call(tok: String, amt: Double) =
      pool.swapIn(Swap.Calldata(AsOf, tok, amt), warn = false)
    val t1s = call(pool.token1, 1e18)
    assertRel(t1s.amountOut, 8.114401483602924e19)
    assertRel(t1s.sqrtPriceLast, 0.1108546413948894)
    val t1b = call(pool.token1, 50e18)
    assertRel(t1b.amountOut, 4.0281629931908345e21)
    assertRel(t1b.sqrtPriceLast, 0.11204503007035933)
    val t0s = call(pool.token0, 100e18)
    assertRel(t0s.amountOut, 1.2245593710929787e18)
    assertRel(t0s.sqrtPriceLast, 0.1108153449799214)
    val t0b = call(pool.token0, 100000e18)
    assertRel(t0b.amountOut, 4.8870532436015913e20)
    assertRel(t0b.sqrtPriceLast, 0.004671708085985056)
  }

  test("swapIn properties: monotonic, fee-sensitive, rejects zero") {
    def out(amt: Double) =
      pool.swapIn(Swap.Calldata(AsOf, pool.token1, amt), warn = false).amountOut
    assert(out(2e18) > out(1e18))
    intercept[IllegalArgumentException] {
      pool.swapIn(Swap.Calldata(AsOf, pool.token1, 0.0), warn = false)
    }
    // fee attribution sums to fee share of input for in-range swap
    val withFees = pool.swapIn(
      Swap.Calldata(AsOf, pool.token1, 1e18, fees = true), warn = false)
    val feeSum = withFees.feesByTick.values.map(_._1).sum
    assertRel(feeSum, 1e18 * pool.fee / 1e6)
  }

  test("price series golden: 6h buckets, asof-joined tick") {
    val start = Timestamp.from(Instant.parse("2021-05-05T00:00:00Z"))
    val got = pool.getPriceSeries(start, "6h").orderBy(col("block_timestamp")).collect()
    assert(got.length == 4)
    assert(got.head.getTimestamp(0) ==
      Timestamp.from(Instant.parse("2021-05-05T00:00:00Z")))
    assert(got.head.getLong(1) == 12371525L)
    assert(got.head.isNullAt(2)) // pool's first swap lands in a later bucket
    assert(got.last.getTimestamp(0) ==
      Timestamp.from(Instant.parse("2021-05-05T18:00:00Z")))
    assert(got.last.getLong(1) == 12376625L)
    assert(got.last.getLong(2) == -43997L)
  }

  test("price series golden, gas path: per-ts dedup + nearest-median gas") {
    // expected computed independently (DuckDB): dedup to one row per
    // block_timestamp by event order, 6h buckets, tick = last by time,
    // gas = quantile(0.5, "nearest") over the per-timestamp rows,
    // forward-filled, as-of joined onto the chain-wide bn buckets
    val start = Timestamp.from(Instant.parse("2021-05-05T00:00:00Z"))
    val got = pool.getPriceSeries(start, "6h", gas = true)
      .orderBy(col("block_timestamp")).collect()
    assert(got.length == 4)
    assert(got.map(_.getLong(1)).toSeq ==
      Seq(12371525L, 12374077L, 12375700L, 12376625L))
    // bucket 00:00 precedes the pool's first swap → all values null
    assert(got.head.isNullAt(2) && got.head.isNullAt(3) && got.head.isNullAt(4))
    // 06:00 (single-swap bucket) and its forward fill into 12:00
    for (i <- Seq(1, 2)) {
      assert(got(i).getLong(2) == -43172L, s"tick row $i")
      assert(got(i).getDouble(3) == 40000000000.0, s"gas_price row $i")
      assert(got(i).getDouble(4) == 147901.0, s"gas_used row $i")
    }
    // 18:00: 55 per-timestamp rows → nearest-median (1-based rank 28)
    assert(got(3).getLong(2) == -43997L)
    assert(got(3).getDouble(3) == 69000000000.0)
    assert(got(3).getDouble(4) == 157539.0)
  }

  test("getBNAtDate") {
    val dt = Timestamp.from(Instant.parse("2021-05-05T00:00:00Z"))
    assert(pool.getBNAtDate(dt).contains(12376625L))
  }

  test("maxSupported is min of swaps/mb max blocks") {
    assert(pool.maxSupported == 12376611L) // min(pool swaps max 12376611, pool mb max 12376623)
  }

  test("dropChain removes exactly that partition") {
    val tmp = Files.createTempDirectory("graft-lake-drop").toString
    val l2 = new Lake(spark, tmp)
    Ingest.updateTables(l2, connector, PoolAddr, "ethereum",
      tables = Seq(Schemas.FactoryPoolCreated), tgtMaxRows = 1000000)
    assert(l2.read(Schemas.FactoryPoolCreated).count() > 0)
    assert(l2.dropChain(Schemas.FactoryPoolCreated, "ethereum"))
    assert(l2.read(Schemas.FactoryPoolCreated)
      .filter(col("chain_name") === "ethereum").count() == 0)
  }
}
