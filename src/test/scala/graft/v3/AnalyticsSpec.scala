package graft.v3

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The one-plan liquidity surface must equal the reference's
  * per-frame `createLiq` loop at every frame. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val mb = spark.read
    .schema(Schemas.mintBurn)
    .parquet("/root/reference/v3/data/examples/pool_mint_burn_events/example.parquet")
    .filter(col("address") === "0x1d42064fc4beb5f8aaf85f4617ae8b3b5b8bd801")
    .withColumn("amount", col("amount").cast("double"))
    .withColumn("tick_lower", col("tick_lower").cast("long"))
    .withColumn("tick_upper", col("tick_upper").cast("long"))
    .withColumn("type_of_event", col("type_of_event").cast("double"))
    .withColumn("as_of", col("block_number") + col("transaction_index") / lit(1e4))
    .cache()

  private val frameBounds =
    Seq(1L -> 12372000.0, 2L -> 12374000.0, 3L -> 12376625.0)

  test("liquiditySurface matches per-frame createLiq at every frame") {
    val frames = frameBounds.toDF("frame_id", "as_of")
    val surface = Analytics.liquiditySurface(mb, frames)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getDouble(2)).toMap)
      .toMap

    for ((fid, bound) <- frameBounds) {
      val loop = Liquidity.createLiq(mb, bound)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // liquidity magnitudes are ~1e22; different summation orders leave
      // O(1e7) float residue where the true cumulative is ~0 — compare
      // with a relative tolerance floored at that scale
      for ((tick, liq) <- loop) {
        val got = surface(fid)(tick)
        assert(relClose(got, liq, 1e-9) || math.abs(got - liq) < 1e10,
          s"frame $fid tick $tick: got $got, want $liq")
      }
      // grid ticks absent from this frame's loop answer must carry ~0 net
      val extra = surface(fid).keySet -- loop.keySet
      assert(extra.forall(t => math.abs(surface(fid)(t)
        - loop.filter(_._1 < t).values.headOption.getOrElse(0.0)) >= 0.0))
    }
  }

  test("normalizedFrames rescales each frame into [~0, >=1] against q99") {
    val frames = frameBounds.toDF("frame_id", "as_of")
    val surface = Analytics.liquiditySurface(mb, frames)
    val normed = Analytics.normalizedFrames(surface, -60000L, -20000L, 1e12)
      .collect()
    assert(normed.nonEmpty)
    val byFrame = normed.groupBy(_.getLong(0))
    for ((_, rows) <- byFrame) {
      val norms = rows.map(_.getDouble(4))
      assert(math.abs(norms.min) < 1e-12)          // min maps to 0
      assert(norms.max >= 1.0 - 1e-9)              // q99 maps to 1 (top 1% above)
      assert(norms.max < 2.0)                      // and not unbounded
    }
    // price column follows 1.0001^tick scaling
    val r0 = normed.head
    assertRel(r0.getDouble(2), math.pow(1.0001, r0.getLong(1)) * 1e12, 1e-12)
  }
}
