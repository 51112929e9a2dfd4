package graft.v3

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-user analytics workload from the reference's notebook
  * (Crosschain_Liquidity_GIF.ipynb, cell 12): per-frame liquidity
  * distributions, tick-range filtered, price-scaled and
  * min/quantile(.99)-normalized for display.
  *
  * The reference loops `createLiq(bn)` per animation frame on the
  * driver — an O(frames) sequence of scans. This computes the whole
  * liquidity *surface* in one distributed plan:
  *
  *  1. tag each mint/burn delta with the first frame that can see it
  *     (backward as-of semantics on `as_of < frame bound`);
  *  2. aggregate deltas per (frame, tick) and run two cumulative
  *     windows — across frames per tick (time accumulation), then
  *     across ticks per frame (the liquidity distribution);
  *  3. per-frame normalization from a grouped min / percentile.
  *
  * Cost is O(|events| + |ticks|·|frames|) with no per-frame rescans —
  * the shape that survives 1000 frames over a 100 TB lake.
  */
object Analytics {

  /** Liquidity surface for a set of observation frames.
    *
    * @param mb      Pool.mintBurns-shaped frame (amount, type_of_event,
    *                tick_lower/upper, as_of)
    * @param frames  (frame_id long, as_of double) observation bounds,
    *                e.g. from a price series' block numbers
    * @return (frame_id, tick, liquidity) for every frame × active tick
    */
  def liquiditySurface(mb: DataFrame, frames: DataFrame): DataFrame = {
    // per-(tick, as_of) net deltas on both legs (lower +, upper −)
    val deltas = mb.select(col("as_of"),
        col("tick_lower").as("tick"),
        (col("amount") * col("type_of_event")).as("delta"))
      .unionByName(mb.select(col("as_of"),
        col("tick_upper").as("tick"),
        (-(col("amount") * col("type_of_event"))).as("delta")))

    // first frame that sees each delta: min frame_id with bound > as_of.
    // Observation frames are driver-small by construction (animation
    // frames / report points), so collect them once and resolve the
    // assignment with an O(log F) codegen'd upper-bound binary search —
    // a theta join against the bounds would materialize an O(E·F)
    // intermediate plus a per-row-id shuffle to undo it. suffixMinId
    // makes the "min frame_id" exact even for non-monotone frame ids.
    graft.functions.SearchSortedExpr.register(mb.sparkSession)
    val MaxFrames = 100000
    val fr = frames.select(col("frame_id").cast("long"), col("as_of").cast("double"))
      .limit(MaxFrames + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._2)
    require(fr.nonEmpty, "liquiditySurface needs at least one frame")
    // the driver-small contract, enforced loudly: frames are animation/
    // report observation points, collected once and embedded in the
    // binary-search literal. A frames-as-data misuse (millions of rows)
    // must fail fast here, not OOM the driver or blow the plan up —
    // limit()+count check keeps even the probe itself bounded.
    require(fr.length <= MaxFrames,
      s"liquiditySurface: frame grid exceeds $MaxFrames observation " +
        "points - frames are driver-small by contract (animation/report " +
        "bounds); bucket or sample the observation axis instead")
    val boundsArr = fr.map(_._2).toSeq
    val suffixMinId = fr.map(_._1).scanRight(Long.MaxValue)(math.min).init.toSeq
    val idx = graft.functions.SearchSortedExpr.of(
      typedlit(boundsArr), col("as_of").cast("double"))
    val framed = deltas.withColumn("__idx", idx)
      .filter(col("__idx") < fr.length) // events beyond the last frame drop
      .withColumn("frame_id", element_at(typedlit(suffixMinId), col("__idx") + 1))
      .groupBy(col("frame_id"), col("tick"))
      .agg(sum(col("delta")).as("delta"))

    // densify to the full frame × tick grid so both cumsums are total
    val ticks = framed.select(col("tick")).distinct()
    val grid = frames.select(col("frame_id")).crossJoin(ticks)
      .join(framed, Seq("frame_id", "tick"), "left")
      .na.fill(0.0, Seq("delta"))

    val overFrames = Window.partitionBy(col("tick")).orderBy(col("frame_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val overTicks = Window.partitionBy(col("frame_id")).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("net_at_frame", sum(col("delta")).over(overFrames))
      .withColumn("liquidity", sum(col("net_at_frame")).over(overTicks))
      .select(col("frame_id"), col("tick"), col("liquidity"))
  }

  /** Display normalization from the notebook: filter to a tick window,
    * price = 1.0001^tick · scale, liquidity rescaled per frame to
    * (x − min) / (q99 − min). */
  def normalizedFrames(surface: DataFrame, tickLow: Long, tickHigh: Long,
                       priceScale: Double): DataFrame = {
    val inRange = surface
      .filter(col("tick") >= tickLow && col("tick") <= tickHigh)
    val stats = inRange.groupBy(col("frame_id"))
      .agg(min(col("liquidity")).as("min_liq"),
        expr("percentile(liquidity, 0.99)").as("q99_liq"))
    inRange.join(broadcast(stats), Seq("frame_id"))
      .withColumn("price", pow(lit(1.0001), col("tick")) * priceScale)
      .withColumn("liquidity_norm",
        (col("liquidity") - col("min_liq")) / (col("q99_liq") - col("min_liq")))
      .select(col("frame_id"), col("tick"), col("price"),
        col("liquidity"), col("liquidity_norm"))
  }
}
