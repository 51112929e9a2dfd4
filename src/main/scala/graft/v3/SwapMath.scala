package graft.v3

/** Scalar Uniswap v3 sqrt-price math — pure Scala on Double, mirroring
  * the float64 semantics of the reference (v3/helpers/swap_math.py:7–22,
  * 74–153), which itself mirrors v3-core SwapMath.sol /
  * SqrtPriceMath.sol. These run driver-side on scalars extracted from
  * tiny frames (SURVEY.md §1.1 #4) — no UDF or Catalyst work needed;
  * the distributed half of the pipeline is Liquidity/Pool.
  *
  * Prices here are sqrt ratios: `sqrtP = sqrtPriceX96 / 2^96`.
  */
object SwapMath {

  val Q96: Double = math.pow(2.0, 96)
  val MaxTick: Long = 887272L

  /** Non-integer tick for a sqrtPriceX96 (swap_math.py:7–13):
    * log((p/Q96)^2) / log(1.0001). */
  def priceX96ToTick(priceX96: Double): Double = {
    val r = priceX96 / Q96
    math.log(r * r) / math.log(1.0001)
  }

  /** Integer tick floored to the pool's tick spacing
    * (swap_math.py:16–22). Scala `Math.floorDiv` matches Python's
    * floor-division `//` on negatives. */
  def priceX96ToTickFloor(priceX96: Double, tickSpacing: Long): Long =
    Math.floorDiv(math.floor(priceX96ToTick(priceX96)).toLong, tickSpacing) * tickSpacing

  /** Token0 amount between two sqrt prices at given liquidity
    * (swap_math.py:101–110): liq * (b-a)/(b*a) with a<=b. */
  def getAmount0Delta(ratioA: Double, ratioB: Double, liq: Double): Double = {
    val (a, b) = if (ratioA > ratioB) (ratioB, ratioA) else (ratioA, ratioB)
    liq * ((b - a) / (b * a))
  }

  /** Token1 amount between two sqrt prices (swap_math.py:113–119). */
  def getAmount1Delta(ratioA: Double, ratioB: Double, liq: Double): Double = {
    val (a, b) = if (ratioA > ratioB) (ratioB, ratioA) else (ratioA, ratioB)
    liq * (b - a)
  }

  /** Next sqrt price after swapping `amount` of token0
    * (swap_math.py:122–131). */
  def getNextPriceAmount0(ratioA: Double, liq: Double, amount: Double,
                          add: Boolean): Double =
    if (add) (liq * ratioA) / (liq + amount * ratioA)
    else (liq * ratioA) / (liq - amount * ratioA)

  /** Next sqrt price after swapping `amount` of token1
    * (swap_math.py:134–143). Note the reference's argument sense:
    * `add=false` moves price up. */
  def getNextPriceAmount1(ratioA: Double, liq: Double, amount: Double,
                          add: Boolean): Double =
    if (!add) ratioA + amount / liq
    else ratioA - amount / liq

  /** Direction dispatch (swap_math.py:146–153). */
  def getNextSqrtPrice(ratioA: Double, liq: Double, amount: Double,
                       zeroForOne: Boolean): Double =
    if (zeroForOne) getNextPriceAmount0(ratioA, liq, amount, zeroForOne)
    else getNextPriceAmount1(ratioA, liq, amount, zeroForOne)

  /** Partial-tick fill for the final tick of a multi-tick swap
    * (swap_math.py:74–98 / v3-core computeSwapStep). Returns
    * (amountOut, nextSqrtPrice). */
  def finalAmtOutFromTick(zeroForOne: Boolean, sqrtPLastTop: Double,
                          sqrtPLastBottom: Double,
                          amtInSwappedLeftMinusFee: Double,
                          liquidity: Double): (Double, Double) =
    if (zeroForOne) {
      val next = getNextPriceAmount0(sqrtPLastTop, liquidity,
        amtInSwappedLeftMinusFee, add = true)
      (getAmount1Delta(next, sqrtPLastTop, liquidity), next)
    } else {
      val next = getNextPriceAmount1(sqrtPLastBottom, liquidity,
        amtInSwappedLeftMinusFee, add = false)
      (getAmount0Delta(next, sqrtPLastBottom, liquidity), next)
    }
}
