package graft.v3

import org.scalatest.funsuite.AnyFunSuite

/** Scalar math vs goldens computed independently (pure Python floats on
  * the published formulas, tools-side) from the reference's own test
  * pool state at block 12,376,625. */
class SwapMathSpec extends AnyFunSuite {

  private val price = 8.781412307951676e27 // sqrtPriceX96 before as_of

  test("priceX96ToTickFloor matches golden") {
    assert(SwapMath.priceX96ToTickFloor(price, 60) == -44040L)
  }

  test("floor divides like Python // on negatives") {
    // tick ≈ −43997.5 → floor −43998; −43998 // 200 = −220 → −44000
    // (truncating division would give −43800)
    assert(SwapMath.priceX96ToTickFloor(price, 200) == -44000L)
    assert(Math.floorDiv(-43998L, 60L) * 60L == -44040L)
  }

  test("sqrtP scaling") {
    assert(math.abs(price / SwapMath.Q96 - 0.1108370057979151) < 1e-15)
  }

  test("amount deltas are symmetric in their price args") {
    val (a, b, l) = (0.11, 0.12, 5e22)
    assert(SwapMath.getAmount0Delta(a, b, l) == SwapMath.getAmount0Delta(b, a, l))
    assert(SwapMath.getAmount1Delta(a, b, l) == SwapMath.getAmount1Delta(b, a, l))
    assert(SwapMath.getAmount1Delta(a, b, l) == l * (b - a))
  }

  test("next-price directions") {
    val (p, l) = (0.11, 5e22)
    // token0 in (price down), token1 in (price up)
    assert(SwapMath.getNextPriceAmount0(p, l, 1e18, add = true) < p)
    assert(SwapMath.getNextPriceAmount1(p, l, 1e18, add = false) > p)
    assert(SwapMath.getNextSqrtPrice(p, l, 1e18, zeroForOne = true) ==
      SwapMath.getNextPriceAmount0(p, l, 1e18, add = true))
  }

  test("finalAmtOutFromTick mirrors computeSwapStep on both directions") {
    val (pa, pb, l, amt) = (0.110, 0.112, 5e22, 1e18)
    val (out0, next0) = SwapMath.finalAmtOutFromTick(true, pb, pa, amt, l)
    assert(next0 < pb && out0 > 0)
    val (out1, next1) = SwapMath.finalAmtOutFromTick(false, pb, pa, amt, l)
    assert(next1 > pa && out1 > 0)
  }
}
