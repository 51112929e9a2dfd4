package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** CMS join-size estimator contracts: the one-sided overestimate
  * guarantee, the expected-collision ceiling, and convergence to the
  * exact size as the sketch widens. */
class JoinSizeSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("overestimates, within the collision ceiling, converges when widened") {
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect().head.getLong(0)
    def est(width: Int): (Long, Long, Long) = {
      val r = Ops.joinSizeSketch(li, col("l_partkey"), li, col("l_partkey"),
        width).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (e256, na, nb) = est(256)
    assert(na == nb && na == li.count())
    assert(e256 >= exact, "CMS inner product must never underestimate")
    // expected excess is (na*nb - exact)/width per lane; min of 4
    // lanes stays within a small multiple of it
    val ceiling = exact + 8L * (na * nb - exact) / 256
    assert(e256 <= ceiling, s"est $e256 above ceiling $ceiling")
    // widening shrinks the excess toward the exact size
    val (e64k, _, _) = est(65536)
    assert(e64k >= exact && e64k < e256)
    assert(e64k - exact <= (exact / 5),
      s"width 65536 should be near-exact: $e64k vs $exact")
  }
}
