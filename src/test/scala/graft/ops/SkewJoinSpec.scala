package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Salted-join contracts: bag equality with the plain join, and the
  * salting actually spreads a hot key across all lanes. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("row-identical to the plain join (bag semantics), inner-join nulls respected") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("event_id"), col("value"))
    // dim misses one type on purpose: inner-join drop must match
    val dim = Seq(("click", 5L), ("view", 1L), ("purchase", 20L),
      ("signup", 10L)).toDF("event_type", "weight_c")
    val salted = Ops.saltedJoin(ev, dim, Seq("event_type"),
      saltBy = col("event_id"), salts = 8)
    val plain = ev.join(dim, Seq("event_type"))
    assert(Ops.frameDiff(salted, plain).isEmpty,
      Ops.frameDiff(salted, plain).toString)
  }

  test("a hot key spreads across all salt lanes; no rows lost at salts = 1") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("event_type") === "click")
    val spread = ev
      .select(pmod(xxhash64(col("event_id")), lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8L, s"hot key used $spread of 8 lanes")
    val dim = Seq(("click", 1L)).toDF("event_type", "w")
    val one = Ops.saltedJoin(ev, dim, Seq("event_type"),
      saltBy = col("event_id"), salts = 1)
    assert(one.count() == ev.count())
  }
}
