package graft.ops

import graft.{SparkSpec, Tables}

/** Fuzzy record-linkage contracts: planted dirty copies recovered,
  * candidates stay inside blocks, plan is an equi-join. */
class LinkageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("fuzzyLinkPairs: recovers planted dirty copies, equi-join plan, block-bounded") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod, substring}
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    val dirty = cust.unionByName(
      cust.filter(pmod(col("c_custkey"), lit(10)) === 0)
        .select((col("c_custkey") + 100000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 17), lit("X")).as("c_name")))
    val pairs = Ops.fuzzyLinkPairs(dirty, "c_custkey",
      block = substring(col("c_name"), 10, 8),
      name = col("c_name"), maxEdit = 1)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = cust.collect().map(_.getLong(0)).filter(_ % 10 == 0)
      .map(k => (k, k + 100000L)).toSet
    assert(planted.nonEmpty && planted.subsetOf(got),
      s"missed ${(planted -- got).take(3)}")
    // the blocked join is an equi-join, never a cross product
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("Cartesian"), plan)
    // nothing pairs across blocks: every pair shares the 8-digit core
    val names = dirty.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (a, b) =>
      assert(names(a).substring(9, 17) == names(b).substring(9, 17))
    }
  }

}
