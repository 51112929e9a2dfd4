package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** §2.8 comparator: golden-replay equality in the engine itself. */
class FrameDiffSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("identical frames diff to None; ingest replay is golden-equal") {
    val a = Tables.lineitem(spark, dir)
    assert(Ops.frameDiff(a, Tables.lineitem(spark, dir)).isEmpty)
  }

  test("detects a missing row, a mutated value, and a schema drift") {
    val a = Tables.nation(spark, dir)
    assert(Ops.frameDiff(a, a.limit(20)).exists(_.contains("only in left")))
    val mutated = a.withColumn("n_name",
      when(col("n_nationkey") === 3, lit("XX")).otherwise(col("n_name")))
    assert(Ops.frameDiff(a, mutated).isDefined)
    assert(Ops.frameDiff(a, a.drop("n_regionkey"))
      .exists(_.contains("schema mismatch")))
  }

  test("bag semantics: duplicate multiplicity matters") {
    val a = Tables.region(spark, dir)
    assert(Ops.frameDiff(a.union(a), a).isDefined)
    assert(Ops.frameDiff(a.union(a), a.union(a)).isEmpty)
  }
}
