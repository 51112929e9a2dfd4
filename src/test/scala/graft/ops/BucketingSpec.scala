package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed tables must join without shuffling either side. */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("same-bucket join plans with zero shuffle exchanges") {
    // a previous JVM's in-memory catalog is gone but its warehouse
    // directory survives — clear both before writing
    for (t <- Seq("ev_a", "ev_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists())
        scala.reflect.io.Directory(loc).deleteRecursively()
    }
    val ev = Tables.events(spark, dir)
    Bucketing.writeBucketed(ev.select(col("user_id"), col("event_id"), col("value")),
      "ev_a", bucketCols = Seq("user_id"), numBuckets = 4,
      sortCols = Seq("user_id"))
    Bucketing.writeBucketed(ev.select(col("user_id"), col("ts_us")),
      "ev_b", bucketCols = Seq("user_id"), numBuckets = 4,
      sortCols = Seq("user_id"))
    // forbid broadcast so the test exercises the bucketed SMJ path
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("ev_a").join(spark.table("ev_b"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is not just a pretty plan — results match the direct join
      val direct = ev.select(col("user_id"), col("event_id"), col("value"))
        .join(ev.select(col("user_id"), col("ts_us")), Seq("user_id"))
      assert(joined.count() == direct.count())
    }
  }

  private def withConf(kv: (String, String))(body: => Unit): Unit = {
    val (k, v) = kv
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }
}
