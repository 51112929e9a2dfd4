package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Z-order layout contracts: interleave correctness against a scala
  * brute force, and the property the layout exists for — per-file
  * min/max ranges tight on BOTH dimensions, so point predicates on
  * either column prune most files (a single-column sort only prunes
  * its own column). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a brute-force Morton interleave") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val vals = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = vals.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    vals.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 16), s"($x, $y)")
    }
  }

  test("file tiles prune point predicates on both dimensions; a 1-D sort prunes only its own") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val zStats = Layout.zOrderStats(li, col("x"), col("y"),
        bits = 16, fileBits = 6)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(zStats.length > 32, s"want most of 64 tiles, got ${zStats.length}")
    // the comparison layout: sort by y alone, same file count, equal rows
    val n = li.count()
    val files = zStats.length
    val yStats = li.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("y"), col("x"))))
      .withColumn("f", call_function("div", (col("rn") - 1) * files, lit(n)))
      .groupBy("f").agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // fraction of files a point predicate must read, averaged over probes
    def hitFrac(stats: Seq[(Long, Long, Long, Long)], onX: Boolean,
                probes: Seq[Long]): Double =
      probes.map(v => stats.count { case (x0, x1, y0, y1) =>
        if (onX) x0 <= v && v <= x1 else y0 <= v && v <= y1
      }.toDouble / stats.length).sum / probes.length
    val xProbes = (1 to 40).map(i => i * 449L % 2000 + 1)
    val yProbes = (1 to 40).map(i => i * 7L % 100 + 1)
    val zX = hitFrac(zStats.toSeq, onX = true, xProbes)
    val zY = hitFrac(zStats.toSeq, onX = false, yProbes)
    val yX = hitFrac(yStats.toSeq, onX = true, xProbes)
    val yY = hitFrac(yStats.toSeq, onX = false, yProbes)
    // z-order prunes BOTH dimensions; the y-sort reads ~every file for x
    assert(zX < 0.5 && zY < 0.5, s"z-order hit fractions x=$zX y=$zY")
    assert(yY < 0.2, s"y-sort must prune its own column, got $yY")
    assert(yX > 0.9, s"y-sort should fail to prune x, got $yX")
    assert(zX < yX / 2, s"z-order x pruning ($zX) must beat y-sort ($yX)")
  }

  test("rangeShards: equi-depth up to one bin, disjoint ordered ranges, skew-safe") {
    val vc = Tables.events(spark, "/root/testdata/sf0.01")
      .select(floor(col("value") * 100 + 0.5).cast("long").as("vc"))
    val stats = Layout.rangeShards(vc, col("vc"), 0L, 50000L, 100, 8)
      .groupBy("shard").agg(count(lit(1)).as("n"),
        min("vc").as("lo"), max("vc").as("hi"))
      .orderBy("shard")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.map(_._1).toSeq == (0 until 8))
    // disjoint, ordered value ranges
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"shards overlap: $a vs $b")
    }
    // equal depth up to one histogram bin's population per boundary
    val total = stats.map(_._2).sum
    val maxBin = vc.groupBy(call_function("div", col("vc") * 100, lit(50000L)))
      .count().agg(max("count")).collect().head.getLong(0)
    stats.foreach { case (s, n, _, _) =>
      assert(math.abs(n - total / 8) <= maxBin + 1,
        s"shard $s depth $n vs ${total / 8} (bin cap $maxBin)")
    }
    // all-equal values land in one shard without failing
    val const = spark.range(1000).select(lit(42L).as("vc"))
    val one = Layout.rangeShards(const, col("vc"), 0L, 1000L, 100, 4)
      .select("shard").distinct().collect().map(_.getInt(0))
    assert(one.length == 1)
  }

  test("assignment is deterministic and partitioning-invariant") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // (l_orderkey, l_linenumber) is not unique in the synthetic data,
    // so compare the full sorted multiset of assignments
    def run(df: org.apache.spark.sql.DataFrame) =
      Layout.zOrderLayout(df, col("l_partkey"), col("l_suppkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("z"), col("file_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(run(li) == run(li.repartition(13)))
  }
}
