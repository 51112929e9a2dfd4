package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PageRank contracts: agreement with a scala brute-force replay of
  * the exact integer recurrence, hub ordering, determinism. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force replay of the documented integer recurrence. */
  private def bruteForce(edges: Seq[(Long, Long)], iters: Int,
                         scale: Long = 1000000000000L,
                         dNum: Long = 17, dDen: Long = 20): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (scale * (dDen - dNum)) / (dDen * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v -> (base + dNum * in.getOrElse(v, 0L) / dDen)).toMap
    }
    r
  }

  test("matches the brute-force integer recurrence on a mixed graph") {
    // two triangles bridged by one edge, plus a pendant — symmetrized
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (6L, 7L))
    val sym = pairs ++ pairs.map(_.swap)
    val got = Graph.pageRank(sym.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = bruteForce(sym, 5)
    assert(got.keySet == exp.keySet)
    got.foreach { case (v, (d, r)) =>
      assert(r == exp(v), s"node $v: got $r want ${exp(v)}")
      assert(d == sym.count(_._1 == v).toLong)
    }
    // bridge nodes (3, 4) outrank the pendant tip (7)
    assert(got(3L)._2 > got(7L)._2 && got(4L)._2 > got(7L)._2)
  }

  test("star graph: the hub outranks every leaf; mass is conserved up to floor leak") {
    val scale = 1000000000000L
    val pairs = (2L to 21L).map(i => (1L, i))
    val sym = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(sym, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val leaves = (2L to 21L).map(got)
    assert(leaves.distinct.size == 1, "leaves must tie exactly")
    assert(got(1L) > leaves.head * 5, "hub must dominate")
    val total = got.values.sum
    // floor leak: <= (deg-quantization + base floor) per node per iter
    assert(total <= scale && scale - total < 5L * 21 * 50,
      s"mass $total vs $scale")
  }

  test("trustRank: seed-proximity ordering, brute-force agreement, isolation decays to 0") {
    // two components: a seeded triangle and an unseeded pair
    val pairs = Seq((2L, 4L), (4L, 5L), (2L, 5L), (7L, 9L))
    val sym = pairs ++ pairs.map(_.swap)
    val seeds = Seq(2L, 4L)
    val got = Graph.trustRank(sym.toDF("src", "dst"),
        seeds.toDF("node"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute-force replay of the seeded integer recurrence
    val scale = 1000000000000L
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (scale * 3) / (20 * seeds.size)
    var r = nodes.map(v =>
      v -> (if (seeds.contains(v)) scale / seeds.size else 0L)).toMap
    for (_ <- 1 to 5) {
      val in = sym.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(v => v -> ((if (seeds.contains(v)) base else 0L) +
        17L * in.getOrElse(v, 0L) / 20L)).toMap
    }
    nodes.foreach(v => assert(got(v) == r(v), s"node $v"))
    // the unseeded component holds zero trust; seeds outrank the
    // non-seed member of their component
    assert(got(7L) == 0L && got(9L) == 0L)
    assert(got(2L) > got(5L) && got(4L) > got(5L) && got(5L) > 0L)
  }

  test("empty edge list fails fast with a clear message, not /0 mid-plan") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException](Graph.pageRank(empty))
    assert(e.getMessage.contains("non-empty"))
  }

  test("deterministic across runs and partitionings") {
    val pairs = (1L to 200L).map(i => (i, i * 7 % 201 + 1))
    val sym = pairs ++ pairs.map(_.swap)
    val a = Graph.pageRank(sym.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Graph.pageRank(sym.toDF("src", "dst").repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }
}
