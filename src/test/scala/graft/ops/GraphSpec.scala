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
