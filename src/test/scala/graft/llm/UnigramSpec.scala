package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Unigram-LM trainer contracts: the Viterbi DP against a scala
  * brute-force over all segmentations, the no-tie property the
  * md5 jitter exists for, coverage, and re-fit conservation. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir).cache()

  private def hash20(s: String): Long =
    graft.functions.Md5Hash64Expr.hash(s.getBytes("UTF-8")) & 1048575L

  test("Viterbi matches a brute-force min over ALL segmentations; costs are tie-free") {
    val words = Unigram.wordCounts(docs, "text", "doc_id").localCheckpoint()
    val pieces = Unigram.seedPieces(words, maxPieceLen = 4, minCount = 100L)
    val costs = Unigram.pieceCosts(pieces)
    val costMap = costs.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // cost formula replay: bitlen(total) - bitlen(cnt) in the high
    // bits, md5 jitter in the low 20
    val total = costMap.values.map(_._1).sum
    costMap.foreach { case (p, (cnt, c)) =>
      val want = (java.lang.Long.toBinaryString(total).length -
        java.lang.Long.toBinaryString(cnt).length).toLong * 1048576L + hash20(p)
      assert(c == want, s"piece $p cost $c want $want")
    }
    val seg = Unigram.viterbiSegment(words, costs, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // brute force: enumerate every segmentation into vocab pieces
    def allSegs(w: String): Seq[(Long, Seq[String])] =
      if (w.isEmpty) Seq((0L, Nil))
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        costMap.get(p).toSeq.flatMap { case (_, c) =>
          allSegs(w.substring(l)).map { case (tc, ps) => (tc + c, p +: ps) }
        }
      }
    seg.foreach { case (w, (cost, n, s)) =>
      val segs = allSegs(w)
      val minCost = segs.map(_._1).min
      assert(cost == minCost, s"$w: dp $cost vs brute $minCost")
      // the jitter's no-tie guarantee: exactly one argmin path
      assert(segs.count(_._1 == minCost) == 1, s"$w: tied argmin")
      val best = segs.minBy(_._1)._2
      assert(s == best.mkString(";") && n == best.size)
      assert(best.mkString("") == w, s"$w: segmentation must respell the word")
    }
  }

  test("train: re-fit counts conserve total word-piece mass; unused pieces pruned") {
    val words = Unigram.wordCounts(docs, "text", "doc_id").localCheckpoint()
    val seed = Unigram.seedPieces(words, 4, 100L)
    val seg = Unigram.viterbiSegment(words, Unigram.pieceCosts(seed), 4)
    val refit = Unigram.refit(seg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every refit piece was in the seed vocab; strictly fewer pieces
    val seedSet = seed.select("piece").collect().map(_.getString(0)).toSet
    assert(refit.keySet.subsetOf(seedSet))
    assert(refit.size < seedSet.size, "re-fit should prune unused pieces")
    // mass conservation: sum over words of freq * n_pieces = sum refit counts
    val mass = seg.select(sum(col("freq") * col("n_pieces"))).collect()
      .head.getLong(0)
    assert(refit.values.sum == mass)
    // train() composes the same stages
    val trained = Unigram.train(docs, "text", "doc_id", 4, 100L, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained == refit)
  }
}
