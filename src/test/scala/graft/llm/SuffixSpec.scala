package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prefix-doubling suffix ranks vs a brute-force suffix sort: rank
  * order is lexicographic suffix order (truncated at 2^rounds
  * tokens), equal ranks iff equal truncated suffixes, and the
  * distributed dense-rank is partitioning-invariant. */
class SuffixSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a b c"),
    (2L, "b a b c"),
    (3L, "c a a"),
    (4L, "a b a b c"), // full duplicate of doc 1
    (5L, "z")).toDF("doc_id", "text")

  test("rank order equals brute-force truncated suffix order; duplicates share ranks") {
    val rounds = 3 // covers suffixes up to 8 tokens
    val got = Dedup.suffixRanks(corpus, "text", "doc_id", rounds)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // brute force: truncated suffixes, sorted
    val suff = corpus.collect().flatMap { r =>
      val toks = r.getString(1).split(" ")
      toks.indices.map(p => (r.getLong(0), p) ->
        toks.drop(p).take(1 << rounds).toSeq)
    }.toMap
    assert(got.keySet == suff.keySet)
    // pairwise: rank comparison == truncated-suffix lexicographic
    // comparison (token-wise, shorter-first)
    val ord = math.Ordering.Implicits.seqOrdering[Seq, String]
    for (a <- suff.keys; b <- suff.keys if a != b) {
      val cmpS = ord.compare(suff(a), suff(b))
      val cmpR = got(a).compare(got(b))
      assert(cmpS.sign == cmpR.sign,
        s"$a ${suff(a)} vs $b ${suff(b)}: suffix $cmpS rank $cmpR")
    }
    // the planted duplicate doc shares every suffix rank with its twin
    (0 until 5).foreach(p =>
      assert(got((1L, p)) == got((4L, p)), s"pos $p"))
    // ranks are dense 1..#distinct
    val distinctSuffixes = suff.values.toSet.size
    assert(got.values.toSet == (1L to distinctSuffixes).toSet)
  }

  test("longestRepeats: matches brute-force adjacent-suffix LCPs, clamped at ends") {
    val rounds = 3
    val got = Dedup.longestRepeats(corpus, "text", "doc_id",
        rounds, minLcp = 1L, topK = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3)) -> r.getLong(4)).toMap
    // brute force: all suffixes in (truncated-suffix, id, pos) order,
    // LCP of each adjacent pair, capped at the truncation window
    val suff = corpus.collect().flatMap { r =>
      val toks = r.getString(1).split(" ")
      toks.indices.map(p =>
        (toks.drop(p).take(1 << rounds).toSeq, r.getLong(0), p))
    }.sortBy(s => (s._1.mkString(""), s._2, s._3))
    val want = suff.zip(suff.tail).map { case ((sa, ia, pa), (sb, ib, pb)) =>
      val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size.toLong
      (ia, pa, ib, pb) -> lcp
    }.filter(_._2 >= 1L).toMap
    assert(got == want, {
      val dg = (got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)
      s"diff: ${dg.take(5)}"
    })
    // the full-duplicate docs produce the maximal repeat
    assert(got.values.max == 5L)
  }

  test("denseRank: dense, ordered, partitioning-invariant") {
    val df = (1L to 1000L).map(i => (i * 7919 % 311, i * 13 % 17))
      .toDF("a", "b")
    def run(parts: Int) = graft.ops.Ops.denseRank(df, Seq("a", "b"),
        numParts = parts)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val r4 = run(4)
    val r11 = run(11)
    assert(r4 == r11, "ranks must not depend on partition boundaries")
    // dense + consistent with tuple order
    val sorted = r4.keys.toSeq.sorted
    sorted.zipWithIndex.foreach { case (k, i) =>
      assert(r4(k) == i + 1L, s"$k -> ${r4(k)} want ${i + 1}")
    }
  }

  test("suffixRanks served from the rank-table memo equals the early-exit path") {
    def collectRanks() =
      Dedup.suffixRanks(corpus, "text", "doc_id", rounds = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cold = collectRanks() // early-exit path (memo not yet filled)
    // fills the rank-table memo for this (plan, text, id) at >= 4 levels
    Dedup.longestRepeats(corpus, "text", "doc_id", rounds = 4,
      minLcp = 1L, topK = 5).collect()
    val viaMemo = collectRanks() // now served as tables(3)
    assert(viaMemo == cold, "memo-served ranks diverged from early-exit ranks")
  }
}
