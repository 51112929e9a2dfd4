package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants of the sample-prep operators (the oracle rows check
  * exact content; these check the geometric contract). */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: exact boundaries, full coverage, short-doc single chunk") {
    val doc = (1 to 200).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(df, "text", "doc_id",
        chunkTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // stride 48: starts 1, 49, 97, 145, 193 → ceil((200-64)/48)+1 = 4? no:
    // 1+ceil(136/48)=1+3=4 chunks at 0,48,96,144 plus none past; last
    // covers 145..200 (56 tokens)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1(0)._3 == (1 to 64).map(i => s"t$i"))
    assert(d1(1)._3 == (49 to 112).map(i => s"t$i"))
    assert(d1(3)._3 == (145 to 200).map(i => s"t$i")) // truncated tail
    // every token of the document is covered by some chunk
    assert(d1.flatMap(_._3).distinct.length == 200)
    // short doc: exactly one chunk holding the whole document
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._3 == Seq("a", "b", "c"))
  }

  test("packSequences: offsets under budget, bins contiguous and in order per shard") {
    val docs = (1L to 100L).map(i => (i, 50L + (i % 7) * 30L, i % 4)).toDF(
      "doc_id", "n_tokens", "shard")
    val packed = Chunking.packSequences(docs, col("n_tokens"), budget = 512L,
        order = Seq(col("doc_id")), shard = Seq(col("shard")))
      .select("shard", "doc_id", "n_tokens", "cum_tokens", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(packed.forall(p => p._6 >= 0 && p._6 < 512)) // offset within bin
    packed.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // running sum is consistent and bins never decrease or skip ahead
      sorted.foldLeft((0L, 0L)) { case ((cum, lastBin), p) =>
        assert(p._4 == cum + p._3, s"cum mismatch at ${p._2}")
        assert(p._5 == (p._4 - p._3) / 512, s"bin mismatch at ${p._2}")
        assert(p._5 >= lastBin)
        (p._4, p._5)
      }
    }
    // no single-partition exchange in the sharded plan
    val plan = Chunking.packSequences(docs, col("n_tokens"), budget = 512L,
        order = Seq(col("doc_id")), shard = Seq(col("shard")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
