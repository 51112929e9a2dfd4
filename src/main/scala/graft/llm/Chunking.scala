package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample-preparation operators for training pipelines: splitting long
  * documents into overlapping token windows, and packing documents
  * into fixed context-window budgets. Both are deterministic and
  * integer-exact, so the DuckDB oracle recomputes them bit-for-bit.
  */
object Chunking {

  /** Overlapping fixed-size token chunks per document: chunk i covers
    * tokens [i·stride, i·stride + chunkTokens) where stride =
    * chunkTokens − overlap; the last chunk truncates at the document
    * end, and a document shorter than one chunk yields exactly one.
    * A narrow explode — chunk count is derived per row, no shuffle, so
    * it runs at scan speed over any corpus. Output: input id, chunk_id,
    * chunk (array of tokens). */
  def chunkDocuments(df: DataFrame, text: String, id: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(col(text), " ")
    val n = size(toks).cast("long")
    // 1 + ceil(max(n - chunk, 0) / stride), in exact integer math
    val nChunks = lit(1L) + call_function("div",
      greatest(n - chunkTokens, lit(0L)) + (stride - 1), lit(stride.toLong))
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), toks.as("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col(id), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkTokens)).as("chunk"))
  }

  /** Greedy in-order sequence packing: documents are laid end-to-end
    * in `order` within each `shard`, and each document is assigned the
    * context-window bin its first token falls into (documents may
    * straddle a boundary — the standard concat-then-cut pretraining
    * layout). One windowed running sum per shard; shards keep the
    * cumsum partitioned at fleet scale (a keyless call is the
    * single-pool escape hatch, same contract as Ops.cumSum). Output:
    * input columns + cum_tokens, bin, bin_offset. */
  def packSequences(df: DataFrame, tokenCount: Column, budget: Long,
                    order: Seq[Column], shard: Seq[Column] = Seq.empty): DataFrame = {
    val w = (if (shard.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(shard: _*).orderBy(order: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // evaluate the window ONCE (cum_tokens), derive bin/bin_offset from
    // it in the projection above the Window operator — inlining `start`
    // into all three outputs makes WindowExec carry three copies of the
    // same running-sum frame
    val start = col("cum_tokens") - tokenCount
    df.withColumn("cum_tokens", sum(tokenCount).over(w))
      .withColumn("bin", call_function("div", start, lit(budget)))
      .withColumn("bin_offset", start % budget)
  }

  /** Concat-and-cut window assembly — the GPT-style pretraining layout
    * [[packSequences]] only approximates: documents are laid end-to-end
    * in `order` within each `shard` and the token stream is cut into
    * fixed `window`-token context windows, so one document can SPAN
    * windows and one window holds SLICES of several documents. Output
    * is one row per (document, window) overlap: the shard-local
    * `win_id`, the document token range [`doc_from`, `doc_to`) that
    * lands in it, and `win_from` (where in the window the slice
    * starts) — exactly the index map a loader needs to materialize
    * window w of shard s. Every quantity is exact integer arithmetic
    * on the per-shard running sum, so the DuckDB oracle replays the
    * whole assembly. Zero-token documents contribute no slice and are
    * excluded (they have no position in the token stream).
    *
    * 100 TB story: identical to [[packSequences]] — one running-sum
    * window per shard (shards keep it partitioned; no global sort)
    * plus a narrow per-row `sequence` explode whose length is the
    * document's window span, ⌈n/window⌉+1 at most: output is
    * Θ(corpus tokens / window + docs) rows, written at scan speed. */
  def concatChunks(df: DataFrame, tokenCount: Column, window: Long,
                   order: Seq[Column], shard: Seq[Column] = Seq.empty): DataFrame = {
    require(window > 0, "window must be positive")
    val w = (if (shard.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(shard: _*).orderBy(order: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("cum_tokens") - tokenCount
    // doc occupies [start, cum) of the shard stream; it overlaps every
    // window id in [start div W, (cum-1) div W] (cum >= 1 after the
    // positive-count filter, so both bounds are exact non-negative div)
    val winStart = col("win_id") * window
    df.filter(tokenCount > 0)
      .withColumn("cum_tokens", sum(tokenCount).over(w))
      .withColumn("win_id", explode(sequence(
        call_function("div", start, lit(window)),
        call_function("div", col("cum_tokens") - 1, lit(window)))))
      .withColumn("doc_from", greatest(winStart, start) - start)
      .withColumn("doc_to",
        least(winStart + window, col("cum_tokens")) - start)
      .withColumn("win_from", greatest(winStart, start) - winStart)
  }
}
