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
}
