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

  /** Content-defined chunking (the LBFS/FastCDC family at token
    * granularity): a chunk boundary falls after token `p` exactly when
    * the md5-derived 64-bit hash of the `k`-token window ENDING at `p`
    * is ≡ 0 (mod `modulus`) — so boundaries are decided by local
    * content alone, and inserting or deleting a prefix moves only the
    * boundaries inside the edited region while every later chunk
    * reproduces byte-identically. That shift-tolerance is the whole
    * point: fixed-offset chunking ([[chunkDocuments]]) loses alignment
    * after a one-token edit; CDC re-synchronizes at the next boundary.
    * Expected chunk length ≈ `modulus` tokens; documents shorter than
    * `k` tokens (no full window) form one chunk. Output: one row per
    * (id, chunk_id) with `n_chunk_tokens` and `chunk_md5` over the
    * chunk's tokens rejoined with spaces — md5 is the cross-engine
    * digest, so the DuckDB oracle replays the chunker bit-for-bit.
    *
    * 100 TB story: everything is keyed on the document — the position
    * explode is Θ(tokens) but gram hashes travel as 8-byte longs, the
    * boundary vote and chunk assignment are one per-document window,
    * and chunk text never leaves the per-document aggregation (only
    * 16-byte digests cross any later shuffle). No global state, no
    * all-pairs anything. */
  def contentDefinedChunks(df: DataFrame, text: String, id: String,
                           k: Int = 4, modulus: Int = 32): DataFrame = {
    require(k >= 1, "window k must be >= 1")
    require(modulus >= 2, "modulus must be >= 2")
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val perTok = Dedup.tokenize(df, text, id)
      .select(col(id), col("toks"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .withColumn("p", (col("p0") + 1).cast("long")).drop("p0")
    // the k-gram ending at p exists for p >= k; its hash decides
    // whether a cut falls AFTER token p. greatest(…, 1) keeps the
    // slice start in-range for p < k (isCut discards those rows, but
    // slice itself rejects start <= 0 unconditionally)
    val gramEnd = concat_ws(" ",
      slice(col("toks"),
        greatest(col("p") - (k - 1), lit(1L)).cast("int"), lit(k)))
    val isCut = col("p") >= k &&
      pmod(Dedup.md5Hash64(gramEnd), lit(modulus.toLong)) === 0
    // chunk of token p = number of cuts strictly before p
    val w = Window.partitionBy(col(id)).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perTok
      .withColumn("cut", when(isCut, 1L).otherwise(0L))
      .withColumn("chunk_id", coalesce(sum(col("cut")).over(w), lit(0L)))
      .groupBy(col(id), col("chunk_id"))
      .agg(count(lit(1)).as("n_chunk_tokens"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok"))).cast("binary")).as("chunk_md5"))
  }

  /** Planted shifted copies for CDC non-vacuity: every `every`-th
    * document reappears at `id + idOffset` with a fixed multi-token
    * prefix, so any fixed-offset chunker sees zero aligned chunks
    * while [[contentDefinedChunks]] re-synchronizes after the first
    * content-defined boundary. Mirrored verbatim in the DuckDB
    * oracle. */
  val ShiftPrefix =
    "planted shift prefix tokens breaking fixed window alignment"
  def withPlantedShifted(df: DataFrame, text: String, id: String,
                         every: Int = 9, idOffset: Long = 3000000L): DataFrame =
    df.unionByName(
      df.filter(pmod(col(id), lit(every)) === 0)
        .withColumn(id, col(id) + lit(idOffset))
        .withColumn(text, concat(lit(ShiftPrefix + " "), col(text))))

  /** Per-document shift-tolerant duplication profile over
    * [[contentDefinedChunks]]: how much of each document consists of
    * chunks whose content recurs in OTHER documents — the CDC answer
    * to "which documents share storage/dedup mass with the corpus",
    * robust to prefix/suffix edits that defeat whole-document digests.
    * A chunk counts as duplicated when its digest occurs in ≥ 2
    * distinct documents (within-document repeats alone don't). Output
    * per document: `n_tokens`, `n_chunks`, `n_dup_chunks`,
    * `dup_tokens`, and `dup_bp` = ⌊10⁴·dup/total + ½⌋ basis points.
    *
    * Scale shape: the digest df-count is one keyed aggregation over
    * (id, digest)-distinct rows and returns via an equi-join (the
    * shared set is unbounded at fleet scale — never broadcast), same
    * contract as [[Dedup.lineDedup]]'s frequent-line stage. */
  /** Incremental shift-tolerant dedup: which documents of a NEW batch
    * share content chunks with a persisted corpus chunk index (the
    * [[contentDefinedChunks]] digests, stored in the lake next to the
    * exact-digest and minhash-signature indexes). Exact whole-document
    * digests miss a re-crawled page with a new header; the CDC chunks
    * after the first boundary are byte-identical, so the index probe
    * still lands. Output, one row per batch document whose best corpus
    * match reaches `minSharedBp` basis points of shared chunk tokens:
    * (id, dup_of = the corpus doc sharing the most chunk tokens —
    * min-id on ties, n_chunks, n_shared_chunks, shared_tokens,
    * n_tokens, shared_bp).
    *
    * Scale shape: the batch is ingest-sized while the index carries
    * the corpus — the join is a digest equi-join (16-byte keys), the
    * per-(batch, corpus) rollup and the best-match window are keyed by
    * batch document. Like [[graft.llm.Dedup.exactIncremental]] the
    * corpus text is never re-read — only its digests. */
  def cdcIncremental(batch: DataFrame, chunkIndex: DataFrame, text: String,
                     id: String, k: Int = 4, modulus: Int = 32,
                     minSharedBp: Long = 5000L): DataFrame = {
    val bc = contentDefinedChunks(batch, text, id, k, modulus)
      .localCheckpoint() // probe join and per-doc totals both consume it
    val idx = chunkIndex
      .select(col(id).as("corpus_id"), col("chunk_md5")).distinct()
    // (id, chunk_id) granularity: a digest recurring WITHIN the batch
    // doc counts once per occurrence, a corpus-side recurrence once
    val hits = bc.join(idx, Seq("chunk_md5"))
      .filter(col("corpus_id") =!= col(id))
      .select(col(id), col("corpus_id"), col("chunk_id"),
        col("n_chunk_tokens"))
      .distinct()
      .groupBy(col(id), col("corpus_id"))
      .agg(count(lit(1)).as("n_shared_chunks"),
        sum(col("n_chunk_tokens")).as("shared_tokens"))
    val totals = bc.groupBy(col(id))
      .agg(sum(col("n_chunk_tokens")).as("n_tokens"),
        count(lit(1)).as("n_chunks"))
    hits.join(totals, Seq(id))
      .withColumn("shared_bp",
        floor(lit(10000.0) * col("shared_tokens") / col("n_tokens") + 0.5)
          .cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(id))
          .orderBy(col("shared_tokens").desc, col("corpus_id"))))
      .filter(col("rn") === 1 && col("shared_bp") >= minSharedBp)
      .select(col(id), col("corpus_id").as("dup_of"), col("n_chunks"),
        col("n_shared_chunks"), col("shared_tokens"), col("n_tokens"),
        col("shared_bp"))
  }

  def cdcDupProfile(df: DataFrame, text: String, id: String,
                    k: Int = 4, modulus: Int = 32): DataFrame = {
    val chunks = contentDefinedChunks(df, text, id, k, modulus)
      .localCheckpoint() // df-count and the per-doc rollup both consume it
    val shared = chunks.select(col(id), col("chunk_md5")).distinct()
      .groupBy(col("chunk_md5")).agg(count(lit(1)).as("chunk_df"))
      .filter(col("chunk_df") >= 2)
      .select(col("chunk_md5"), lit(1).as("__dup"))
    chunks.join(shared, Seq("chunk_md5"), "left")
      .groupBy(col(id))
      .agg(sum(col("n_chunk_tokens")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("__dup") === 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__dup") === 1, col("n_chunk_tokens")).otherwise(0L))
          .as("dup_tokens"))
      .withColumn("dup_bp",
        floor(lit(10000.0) * col("dup_tokens") / col("n_tokens") + 0.5)
          .cast("long"))
  }
}
