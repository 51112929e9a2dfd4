package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: token counting,
  * quality stats, n-gram-heuristic language id, fingerprinting. All
  * per-row narrow transforms (no shuffle) built from codegen'd string
  * functions — they run at scan speed over a 100 TB corpus.
  */
object TextAnalysis {

  /** Whitespace token count (simple space split — the cross-engine
    * deterministic baseline; a BPE-ish regex variant below). */
  def tokenCount(text: Column): Column = size(split(trim(text), " "))

  /** BPE-ish subword proxy: count of letter-runs, digit-runs and
    * non-space punctuation — approximates tokenizer unit count
    * without a vocab. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** English stopwords for the quality-signal ratio (fixed minimal
    * list — the signal wants "how much glue text", not linguistics). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** Per-document quality stats: token count, type-token ratio (bp),
    * punctuation ratio (bp), stopword ratio (bp), mean token length
    * (char). */
  def qualityStats(df0: DataFrame, text: String, id: String): DataFrame = {
    val df = graft.ops.Ops.parallelizeInput(df0, col(id))
    val toks = split(trim(col(text)), " ")
    val nTok = size(toks)
    val nChar = length(col(text))
    val punct = length(regexp_replace(col(text), "[^.,!?;:]", ""))
    val nStop = size(filter(transform(toks, t => lower(t)),
      t => t.isInCollection(Stopwords)))
    df.select(col(id),
      nTok.as("n_tokens"),
      floor(lit(10000.0) * size(array_distinct(toks)) / nTok + 0.5)
        .cast("long").as("ttr_bp"),
      floor(lit(10000.0) * punct / nChar + 0.5).cast("long").as("punct_bp"),
      floor(lit(10000.0) * nStop / nTok + 0.5).cast("long").as("stopword_bp"),
      floor(lit(100.0) * (nChar - (nTok - 1)) / nTok + 0.5)
        .cast("long").as("mean_tok_len_c"))
  }

  /** Stopword-class patterns for the n-gram language heuristic. */
  val LangPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "de" -> "\\b(der|die|das|und|nicht)\\b",
    "fr" -> "\\b(le|les|et|des|une)\\b",
    "es" -> "\\b(el|los|las|y|una)\\b")

  /** Language id by stopword-class argmax with fixed priority order on
    * ties (en > de > fr > es) — a deterministic heuristic, not a
    * model. Adds one count column per language plus `pred_lang`. */
  def langId(df0: DataFrame, text: String, id: String): DataFrame = {
    val df = graft.ops.Ops.parallelizeInput(df0, col(id))
    val lowered = lower(col(text))
    val counts = LangPatterns.map { case (l, p) =>
      regexp_count(lowered, lit(p)).as(s"n_$l")
    }
    val withCounts = df.select((col(id) +: counts): _*)
    val Seq(en, de, fr, es) = LangPatterns.map(lp => col(s"n_${lp._1}"))
    withCounts.withColumn("pred_lang",
      when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es"))
  }

  /** Exact corpus-wide heavy hitters: the k most frequent whitespace
    * tokens with a total (count desc, token asc) tie-break. One
    * map-side-combined aggregation — the explode never crosses the
    * wire raw, only per-partition (token, partial count) rows shuffle —
    * then a TakeOrdered of k rows. The exact counterpart of a
    * count-min/space-saving sketch: at 100 TB the shuffled partials
    * are bounded by (partitions × distinct tokens per partition), and
    * vocabulary grows sublinearly in corpus size. */
  def topTokens(df: DataFrame, text: String, k: Int): DataFrame =
    graft.ops.Ops.parallelizeInput(df)
      .select(explode(split(trim(col(text)), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Count-min sketch token-frequency estimates — the bounded-memory
    * companion of [[topTokens]]' exact aggregation and the second
    * canonical streaming sketch next to the HLL
    * ([[distinctTokenSketch]]). Four hash lanes come from ONE md5
    * digest per occurrence ([[graft.functions.Md5LanesExpr]] — the
    * minhash digest-splitting trick), each occurrence increments one
    * of `width` buckets per lane, and a point estimate is the MIN of
    * its four bucket counts — an overestimate by construction (every
    * stage exact integer arithmetic, so the DuckDB oracle replays
    * registers and estimates verbatim). Output: the exact top-`k`
    * tokens with their true counts and their sketch estimates
    * (`cms_est >= n` always; the gap is the collision noise the
    * ε = e/width bound prices).
    *
    * 100 TB story: the register table is d × width rows REGARDLESS of
    * corpus size — the frequency shuffle carries (lane, bucket) keys
    * only, partial counts combine map-side, and probing is a
    * broadcast-sized join against the fixed-size sketch (unlike the
    * exact path, whose group-by state is the full vocabulary). */
  def cmsTokenEstimates(df: DataFrame, text: String,
                        width: Int = 256, k: Int = 25): DataFrame =
    cmsFromRegisters(cmsRegisters(df, text, width), df, text, width, k)

  /** CMS partial registers (lane, bucket, cnt) for ONE input slice —
    * exact occurrence counts, so partials merge by SUM: any partition
    * of the corpus into batches sums to the single-pass registers,
    * PROVIDED each batch lands exactly once. Unlike the HLL's
    * idempotent max-merge, a replayed count partial double-counts —
    * the `batch_id=` dynamic-overwrite sink
    * ([[graft.streaming.Streaming.cmsStream]]) is load-bearing, not
    * belt-and-braces (the spec proves a duplicated partial moves the
    * estimate). */
  def cmsRegisters(df: DataFrame, text: String,
                   width: Int = 256): DataFrame = {
    graft.functions.Md5LanesExpr.register(df.sparkSession)
    graft.ops.Ops.parallelizeInput(df)
      .select(explode(split(trim(col(text)), " ")).as("token"))
      .select(posexplode(graft.functions.Md5LanesExpr
        .of(col("token").cast("binary"))).as(Seq("lane", "h32")))
      .select(col("lane"), (col("h32") % width).as("bucket"))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Assemble graded CMS estimates from (possibly per-batch partial)
    * registers: SUM-merge per (lane, bucket), then probe the top-`k`
    * exact tokens of `df` — shared by the batch row and the streamed
    * sink so the merge-equals-single-pass guarantee is what the
    * shared oracle SQL proves. */
  def cmsFromRegisters(regs: DataFrame, df: DataFrame, text: String,
                       width: Int, k: Int): DataFrame = {
    graft.functions.Md5LanesExpr.register(df.sparkSession)
    val merged = regs.groupBy(col("lane"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val probes = topTokens(df, text, k)
      .select(col("token"), col("n"),
        posexplode(graft.functions.Md5LanesExpr
          .of(col("token").cast("binary"))).as(Seq("lane", "h32")))
      .select(col("token"), col("n"), col("lane"),
        (col("h32") % width).as("bucket"))
    probes.join(broadcast(merged), Seq("lane", "bucket"))
      .groupBy(col("token"), col("n"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("n").desc, col("token"))
  }

  /** Repetition quality signals per document over word k-grams — the
    * within-document counterpart of cross-document dedup (boilerplate,
    * keyword stuffing and generation loops show up as repeated n-grams
    * long before they show up as duplicate documents). Per document:
    * n_grams (total k-gram occurrences), dup_gram_bp (fraction of
    * occurrences whose k-gram repeats within the document, basis
    * points), top_gram_bp (fraction contributed by the single most
    * frequent k-gram). Two keyed aggregations — (id, gram) then (id) —
    * so state is per-document and the pipeline scales like any grouped
    * agg; documents with fewer than k tokens produce no row. */
  def repetitionSignals(df: DataFrame, text: String, id: String,
                        k: Int = 2): DataFrame = {
    val grams = Dedup.shinglesFromToks(Dedup.tokenize(df, text, id), id, k,
      dedup = false)
    val perGram = grams.groupBy(col(id), col("shingle"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col(id))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_occ"),
        max(col("c")).as("top_c"))
      .select(col(id), col("n_grams"),
        floor(lit(10000.0) * col("dup_occ") / col("n_grams") + 0.5)
          .cast("long").as("dup_gram_bp"),
        floor(lit(10000.0) * col("top_c") / col("n_grams") + 0.5)
          .cast("long").as("top_gram_bp"))
  }

  /** TF-IDF salient terms: the top-k most distinctive tokens per
    * document — the standard relevance/curation primitive (keyword
    * extraction, topic balancing, retrieval features). Corpus-wide
    * document frequency joined onto per-document term frequency, score
    * = tf · idf, top-k by a TOTAL (score desc, term asc) order so the
    * result set is deterministic.
    *
    * `logIdf = false` (default) scores with the rational idf
    * (N+1)/(df+1) instead of its logarithm: every arithmetic step is
    * then one exact-rounded IEEE multiply/divide, bit-reproducible in
    * the SQL oracle — `ln` implementations differ by ulps across
    * engines' libm, which is exactly the kind of silent divergence the
    * hash gate exists to catch. Pass `logIdf = true` for the classic
    * log damping in production ranking (same pipeline shape, engine-
    * local determinism only).
    *
    * Scale: tf is a (doc, term) aggregate, df a (term) aggregate, the
    * join a standard shuffle on term (vocabulary grows sublinearly in
    * corpus size), the top-k a per-document window — all keyed, no
    * driver data path; the corpus row count is the one scalar pulled
    * to the driver. */
  def tfidfTopTerms(df0: DataFrame, text: String, id: String, k: Int = 3,
                    logIdf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df0.count()
    // materialized once: both `dfreq` and the join below consume `tf`,
    // and without the checkpoint each re-runs the tokenize→explode→agg
    // shuffle over the corpus (the repo's measured decision rule:
    // checkpoint wins when consumers re-run a shuffle — warm reps
    // 0.96–2.5 s → 0.86–1.05 s at sf0.1/local[32])
    val tf = Dedup.tokenize(df0, text, id)
      .select(col(id), explode(col("toks")).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = col("tf") * lit(nDocs + 1) / (col("df") + lit(1))
    val score = if (logIdf) col("tf") * log(lit(nDocs + 1.0) / (col("df") + 1)) else idf
    tf.join(dfreq, Seq("term"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col(id), col("term"), col("tf"), col("df"),
        floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
        col("rank").cast("long").as("rank"))
  }

  /** BM25 top-k retrieval — the lexical ranking function behind every
    * published retrieval/RAG data pipeline, in exact-replayable form.
    * `queries` is a tiny (query_id, term) set; each query's terms probe
    * the corpus inverted index (the (id, term, tf) aggregate) and each
    * matching document scores Σ_t idf(t) · tf-saturation(t, d) with the
    * standard k1 = 1.2, b = 0.75 Okapi constants.
    *
    * Exactness (the tfidf rule, extended): k1 and b are RATIONAL, so
    * both factors reduce to one IEEE divide of exact integers —
    * idf = (2N−2df+1)/(2df+1) (Robertson's (N−df+0.5)/(df+0.5)
    * without the libm-dependent log; monotone-identical ordering) and
    * tf-part = 22·T·tf / (10·T·tf + 3·T + 9·dl·N) (the Okapi formula
    * with numerator and denominator cleared by 10·T, T = total corpus
    * tokens, dl = document length). Each term's score is quantized
    * ⌊·10⁶+0.5⌋ BEFORE the per-document sum, so the sum is an
    * order-independent integer — bit-reproducible in the oracle.
    *
    * 100 TB story: the query set is broadcast (a query side is human-
    * sized); the corpus side is the tf aggregate joined once on term —
    * only rows matching a query term survive the join, so the rank
    * window sees candidate docs only. The exact integer products
    * assume corpus token counts < 2⁶²/22 (~2·10¹⁷ tokens — beyond any
    * real corpus); past that the same plan runs with plain float
    * scoring, engine-local determinism only.
    * Output: (query_id, doc id, n_hit_terms, score_e6, rank ≤ k). */
  def bm25TopK(df0: DataFrame, text: String, id: String,
               queries: DataFrame, k: Int = 10): DataFrame =
    // tf has three consumers (df, dl, probe join): materialize once
    bm25Score(bm25TfIndex(df0, text, id).localCheckpoint(),
      df0.count(), id, queries, k)

  /** The BM25 inverted index: the (id, term, tf) aggregate [[bm25TopK]]
    * scores against. Split out so an incremental pipeline can MAINTAIN
    * it per ingest batch ([[graft.streaming.Streaming.bm25IndexStream]])
    * — a document's tf rows are self-contained, so the index is
    * append-only under an append-only corpus, and every corpus-global
    * statistic (df, dl, N, total) derives from it at scoring time. */
  def bm25TfIndex(df0: DataFrame, text: String, id: String): DataFrame =
    Dedup.tokenize(df0, text, id)
      .select(col(id), explode(col("toks")).as("term"))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))

  /** Score queries against a PERSISTED tf index (the assembly-time
    * half of the incremental pipeline). N is the index's distinct
    * document count — identical to the corpus row count, since
    * whitespace tokenization yields ≥ 1 term per document. */
  def bm25FromIndex(tf0: DataFrame, id: String, queries: DataFrame,
                    k: Int = 10): DataFrame = {
    val tf = tf0.localCheckpoint()
    bm25Score(tf, tf.select(col(id)).distinct().count(), id, queries, k)
  }

  private def bm25Score(tf: DataFrame, nDocs: Long, id: String,
                        queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col(id)).agg(sum(col("tf")).as("dl"))
    val total = dl.agg(sum(col("dl"))).head.getLong(0)
    val idf = (lit(2L) * nDocs - lit(2L) * col("df") + 1).cast("double") /
      (lit(2L) * col("df") + 1)
    val tfPart = (lit(22L) * total * col("tf")).cast("double") /
      (lit(10L) * total * col("tf") + lit(3L) * total +
        lit(9L) * col("dl") * nDocs)
    val perTerm = tf
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()),
        Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(id))
      .select(col("query_id"), col(id),
        floor(idf * tfPart * 1000000 + 0.5).cast("long").as("s_e6"))
    perTerm.groupBy(col("query_id"), col(id))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("s_e6")).as("score_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_e6").desc, col(id))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-document CROSS-corpus duplication profile — the dedup-audit
    * signal between [[repetitionSignals]] (within-document repeats)
    * and the removal operators ([[graft.llm.Dedup.removeBoilerplate]],
    * line/span dedup): for each document, what share of its word
    * k-gram occurrences is shared with at least `minDf − 1` OTHER
    * documents (`dup_bp`, exact basis points), and the widest spread
    * of any of its grams (`max_gram_df`). The standard pre-dedup
    * forensic: a high dup_bp flags boilerplate-heavy or near-copied
    * documents BEFORE committing to a removal pass, and the
    * distribution over the corpus sizes the dedup problem itself.
    * Documents with fewer than k tokens produce no row (no k-grams —
    * same rule as repetitionSignals).
    *
    * 100 TB story: [[graft.llm.Dedup.removeBoilerplate]]'s shape —
    * grams shuffle as 64-bit md5 hashes (16 bytes however long the
    * gram), stages are (id, h) / (h) keyed aggregates and one
    * equi-join back; the frequent set is unbounded at fleet scale, so
    * it returns via the join, never broadcast. The oracle rebuilds the
    * same h64 in SQL, so hash collisions (if any) merge identically
    * in both engines. */
  def crossDocDuplication(df: DataFrame, text: String, id: String,
                          k: Int = 5, minDf: Int = 2): DataFrame = {
    require(minDf >= 2, "minDf < 2 would flag every gram as duplicated")
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val occ = Dedup.shinglesFromToks(Dedup.tokenize(df, text, id), id, k,
        dedup = false)
      .select(col(id), Dedup.md5Hash64(col("shingle")).as("h"))
      .groupBy(col(id), col("h")).agg(count(lit(1)).as("c"))
    val dfreq = occ.groupBy(col("h")).agg(count(lit(1)).as("df"))
    occ.join(dfreq, Seq("h"))
      .groupBy(col(id))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("df") >= minDf, col("c")).otherwise(lit(0L)))
          .as("dup_occ"),
        max(col("df")).as("max_gram_df"))
      .select(col(id), col("n_grams"),
        floor(lit(10000.0) * col("dup_occ") / col("n_grams") + 0.5)
          .cast("long").as("dup_bp"),
        col("max_gram_df"))
  }

  /** Corpus-LM fluency scoring — the CCNet-style quality axis the
    * stats/gate signals don't cover: how PROBABLE a document's text is
    * under a language model trained on the corpus itself. The model is
    * an exact count-based unigram+bigram LM (the published pipelines
    * score with KenLM; the counting form is the same signal with no
    * external model, and every step is integer-exact so the DuckDB
    * oracle reproduces it bit-for-bit):
    *
    *  - `uni_score_e12` — mean corpus probability of the document's
    *    tokens: Σᵢ c(tᵢ) / (n·total), a single exact-rounded divide of
    *    exact longs, ×10¹² quantized. High = common words; very low =
    *    gibberish/OOV-heavy.
    *  - `bi_score_e6` — mean bigram continuation probability: per
    *    bigram, q = ⌊10⁶·c₂(xy)/c₁(x)+0.5⌋ (exact divide of exact
    *    longs), then ⌊Σq/m+0.5⌋. High = stereotyped/repetitive
    *    phrasing; low = incoherent token salad. Documents shorter than
    *    2 tokens get no row.
    *
    * Scale: two corpus-wide keyed aggregates (vocabulary / bigram
    * vocabulary, both sublinear in corpus size, map-side combined),
    * two equi-joins on the token/bigram key, one per-document
    * aggregate — tfidf's exact shuffle shape, no driver data path but
    * the one total-count scalar. */
  /** Interpolated Kneser–Ney bigram log-probability — the smoothing
    * family the published LM-filter pipelines actually run (CCNet's
    * KenLM is a KN model), as exact integer arithmetic: with discount
    * d = 3/4,
    *
    *   P(w₂|w₁) = max(c₁₂−d, 0)/c₁ + (d/c₁)·N₁₊(w₁,·)·P_cont(w₂),
    *   P_cont(w₂) = N₁₊(·,w₂)/N₁₊(··)
    *
    * which over a common denominator is the exact rational
    *   [(4·c₁₂−3)·N₁₊(··) + 3·N₁₊(w₁,·)·N₁₊(·,w₂)] / (4·c₁·N₁₊(··)),
    * so each bigram TYPE's log-probability is lq(num) − lq(den) in
    * [[graft.functions.Log2FixedExpr]]'s fixed-point units — integer
    * subtraction of quantized logs, bit-identical in the oracle's
    * 16-round log₂ chain — and a document's score is the integer sum
    * over its bigram occurrences. Scoring the corpus under its own
    * model means every bigram is observed (c₁₂ ≥ 1): no unseen-event
    * branch. Numerators stay inside 2⁶³ up to ~10⁹ bigram types ×
    * ~10⁹ max count — the IVF trainer's documented fleet bound.
    *
    * Scale shape: per-TYPE weights (keyed aggregates over the bigram
    * vocabulary — sublinear in the corpus, map-side combined; the one
    * driver scalar is the distinct-bigram count), then occurrences
    * join their type weight on (w₁, w₂) and sum per document. Output:
    * (id, n_bigrams, kn_q); documents under 2 tokens get no row. */
  def knBigramScore(df: DataFrame, text: String, id: String): DataFrame = {
    graft.functions.Log2FixedExpr.register(df.sparkSession)
    def lq(c: Column) = graft.functions.Log2FixedExpr.of(c)
    val toks = graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), split(trim(col(text)), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val bg = toks
      .select(col(id), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col(id), element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))
    // the bigram-type table feeds four aggregates and the weight join:
    // checkpoint once (the ngramJaccardPairs materialization rule)
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12")).localCheckpoint()
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val n1c = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1c"))
    val n1pp = c12.count() // one scalar — the model-state rule
    val w = c12.join(c1, Seq("w1")).join(n1c, Seq("w2"))
      .select(col("w1"), col("w2"),
        (lq((lit(4L) * col("c12") - 3L) * n1pp +
            lit(3L) * col("n1p") * col("n1c")) -
          lq(lit(4L) * col("c1") * n1pp)).as("wq"))
    bg.join(w, Seq("w1", "w2"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wq")).as("kn_q"))
  }

  def lmFluency(df0: DataFrame, text: String, id: String): DataFrame = {
    val toks = Dedup.tokenize(df0, text, id)
    val uni = toks.select(col(id), explode(col("toks")).as("term"))
    val c1 = uni.groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val total = c1.agg(sum(col("c1"))).head.getLong(0)
    val uniScore = uni.join(c1, Seq("term"))
      .groupBy(col(id))
      .agg(sum(col("c1")).as("sum_c"), count(lit(1)).as("n_tok"))
      .select(col(id),
        floor(col("sum_c") * lit(1e12) / (col("n_tok") * lit(total.toDouble))
          + 0.5).cast("long").as("uni_score_e12"),
        col("n_tok"))
    val bi = Dedup.shinglesFromToks(toks, id, 2, dedup = false)
    val c2 = bi.groupBy(col("shingle")).agg(count(lit(1)).as("c2"))
    val biScore = bi.join(c2, Seq("shingle"))
      .withColumn("term", substring_index(col("shingle"), " ", 1))
      .join(c1, Seq("term"))
      .withColumn("q", floor(col("c2") * lit(1000000.0) / col("c1") + 0.5)
        .cast("long"))
      .groupBy(col(id))
      .agg(floor(sum(col("q")) / count(lit(1)) + 0.5).cast("long")
        .as("bi_score_e6"))
    uniScore.join(biScore, Seq(id))
      .select(col(id), col("n_tok"), col("uni_score_e12"), col("bi_score_e6"))
  }

  /** CCNet-style perplexity bucketing: rank every document within its
    * stratum (CCNet buckets per LANGUAGE) by model fit — here the
    * exact [[lmFluency]] bigram score, descending, id tie-break — and
    * cut the ranking into equal thirds: `head` (most model-like),
    * `middle`, `tail` (least). The published recipe trains on
    * head+middle and drops or down-weights tail; this emits the label
    * so any policy can filter on it. Documents shorter than 2 tokens
    * carry no fluency score and get no row, exactly like [[lmFluency]].
    *
    * Scale: [[lmFluency]]'s two keyed aggregates plus one rank window
    * and one count window, BOTH partitioned by the stratum — per-
    * language partitions are the parallelism unit (what per-language
    * bucketing means), so no global sort at any corpus size. Every
    * boundary comparison is integer (rk·3 ≤ n), so the DuckDB oracle
    * reproduces the labels exactly. Output:
    * (id, stratum, bi_score_e6, bucket). */
  def perplexityBuckets(df: DataFrame, text: String, id: String,
                        stratum: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmFluency(df, text, id)
    val joined = df.select(col(id), col(stratum)).join(scored, Seq(id))
    val w = Window.partitionBy(col(stratum))
      .orderBy(col("bi_score_e6").desc, col(id))
    joined
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(stratum))))
      .select(col(id), col(stratum), col("bi_score_e6"),
        when(col("__rk") * 3 <= col("__n"), lit("head"))
          .when(col("__rk") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Target-domain importance weights — the scoring step of
    * importance-resampling data selection (DSIR-style: score every
    * corpus document by how much better its tokens fit a TARGET
    * domain's distribution than the corpus's own, then sample by
    * weight). The published recipe sums log(p_target/p_raw) over
    * hashed n-grams; `log` is libm-dependent (not cross-engine exact),
    * so — like tfidf's rational idf — the score here is the mean
    * quantized likelihood RATIO with add-one smoothing:
    * per token, q = ⌊(c_t+1)·(R+V) · 2²⁰ / ((c_r+1)·(T+V)) + 0.5⌋
    * where c_t/c_r are the token's target/corpus counts, T/R the
    * total target/corpus token counts, V the union vocabulary size —
    * exact long products, one exactly-rounded IEEE multiply+divide
    * (bit-equal in any IEEE engine), exact long sum, one final exact
    * divide. Monotone in the same "more target-like" signal as the
    * log form. q > 2²⁰ means the token is more likely under the
    * target than the corpus.
    *
    * Scale: two vocabulary-keyed count aggregates (target side is the
    * small one), two equi-joins on the token key, one per-document
    * aggregate — lmFluency's shuffle shape; the only driver values are
    * the three scalars T, R, V. Output: (id, n_tok, dsir_q20). */
  def targetDomainWeights(corpus: DataFrame, target: DataFrame,
                          text: String, id: String): DataFrame = {
    val uni = Dedup.tokenize(corpus, text, id)
      .select(col(id), explode(col("toks")).as("term"))
    val tUni = Dedup.tokenize(target, text, id)
      .select(explode(col("toks")).as("term"))
    val cr = uni.groupBy(col("term")).agg(count(lit(1)).as("c_r"))
    val ct = tUni.groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val bigR = cr.agg(sum(col("c_r"))).head.getLong(0)
    val bigT = ct.agg(sum(col("c_t"))).head.getLong(0)
    val v = cr.select(col("term"))
      .union(ct.select(col("term"))).distinct().count()
    uni.join(cr, Seq("term"))
      .join(ct, Seq("term"), "left")
      .select(col(id),
        floor((coalesce(col("c_t"), lit(0L)) + 1L) * lit(bigR + v)
            * lit(1048576.0)
            / ((col("c_r") + 1L) * lit(bigT + v)) + 0.5)
          .cast("long").as("q"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tok"),
        floor(sum(col("q")).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("dsir_q20"))
  }

  /** PII patterns for detection/redaction: (name, regex, replacement).
    * The regexes stay inside the RE2 ∩ java.util.regex common subset
    * (character classes, bounded repetition, ASCII \b) so the Spark
    * scan and the DuckDB oracle match byte-identically. Deliberately
    * high-precision shapes — a corpus scrub wants "definitely an
    * email", not "anything with an @". */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** PII detection + redaction — the standard pre-training scrub
    * (emails, IPv4s, international-format phone numbers). Per document:
    * one count per pattern over the ORIGINAL text, plus the md5 and
    * length of the redacted text (patterns applied in [[PiiPatterns]]
    * order; replacement tokens contain no digits or '@', so later
    * patterns never match inside an earlier replacement). A pure
    * narrow projection of codegen'd regex ops — scan speed at 100 TB,
    * no shuffle. */
  /** The redaction transform of [[redactPii]] as a reusable Column —
    * also the scrub stage of [[Curation.pipeline]]. */
  def redactText(text: Column): Column =
    PiiPatterns.foldLeft(text) {
      case (c, (_, p, r)) => regexp_replace(c, p, r)
    }

  def redactPii(df0: DataFrame, text: String, id: String): DataFrame = {
    val df = graft.ops.Ops.parallelizeInput(df0, col(id))
    val counts = PiiPatterns.map { case (n, p, _) =>
      regexp_count(col(text), lit(p)).cast("long").as(s"n_$n")
    }
    val redacted = redactText(col(text))
    df.select((col(id) +: counts) :+
      length(redacted).cast("long").as("redacted_len") :+
      md5(redacted.cast("binary")).as("redacted_md5"): _*)
  }

  /** Planted PII for gate non-vacuity: the synthetic corpus has no
    * '@', no digits — a redaction row over it would prove two engines
    * agree on zero. Appends deterministic id-derived PII to a subset
    * of documents (email on id%7=0, IPv4 on id%5=0, phone on id%11=0),
    * every step exact string arithmetic mirrored in the DuckDB oracle
    * — the planted-pair protocol of [[Similarity.withPlantedDups]]
    * applied to text. */
  def withPlantedPii(df: DataFrame, text: String, id: String): DataFrame = {
    val d = col(id).cast("string")
    val planted = concat(col(text),
      when(pmod(col(id), lit(7)) === 0,
        concat(lit(" contact user"), d, lit("@example.com"))).otherwise(lit("")),
      when(pmod(col(id), lit(5)) === 0,
        concat(lit(" from 10."), pmod(col(id), lit(256)).cast("string"),
          lit(".0."), pmod(col(id), lit(100)).cast("string"))).otherwise(lit("")),
      when(pmod(col(id), lit(11)) === 0,
        concat(lit(" call +1-415-555-"),
          lpad(pmod(col(id), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    df.withColumn(text, planted)
  }

  /** HTML character entities decoded by [[stripMarkup]], applied in
    * order — `&amp;` LAST, the single-pass convention: `&amp;lt;`
    * decodes to the literal text `&lt;`, not to `<` (decoding it to
    * `<` would un-escape content the author explicitly escaped). */
  val MarkupEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Markup stripping — the first step of every web-corpus pipeline
    * (raw crawl HTML → trainable text): drop comments, drop tags,
    * decode the common character entities, collapse whitespace. Per
    * document: n_tags (tag count in the ORIGINAL text), clean_len and
    * clean_md5 of the cleaned text. A pure narrow projection of
    * codegen'd regex/replace ops — scan speed at 100 TB, no shuffle;
    * the regexes live in the RE2 ∩ java.util.regex common subset so
    * the DuckDB oracle reproduces the cleaned bytes exactly.
    *
    * Comments are stripped BEFORE tags (a comment may contain `--`
    * but never `<`/`>` by the HTML grammar), and entities are decoded
    * AFTER tag stripping — `&lt;b&gt;` is content, not markup, and
    * must survive as the literal text `<b>`. */
  /** The cleaning transform of [[stripMarkup]] as a reusable Column —
    * also the first stage of [[Curation.pipeline]]. */
  def stripMarkupText(text: Column): Column = {
    val noComments = regexp_replace(text, "<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^<>]+>", " ")
    val decoded = MarkupEntities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, " +", " "))
  }

  def stripMarkup(df0: DataFrame, text: String, id: String): DataFrame = {
    val df = graft.ops.Ops.parallelizeInput(df0, col(id))
    val cleaned = stripMarkupText(col(text))
    df.select(col(id),
      regexp_count(col(text), lit("<[^<>]+>")).cast("long").as("n_tags"),
      length(cleaned).cast("long").as("clean_len"),
      md5(cleaned.cast("binary")).as("clean_md5"))
  }

  /** Planted markup for gate non-vacuity: the synthetic corpus has no
    * '<' — a markup-strip row over it would prove two engines agree on
    * the identity function. Wraps/appends deterministic id-derived
    * markup (block wrapper on id%3=0, link with encoded entities on
    * id%4=0, comment+void tag on id%5=0), mirrored verbatim in the
    * DuckDB oracle. */
  def withPlantedMarkup(df: DataFrame, text: String, id: String): DataFrame =
    df.withColumn(text, concat(
      when(pmod(col(id), lit(5)) === 0, lit("<!-- header --><br/> "))
        .otherwise(lit("")),
      when(pmod(col(id), lit(3)) === 0,
          concat(lit("<div class=\"doc\"><p>"), col(text), lit("</p></div>")))
        .otherwise(col(text)),
      when(pmod(col(id), lit(4)) === 0,
          lit(" <a href=\"https://ex.am/p?q=1&amp;r=2\">click &lt;here&gt;</a>"))
        .otherwise(lit(""))))

  /** Composite quality gate — the C4/Gopher-style document filter that
    * turns the individual signals into one keep/drop verdict. A
    * document is kept iff every rule passes; `reasons` is the OR of
    * the failed rules' bits so a curation run can report WHY documents
    * were dropped (the standard audit output of a filtering stage):
    * 1 = too short, 2 = too long, 4 = mean token length out of range,
    * 8 = low type-token ratio, 16 = repeated n-grams, 32 = too few
    * stopwords. Signals are the integer-exact basis-point columns of
    * [[qualityStats]] and [[repetitionSignals]] — the whole verdict is
    * cross-engine exact. Narrow scan + one per-document grouped agg
    * (the k-gram signal); joins on the document id. */
  def qualityGate(df: DataFrame, text: String, id: String, k: Int = 2,
                  minTokens: Long = 20L, maxTokens: Long = 1000L,
                  minMeanTokLenC: Long = 300L, maxMeanTokLenC: Long = 700L,
                  minTtrBp: Long = 3000L, maxDupGramBp: Long = 2000L,
                  minStopwordBp: Long = 100L): DataFrame = {
    val q = qualityStats(df, text, id)
    val r = repetitionSignals(df, text, id, k)
      .select(col(id), col("dup_gram_bp"))
    def bit(cond: Column, b: Int) = when(cond, lit(b.toLong)).otherwise(lit(0L))
    q.join(r, Seq(id), "left")
      .withColumn("dup_gram_bp", coalesce(col("dup_gram_bp"), lit(0L)))
      .withColumn("reasons",
        bit(col("n_tokens") < minTokens, 1) +
        bit(col("n_tokens") > maxTokens, 2) +
        bit(col("mean_tok_len_c") < minMeanTokLenC ||
            col("mean_tok_len_c") > maxMeanTokLenC, 4) +
        bit(col("ttr_bp") < minTtrBp, 8) +
        bit(col("dup_gram_bp") > maxDupGramBp, 16) +
        bit(col("stopword_bp") < minStopwordBp, 32))
      .withColumn("keep", col("reasons") === 0L)
  }

  /** Truncation-loss report — the context-length sizing table: for
    * each candidate window `lengths(i)`, how many documents exceed it
    * and how many tokens a hard truncation at that length would drop
    * (the standard question before fixing max_seq_len: chunking keeps
    * the tail, truncation loses it — this prices the difference).
    * Exact integers: per doc, lost(L) = max(n_tok − L, 0); the report
    * is Σ over the corpus per L plus the basis-point fraction. One
    * narrow projection + |lengths| conditional sums folded into ONE
    * keyed-free aggregate (map-side combined) — dashboard-sized output
    * at any corpus scale. Output: (ctx_len, n_docs_over, tokens_lost,
    * tokens_total, lost_bp) one row per candidate length. */
  def truncationReport(df: DataFrame, text: String, id: String,
                       lengths: Seq[Int] = Seq(512, 2048, 8192)
                      ): DataFrame = {
    require(lengths.nonEmpty, "need at least one candidate length")
    val n = size(split(trim(col(text)), " ")).cast("long")
    val base = graft.ops.Ops.parallelizeInput(df, col(id))
      .select(n.as("n_tok"))
    val aggs = lengths.flatMap { l =>
      Seq(sum(when(col("n_tok") > l, 1L).otherwise(0L)).as(s"__over_$l"),
        sum(when(col("n_tok") > l, col("n_tok") - l).otherwise(0L))
          .as(s"__lost_$l"))
    } :+ sum(col("n_tok")).as("__total")
    val one = base.agg(aggs.head, aggs.tail: _*)
    // empty corpus (or all-empty texts): the conditional sums come
    // back null and the ratio would be null/NaN — coalesce to 0 and
    // guard the division so every candidate length still reports a
    // well-typed zero row
    val rows = lengths.map { l =>
      struct(lit(l.toLong).as("ctx_len"),
        coalesce(col(s"__over_$l"), lit(0L)).as("n_docs_over"),
        coalesce(col(s"__lost_$l"), lit(0L)).as("tokens_lost"))
    }
    one.select(explode(array(rows: _*)).as("r"),
        coalesce(col("__total"), lit(0L)).as("__total"))
      .select(col("r.ctx_len"), col("r.n_docs_over"),
        col("r.tokens_lost"), col("__total").as("tokens_total"),
        when(col("__total") > 0,
          floor(lit(10000.0) * col("r.tokens_lost") / col("__total") + 0.5)
            .cast("long")).otherwise(0L).as("lost_bp"))
  }

  /** Per-slice curation report — the audit table every filtering run
    * produces: for each value of `dims` (source, language, shard, …),
    * document and token counts before and after the [[qualityGate]],
    * plus the kept fraction in basis points. One grouped aggregation
    * over |dims| keys after the gate's per-document verdict — report
    * cardinality is the dimension cross product, so the output is
    * dashboard-sized at any corpus scale. */
  def corpusReport(df: DataFrame, text: String, id: String,
                   dims: Seq[String]): DataFrame = {
    val gate = qualityGate(df, text, id)
      .select(col(id), col("n_tokens").cast("long").as("n_tokens"), col("keep"))
    df.select(col(id) +: dims.map(col): _*)
      .join(gate, Seq(id))
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("sum_kept_tokens"))
      .withColumn("kept_bp",
        floor(lit(10000.0) * col("n_kept") / col("n_docs") + 0.5).cast("long"))
  }

  /** Planted within-document repetition (generation-loop shape) for
    * gate non-vacuity: appends the same 4-token phrase 8 times to
    * every `every`-th document, driving its duplicate-2-gram fraction
    * past any threshold. Mirrored verbatim in the DuckDB oracle. */
  def withPlantedRepetition(df: DataFrame, text: String, id: String,
                            every: Int = 6): DataFrame =
    df.withColumn(text,
      when(pmod(col(id), lit(every)) === 0,
        concat(col(text), repeat(lit(" click here to win"), 8)))
        .otherwise(col(text)))

  /** Canonical-form fingerprint: lowercase → strip non-alphanumerics →
    * collapse whitespace → md5. Collisions ⇒ near-identical documents
    * modulo case/punctuation/spacing (a dedup key). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")).cast("binary"))

  /** Content-defined rolling fingerprint: md5-derived 64-bit hash of
    * each k-token window, min-sampled — a locality-sensitive document
    * sketch that survives local edits (used for shift-tolerant dedup
    * keys). Cross-engine hash ⇒ DuckDB-checkable like simhash. */
  def rollingMinFingerprint(df: DataFrame, text: String, id: String,
                            k: Int = 8): DataFrame = {
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    // min() is duplicate-invariant → skip the shingle distinct (one
    // less shuffle, same trick as the min-wise minhash path)
    Dedup.shinglesFromToks(Dedup.tokenize(df, text, id), id, k, dedup = false)
      .groupBy(col(id))
      .agg(min(Dedup.md5Hash64(col("shingle"))).as("roll_fp"))
  }

  /** Per-group approximate distinct-token count via the mergeable HLL
    * sketch ([[graft.functions.HllAgg]]). Output: one row per
    * (group, bucket) with the register value, plus the group's exact
    * harmonic denominator `s_sum = ∑ 2^(RhoCap − reg)` and the integer
    * estimate `EstNum div s_sum` — every value exact integer
    * arithmetic, so the DuckDB oracle replays registers AND estimate
    * bit-for-bit (trailing-zero rank: `bit_count((w & -w) - 1)`).
    *
    * 100 TB story: the whole point of the sketch — counting distinct
    * tokens per language with `COUNT(DISTINCT)` shuffles every
    * distinct (group, token) pair; this plan's only exchange carries
    * 64-byte partial buffers, one per (map task, group), merged by
    * elementwise max. The explode is narrow; the input repartition is
    * the standard small-input parallelism guard (fleet scans exceed
    * the target and skip it). */
  def distinctTokenSketch(df: DataFrame, text: String, group: String,
                          id: String): DataFrame = {
    val sketched = tokenSketchArrays(df, text, group, id)
      .withColumn("s_sum", expr(
        s"aggregate(regs, CAST(0 AS BIGINT), " +
          s"(a, r) -> a + CAST(pow(2, ${graft.functions.HllAgg.RhoCap} - r) AS BIGINT))"))
      .withColumn("est", expr(s"${graft.functions.HllAgg.EstNum}L div s_sum"))
    sketched.select(col(group), col("s_sum"), col("est"),
        posexplode(col("regs")).as(Seq("bucket", "register")))
      .select(col(group), col("bucket").cast("long").as("bucket"),
        col("register").cast("long").as("register"), col("s_sum"), col("est"))
  }

  /** The sketch's aggregation stage alone: one register array per
    * group ([[distinctTokenSketch]]'s plan minus the estimate
    * assembly) — the unit a micro-batch persists for incremental
    * maintenance ([[graft.streaming.Streaming.sketchStream]]). */
  private def tokenSketchArrays(df: DataFrame, text: String, group: String,
                                id: String): DataFrame = {
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    graft.functions.HllAgg.register(df.sparkSession)
    val toks = graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(group), explode(split(trim(col(text)), " ")).as("tok"))
    // top 60 bits of the md5 prefix — non-negative, so bucket/width
    // arithmetic matches DuckDB's ('0x' || substr(md5, 1, 15))::BIGINT
    toks.select(col(group),
        shiftrightunsigned(Dedup.md5Hash64(col("tok")), 4).as("h60"))
      .groupBy(col(group))
      .agg(graft.functions.HllAgg.hllOf(col("h60")).as("regs"))
  }

  /** [[tokenSketchArrays]] exploded to (group, bucket, register) rows
    * — the persistable register form. */
  def tokenSketchRegisters(df: DataFrame, text: String, group: String,
                           id: String): DataFrame =
    tokenSketchArrays(df, text, group, id)
      .select(col(group), posexplode(col("regs")).as(Seq("bucket", "register")))
      .select(col(group), col("bucket").cast("long").as("bucket"),
        col("register").cast("long").as("register"))

  /** Hashed-feature linear classifier scoring — the model-based
    * quality-filter stage (fasttext-style): features are unigrams and
    * word bigrams hashed into `width` buckets, the model is a
    * (bucket → weight) table joined by BROADCAST (a linear model is a
    * few MB however big the corpus — the realistic distribution
    * path), and a document's logit is the exact integer sum of its
    * features' quantized weights. `keep` = logit ≥ 0. Real deployments
    * load trained weights into the same table shape; here the weights
    * are a deterministic md5-derived stand-in so the DuckDB oracle
    * replays feature hashing, lookup and scores verbatim (a trained
    * model would be exactly as replayable — the weights are data, not
    * code).
    *
    * 100 TB story: the corpus side is one narrow explode (no shuffle
    * before the broadcast join); the per-document sum is a keyed
    * aggregation whose partial combine reduces each map task to one
    * row per document. The model never shuffles. */
  /** Top token co-occurrence pairs by PMI — association mining over
    * documents: for tokens a < b co-occurring (distinct per doc) in
    * ≥ `minDf` documents, PMI ≈ log₂(N·df_ab / (df_a·df_b)), computed
    * in [[graft.functions.Log2FixedExpr]]'s exact fixed-point units:
    * pmi_q = lq(N·df_ab) − lq(df_a·df_b) — integer subtraction of two
    * quantized logs, bit-identical in the oracle, ranking ties broken
    * on the pair. Scale: per-doc DISTINCT tokens explode to in-doc
    * pairs ROW-LOCALLY from the sorted token list (the posting-list
    * pair trick — no self-join), pair counts aggregate keyed with
    * map-side combine, and `maxTokensPerDoc` caps the quadratic
    * per-doc pair fan-out (docs are truncated to their first distinct
    * tokens — the documented bound, not a silent one). */
  def cooccurrencePmi(df: DataFrame, text: String, id: String,
                      minDf: Long = 20L, topK: Int = 50,
                      maxTokensPerDoc: Int = 64): DataFrame = {
    graft.functions.Log2FixedExpr.register(df.sparkSession)
    def lq(c: Column) = graft.functions.Log2FixedExpr.of(c)
    val toks = graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), slice(array_sort(array_distinct(
        split(trim(col(text)), " "))), 1, maxTokensPerDoc).as("t"))
      .localCheckpoint()
    val n = toks.count()
    val dfTok = toks.select(col(id), explode(col("t")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("df_a"))
    val pairIdx = flatten(transform(
      sequence(lit(0), size(col("t")) - 2),
      i => transform(sequence(i + 1, size(col("t")) - 1),
        j => struct(element_at(col("t"), i + 1).as("a"),
          element_at(col("t"), j + 1).as("b")))))
    // Docs with <2 distinct tokens have no pairs; without this guard
    // sequence(0, size-2) = sequence(0, -1) generates DESCENDING and
    // the i = -1 iteration hits element_at(t, 0), which throws.
    val pairs = toks.filter(size(col("t")) >= 2)
      .select(explode(pairIdx).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= minDf)
    pairs
      .join(dfTok, Seq("a"))
      .join(dfTok.toDF("b", "df_b"), Seq("b"))
      .select(col("a"), col("b"), col("df_ab"), col("df_a"), col("df_b"),
        (lq(lit(n) * col("df_ab")) - lq(col("df_a") * col("df_b")))
          .as("pmi_q"))
      .orderBy(col("pmi_q").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Modified n-gram precision — the clipped-count core of BLEU/ROUGE
    * run as a corpus-scale eval metric over (candidate, reference)
    * text pairs: per pair, Σ_g min(cnt_cand(g), cnt_ref(g)) ÷
    * Σ_g cnt_cand(g), for n = 1..maxN. Everything is exact integer
    * counting (explode grams, per-pair keyed counts, one clip-join,
    * one aggregate) with the single divide quantized to basis points
    * — no brevity penalty (its exp() is libm; report both lengths and
    * let the caller apply the penalty in their float world). Output
    * per pair: (id, n, cand_grams, clipped, p_bp, len_cand, len_ref).
    * Scale: grams travel per (id, n) — keyed joins only, candidates
    * and references never cross pairs. */
  def ngramPrecision(pairs: DataFrame, id: String, cand: String,
                     ref: String, maxN: Int = 2): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.sql.DataFrame
    def grams(textCol: String, side: String): DataFrame =
      graft.ops.Ops.parallelizeInput(pairs, col(id))
        .select(col(id), split(trim(col(textCol)), " ").as("t"))
        .select(col(id), col("t"),
          explode(sequence(lit(1), lit(maxN))).as("n"))
        .filter(size(col("t")) >= col("n"))
        .select(col(id), col("n"), col("t"),
          explode(sequence(lit(1), size(col("t")) - col("n") + 1)).as("i"))
        .select(col(id), col("n"),
          concat_ws(" ", slice(col("t"), col("i"), col("n"))).as("g"))
        .groupBy(col(id), col("n"), col("g"))
        .agg(count(lit(1)).as(s"c_$side"))
    val cg = grams(cand, "cand")
    val rg = grams(ref, "ref")
    val clipped = cg.join(rg, Seq(id, "n", "g"), "left")
      .groupBy(col(id), col("n"))
      .agg(sum(col("c_cand")).as("cand_grams"),
        sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
          .as("clipped"))
    val lens = pairs.select(col(id),
      size(split(trim(col(cand)), " ")).cast("long").as("len_cand"),
      size(split(trim(col(ref)), " ")).cast("long").as("len_ref"))
    clipped
      .withColumn("p_bp", floor(lit(10000.0) * col("clipped")
        / col("cand_grams") + 0.5).cast("long"))
      .join(lens, Seq(id))
      .select(col(id), col("n"), col("cand_grams"), col("clipped"),
        col("p_bp"), col("len_cand"), col("len_ref"))
  }

  /** Character-trigram posting index: (trigram, id) DISTINCT rows —
    * the Google-Code-Search primitive for index-accelerated substring
    * search over a corpus a full scan can't afford. Trigrams travel
    * as text (3 chars ≤ the md5 digest they'd otherwise become). */
  def trigramIndex(df: DataFrame, text: String, id: String): DataFrame =
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), col(text),
        explode(sequence(lit(1), length(col(text)) - 2)).as("i"))
      .select(col(id), expr(s"substring($text, i, 3)").as("tri"))
      .distinct()

  /** Index-accelerated substring search: a query string's own
    * trigrams AND-intersect over the posting index — a document can
    * contain the query only if it contains EVERY query trigram — and
    * only the surviving candidates pay the exact `contains`
    * verification against the text. The scan-vs-index contract: the
    * result is IDENTICAL to the full-scan LIKE (the oracle IS the
    * full scan), but the text is touched only for candidates, which
    * the rarest query trigram bounds. Queries shorter than 3 chars
    * fall back to the scan (no trigram to prune with) — returned
    * verified, never silently. Scale shape: the candidate step is one
    * semi-join-shaped aggregate on the index (count of matched
    * trigrams per doc = #query trigrams), the verify step a keyed
    * join touching candidates only. */
  def trigramSearch(df: DataFrame, text: String, id: String,
                    index: DataFrame, query: String): DataFrame = {
    require(query.nonEmpty, "empty query")
    val qTris = query.sliding(3).filter(_.length == 3).toSeq.distinct
    val base = df.select(col(id), col(text))
    if (qTris.isEmpty)
      base.filter(col(text).contains(query)).select(col(id))
    else {
      // countDistinct, not count: a replayed/duplicated index batch
      // (re-appended batch_id partition) would otherwise inflate the
      // per-doc row count past qTris.length and drop true matches.
      val cand = index
        .filter(col("tri").isInCollection(qTris))
        .groupBy(col(id)).agg(countDistinct(col("tri")).as("__m"))
        .filter(col("__m") === qTris.length)
        .select(col(id))
      base.join(cand, Seq(id), "left_semi")
        .filter(col(text).contains(query))
        .select(col(id))
    }
  }

  /** Hashed unigram+bigram feature stream: (id, bucket) one row per
    * feature occurrence — shared by [[classifierScore]] (scoring) and
    * [[perceptronTrain]] (training). */
  private[llm] def hashedFeatures(df: DataFrame, text: String, id: String,
                                  width: Int): DataFrame = {
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val toks = graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), split(trim(col(text)), " ").as("t"))
    val uni = toks.select(col(id),
      explode(col("t")).as("f")).select(col(id),
      concat(lit("u|"), col("f")).as("feat"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(col(id), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col(id), concat(lit("b|"),
        concat_ws(" ", slice(col("t"), col("i"), lit(2)))).as("feat"))
    uni.unionAll(bi).select(col(id),
      (shiftrightunsigned(Dedup.md5Hash64(col("feat")), 4) % width)
        .as("bucket"))
  }

  def classifierScore(df: DataFrame, text: String, id: String,
                      weights: DataFrame, width: Int): DataFrame =
    hashedFeatures(df, text, id, width)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("w_e6")).as("logit_e6"))
      .withColumn("keep", col("logit_e6") >= 0)

  /** Naive Bayes TRAINING over the hashed feature space — supervised
    * model training as one corpus pass, cross-engine exact: the
    * sufficient statistics are per-bucket class counts (one keyed
    * aggregate with map-side combine), and the log-likelihood-ratio
    * weights come from [[graft.functions.Log2FixedExpr]] — fixed-point
    * log₂ in pure integer arithmetic, so where a float NB would drift
    * in the last ulp per libm, this model is bit-identical in Spark
    * and the DuckDB oracle (which replays the 16 shift-and-square
    * rounds as a generated CTE chain). Laplace(+1) smoothing over the
    * `width` buckets; `label` must evaluate to ±1.
    *
    * w_q(b) = lq(cnt₊+1) − lq(T₊+width) − lq(cnt₋+1) + lq(T₋+width),
    * in 2⁻¹⁶-bit units. Output: one row per bucket
    * (bucket, cnt_pos, cnt_neg, w_q) — dense, so the model is exactly
    * `width` rows (broadcastable at any corpus size). */
  def naiveBayesModel(df: DataFrame, text: String, id: String,
                      label: Column, width: Int): DataFrame =
    nbModelFromCounts(nbPartialCounts(df, text, id, label, width),
      df.sparkSession, width)

  /** Per-slice NB sufficient statistics: sparse per-bucket class
    * counts plus one `bucket = −1` row carrying the class DOCUMENT
    * counts (the prior's statistics). Counts are exact integers, so
    * partials from any partition of the corpus into batches SUM-merge
    * to the single-pass statistics — the CMS additivity contract, and
    * like the CMS a replayed partial double-counts
    * ([[graft.streaming.Streaming.nbCountStream]]'s exactly-once sink
    * is load-bearing). */
  def nbPartialCounts(df: DataFrame, text: String, id: String,
                      label: Column, width: Int): DataFrame = {
    val lab = df.select(col(id), label.cast("long").as("y"))
    val occ = hashedFeatures(df, text, id, width).join(lab, Seq(id))
    val bCounts = occ.groupBy(col("bucket"))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("cnt_neg"))
    val prior = lab.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("cnt_neg"))
      .select(lit(-1L).as("bucket"), col("cnt_pos"), col("cnt_neg"))
    bCounts.unionByName(prior)
  }

  /** Model assembly from (possibly per-batch partial) counts:
    * SUM-merge per bucket, densify to exactly `width` rows, weights
    * from the fixed-point log — shared by the batch trainer and the
    * streamed sink, so streamed ≡ batch is what the shared oracle SQL
    * proves. The `bucket = −1` prior row is excluded here (it feeds
    * [[nbPriorFromCounts]]). */
  def nbModelFromCounts(counts: DataFrame,
                        spark: org.apache.spark.sql.SparkSession,
                        width: Int): DataFrame = {
    graft.functions.Log2FixedExpr.register(spark)
    def lq(c: Column): Column = graft.functions.Log2FixedExpr.of(c)
    val merged = counts.filter(col("bucket") >= 0)
      .groupBy(col("bucket"))
      .agg(sum(col("cnt_pos")).as("cnt_pos"),
        sum(col("cnt_neg")).as("cnt_neg"))
    val dense = spark.range(width)
      .select(col("id").as("bucket"))
      .join(merged, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("cnt_pos"), lit(0L)).as("cnt_pos"),
        coalesce(col("cnt_neg"), lit(0L)).as("cnt_neg"))
    val tots = dense.agg(sum(col("cnt_pos")).as("__tp"),
      sum(col("cnt_neg")).as("__tn"))
    dense.crossJoin(broadcast(tots))
      .select(col("bucket"), col("cnt_pos"), col("cnt_neg"),
        (lq(col("cnt_pos") + 1) - lq(col("__tp") + width)
          - lq(col("cnt_neg") + 1) + lq(col("__tn") + width)).as("w_q"))
  }

  /** One-row class-prior log ratio from the `bucket = −1` count rows. */
  def nbPriorFromCounts(counts: DataFrame): DataFrame = {
    graft.functions.Log2FixedExpr.register(counts.sparkSession)
    def lq(c: Column): Column = graft.functions.Log2FixedExpr.of(c)
    counts.filter(col("bucket") === -1L)
      .agg(sum(col("cnt_pos")).as("__np"), sum(col("cnt_neg")).as("__nn"))
      .select((lq(col("__np")) - lq(col("__nn"))).as("__prior_q"))
  }

  /** Score a corpus under an assembled model + prior: model weights
    * broadcast over the feature stream, per-document sum, keep =
    * score ≥ 0. Output: (id, y, score_q, keep). */
  def nbScore(df: DataFrame, text: String, id: String, label: Column,
              model: DataFrame, prior: DataFrame, width: Int): DataFrame = {
    val lab = df.select(col(id), label.cast("long").as("y"))
    val sums = hashedFeatures(df, text, id, width)
      .join(broadcast(model.select(col("bucket"), col("w_q"))), Seq("bucket"))
      .groupBy(col(id)).agg(sum(col("w_q")).as("__sum_w"))
    lab.join(sums, Seq(id), "left")
      .crossJoin(broadcast(prior))
      .select(col(id), col("y"),
        (col("__prior_q") + coalesce(col("__sum_w"), lit(0L)))
          .as("score_q"))
      .withColumn("keep", col("score_q") >= 0)
  }

  /** Train-and-classify composition: [[naiveBayesModel]] weights
    * broadcast back over the feature stream, per-document sum plus
    * the class-prior log ratio, keep = score ≥ 0. Output:
    * (id, y, score_q, keep). The model join and per-doc aggregate are
    * [[classifierScore]]'s shape; the prior is a one-row scalar
    * broadcast. */
  def naiveBayesClassify(df: DataFrame, text: String, id: String,
                         label: Column, width: Int): DataFrame = {
    // hash the feature stream ONCE for both the count pass and the
    // scoring pass (the tokenize+hash projection is the dominant cost;
    // measured 2.9 s → counts+score sharing at sf0.1)
    val lab = df.select(col(id), label.cast("long").as("y"))
    val occ = hashedFeatures(df, text, id, width).join(lab, Seq(id))
      .localCheckpoint()
    val bCounts = occ.groupBy(col("bucket"))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("cnt_neg"))
    val prior = lab.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("cnt_neg"))
      .select(lit(-1L).as("bucket"), col("cnt_pos"), col("cnt_neg"))
    val counts = bCounts.unionByName(prior)
    val model = nbModelFromCounts(counts, df.sparkSession, width)
    val priorQ = nbPriorFromCounts(counts)
    val sums = occ
      .join(broadcast(model.select(col("bucket"), col("w_q"))), Seq("bucket"))
      .groupBy(col(id)).agg(sum(col("w_q")).as("__sum_w"))
    lab.join(sums, Seq(id), "left")
      .crossJoin(broadcast(priorQ))
      .select(col(id), col("y"),
        (col("__prior_q") + coalesce(col("__sum_w"), lit(0L)))
          .as("score_q"))
      .withColumn("keep", col("score_q") >= 0)
  }


  /** Vocabulary coverage / OOV rate: build the top-`vocabSize`
    * whitespace-word vocabulary (by exact count, ties broken by the
    * bytewise-smaller word — a total order, so the boundary is
    * deterministic), then report per document how many tokens fall
    * outside it. `oov_bp` is exact basis points via integral division
    * (both engines truncate non-negative operands identically). The
    * tokenizer-evaluation step between raw word counting and BPE:
    * fixes vocab size BEFORE training and measures what a V-word
    * vocabulary abandons.
    *
    * 100 TB story: the vocabulary is a per-partition partial top-V
    * merged on the driver (TakeOrdered — never a global sort) and
    * returns BROADCAST; the corpus token stream shuffles once for the
    * word count and once keyed by document for the coverage sums, both
    * with map-side partial aggregation. Documents with no tokens keep
    * a zero row. */
  def vocabCoverage(df: DataFrame, text: String, id: String,
                    vocabSize: Int): DataFrame = {
    val base = graft.ops.Ops.parallelizeInput(df, col(id))
    val toks = base.select(col(id),
      explode(filter(split(trim(col(text)), " "), w => w =!= "")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
    val per = toks
      .join(broadcast(vocab.select(col("w"), lit(1).as("in_v"))),
        Seq("w"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
    base.select(col(id)).join(per, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_bp", when(col("n_tokens") === 0, lit(0L))
        .otherwise(expr("(n_oov * 10000) DIV n_tokens")))
  }

  /** Deterministic md5-derived stand-in weight table for
    * [[classifierScore]]: bucket b → ±1e6-range integer weight. */
  def standInWeights(spark: org.apache.spark.sql.SparkSession,
                     width: Int): DataFrame = {
    graft.functions.Md5Hash64Expr.register(spark)
    spark.range(width).select(col("id").as("bucket"),
      (shiftrightunsigned(Dedup.md5Hash64(
          concat(lit("w|"), col("id").cast("string"))), 4) % 2000001
        - 1000000L).as("w_e6"))
  }

  /** Assemble the graded sketch output from persisted (group, bucket,
    * register) partial-register rows: merge = MAX per (group, bucket)
    * — associative, commutative and idempotent, so ANY batch split,
    * arrival order or replay yields the registers of one pass over
    * the union — then the same exact integer s_sum/est assembly as
    * [[distinctTokenSketch]] (shiftleft, not pow: both exact for
    * longs). Output column-for-column identical to the batch form. */
  def sketchFromRegisters(regs: DataFrame, group: String): DataFrame = {
    val merged = regs.groupBy(col(group), col("bucket"))
      .agg(max(col("register")).as("register"))
    val stats = merged.groupBy(col(group))
      .agg(expr("sum(shiftleft(CAST(1 AS BIGINT), " +
        s"${graft.functions.HllAgg.RhoCap} - register))").as("s_sum"))
      .withColumn("est", expr(s"${graft.functions.HllAgg.EstNum}L div s_sum"))
    merged.join(stats, Seq(group))
      .select(col(group), col("bucket"), col("register"),
        col("s_sum"), col("est"))
  }

  /** Adaptive per-group quality floor — the published CCNet/Gopher
    * practice of per-LANGUAGE thresholds: an absolute floor on a
    * quality signal is language-biased (agglutinative languages run
    * higher type-token ratios, CJK different punctuation densities),
    * so each group's floor is set from its OWN distribution. The floor
    * is the [[graft.ops.Ops.histogramQuantiles]] sketch estimate
    * (lower bound of the bin holding the `quantile` rank — exact
    * integer arithmetic, deterministic, within one bin of the exact
    * percentile), so the gate needs no per-group sort at any corpus
    * size. Output per document: (id, group, n_tokens, ttr_bp,
    * floor_c, keep = ttr_bp ≥ floor).
    *
    * Scale shape: one narrow signal projection, the (group, bin)
    * histogram aggregate down to ≤ nBins rows per group, and the
    * |groups|-row floor table broadcast back onto the corpus. */
  def adaptiveQualityFloor(df: DataFrame, text: String, id: String,
                           group: String,
                           quantile: (String, Long, Long) = ("p25", 1L, 4L),
                           nBins: Int = 100): DataFrame = {
    val sig = qualityStats(df, text, id)
    val withG = df.select(col(id), col(group)).join(sig, Seq(id))
      .localCheckpoint() // the floor aggregate and the gate both consume it
    val floors = graft.ops.Ops.histogramQuantiles(withG, Seq(col(group)),
        col("ttr_bp"), loC = 0L, hiC = 10000L, nBins = nBins,
        quantiles = Seq(quantile))
      .select(col(group), col(s"q_${quantile._1}_c").as("floor_c"))
    withG.join(broadcast(floors), Seq(group))
      .withColumn("keep", col("ttr_bp") >= col("floor_c"))
      .select(col(id), col(group), col("n_tokens"), col("ttr_bp"),
        col("floor_c"), col("keep"))
  }

  /** Corpus-diff keyness: the top-`topK` terms most distinctive of
    * corpus A vs corpus B and vice versa, ranked by the add-one
    * smoothed odds ratio (the Monroe et al. "Fightin' Words" log-odds
    * family without the libm log — monotone in it, so the RANKING is
    * identical): for a term with counts (a, b) against totals (A, B)
    * and union vocabulary V, odds_A = (a+1)/(A+V−a−1) and score_A =
    * odds_A/odds_B; side B scores with the reciprocal. The audit that
    * answers "what is IN this source that isn't in that one" —
    * mixture debugging, contamination triage, domain drift. Output:
    * (side, term, n_a, n_b, score_e6), top-`topK` per side by (score
    * desc, term).
    *
    * Exactness: every factor of the ratio is an exact integer; the
    * two double multiplies and one divide round identically in both
    * engines (exact up to 2⁵³ per product — counts beyond 2²⁶ tokens
    * per side want the sampled form anyway), and ⌊·10⁶+½⌋ lands the
    * ranking on integer comparisons.
    *
    * Scale shape: one token explode → one (term, side)-keyed
    * aggregate with map-side combine; totals and vocabulary size are
    * a 1-row aggregate broadcast back; each side's top-k is a
    * TakeOrdered (per-partition heaps, no global sort). Nothing
    * driver-side, nothing all-pairs. */
  def corpusDiff(a: DataFrame, b: DataFrame, text: String, id: String,
                 topK: Int = 25): DataFrame = {
    def side(df: DataFrame, s: Int) =
      graft.ops.Ops.parallelizeInput(df, col(id))
        .select(explode(filter(split(trim(col(text)), " "), w => w =!= ""))
          .as("term"), lit(s).as("__s"))
    val vocab = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("term"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("n_b"))
      .localCheckpoint() // totals and both top-k sides consume it
    val totals = vocab.agg(sum(col("n_a")).as("tot_a"),
      sum(col("n_b")).as("tot_b"), count(lit(1)).as("v"))
    val scored = vocab.crossJoin(broadcast(totals))
    // odds numerators/denominators as exact-integer doubles; the
    // product order is fixed so both engines round identically
    val oddsA = (col("n_a") + 1.0) *
      (col("tot_b") + col("v") - col("n_b") - 1.0)
    val oddsB = (col("n_b") + 1.0) *
      (col("tot_a") + col("v") - col("n_a") - 1.0)
    def pick(s: String, num: Column, den: Column) = scored
      .withColumn("score_e6",
        floor(lit(1000000.0) * num / den + 0.5).cast("long"))
      .orderBy(col("score_e6").desc, col("term")).limit(topK)
      .select(lit(s).as("side"), col("term"), col("n_a"), col("n_b"),
        col("score_e6"))
    pick("a", oddsA, oddsB).unionByName(pick("b", oddsB, oddsA))
  }
}
