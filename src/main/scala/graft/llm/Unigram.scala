package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-family) tokenizer training — the OTHER
  * published subword family next to BPE ([[Bpe]]): seed a piece
  * vocabulary from substring counts, Viterbi-segment every word under
  * per-piece surprisal costs, re-fit piece counts on the best
  * segmentations (one hard-EM round per iteration).
  *
  * Cross-engine exactness is the design constraint, and log
  * probabilities are the enemy (libm, last-ulp divergence). The cost
  * model is therefore COARSE INTEGER SURPRISAL:
  * cost(piece) = (bitlen(total) − bitlen(cnt))·2²⁰ + (md5₆₄(piece) & (2²⁰−1))
  * — ⌊log₂⌋ at 1-bit granularity (bitlen(x) = length(bin(x)), exact
  * integer in Spark and DuckDB alike) plus a 20-bit deterministic
  * md5 jitter that makes path costs unique with near-certainty, so
  * the Viterbi argmin is a plain integer min both engines agree on
  * (the same "quantize before you compare" rule as every other
  * oracle row; UnigramSpec asserts the no-tie property holds on the
  * corpus). Hard-EM (Viterbi counts) replaces soft EM
  * (forward–backward expected counts) for the same reason — the
  * documented quantization of this operator, not an accident.
  *
  * Scale shape: everything heavy is keyed. Substring seeding is one
  * explode over the DISTINCT-WORD table (≪ corpus — the standard
  * word-frequency reduction every published trainer starts from) +
  * one piece-keyed sum; the piece table is the MODEL and is
  * human-sized by construction (vocab), so it may visit the driver
  * (the IVF/unimax rule) and ride back as a broadcast map literal;
  * Viterbi is a per-row fold over each word's ≤ maxLen positions —
  * embarrassingly parallel, no shuffle at all; the re-fit is one
  * explode + piece-keyed sum over segmentations. The corpus itself
  * is touched exactly once (word counting).
  */
object Unigram {

  /** Distinct-word frequency table: (word, freq). */
  def wordCounts(df: DataFrame, text: String, id: String): DataFrame =
    Dedup.tokenize(df, text, id)
      .select(explode(col("toks")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Seed piece counts: every substring of length 1..maxPieceLen of
    * every word, weighted by word frequency (multiple occurrences in
    * one word all count). Pieces below `minCount` are dropped EXCEPT
    * single characters — the coverage floor that keeps every word
    * segmentable. */
  def seedPieces(words: DataFrame, maxPieceLen: Int,
                 minCount: Long): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i") + 1))).as("l"))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)

  /** Integer surprisal costs over a piece-count table (object doc):
    * (piece, cnt, cost). */
  def pieceCosts(pieces: DataFrame): DataFrame = {
    graft.functions.Md5Hash64Expr.register(pieces.sparkSession)
    val tot = pieces.agg(sum(col("cnt")).as("__t"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        ((length(bin(col("__t"))) - length(bin(col("cnt")))).cast("long")
          * 1048576L +
          Dedup.md5Hash64(col("piece").cast("binary"))
            .bitwiseAND(1048575L)).as("cost"))
  }

  /** Viterbi-segment each word under a piece-cost table. The cost
    * table is the model (vocab-sized): collected and broadcast as a
    * map literal; the DP is a per-row left fold over positions
    * carrying (cost, path) — position j keeps the min-cost struct
    * over the ≤ maxPieceLen pieces ending at j (struct comparison =
    * (cost, path), and jittered costs make the min unique). Words
    * containing any character absent from the vocab yield null
    * cost/seg (un-segmentable; the single-char floor in
    * [[seedPieces]] prevents this for in-corpus words). Output:
    * (word, freq, cost, n_pieces, seg) with `seg` ';'-joined. */
  def viterbiSegment(words: DataFrame, costs: DataFrame,
                     maxPieceLen: Int): DataFrame = {
    val costMap: Map[String, Long] = costs.select("piece", "cost")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cm = typedlit(costMap)
    val w = col("word")
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("c"), lit("").as("p"))),
      (acc: Column, j: Column) => {
        val cands = transform(sequence(lit(1), least(lit(maxPieceLen), j)),
          l => {
            val piece = w.substr(j - l + lit(1), l)
            val prev = element_at(acc, j - l + 1)
            val pc = element_at(cm, piece)
            when(pc.isNotNull && prev.isNotNull,
              struct((prev.getField("c") + pc).as("c"),
                concat(prev.getField("p"), lit(";"), piece).as("p")))
              .otherwise(lit(null))
          })
        concat(acc, array(array_min(filter(cands, x => x.isNotNull))))
      })
    words.withColumn("__best", element_at(dp, length(w) + 1))
      .select(col("word"), col("freq"),
        col("__best.c").as("cost"),
        (size(split(col("__best.p"), ";")) - 1).cast("long").as("n_pieces"),
        ltrim(col("__best.p"), ";").as("seg"))
  }

  /** One hard-EM re-fit: piece counts over the Viterbi segmentations,
    * frequency-weighted. */
  def refit(segmented: DataFrame): DataFrame =
    segmented
      .select(explode(split(col("seg"), ";")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Full trainer: seed → (cost → segment → re-fit) × iters. Returns
    * the final piece table (piece, cnt); feed it back through
    * [[pieceCosts]]/[[viterbiSegment]] to tokenize. Pieces that no
    * Viterbi path uses disappear — the unigram trainer's vocabulary
    * pruning, falling out of the re-fit rather than run separately. */
  def train(df: DataFrame, text: String, id: String,
            maxPieceLen: Int = 4, minCount: Long = 100L,
            iters: Int = 1): DataFrame = {
    val words = wordCounts(df, text, id).localCheckpoint()
    var pieces = seedPieces(words, maxPieceLen, minCount)
    for (_ <- 1 to iters)
      pieces = refit(viterbiSegment(words, pieceCosts(pieces), maxPieceLen))
    pieces
  }
}
