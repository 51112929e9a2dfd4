package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: deterministic merge-table training
  * plus a pure-projection encoder — the tokenization stage between
  * curation and packing in a training-data pipeline (reference scope:
  * the pipeline's token counting stops at whitespace/regex tokens;
  * BPE is the published next step, so both halves are built
  * oracle-replayable from the start).
  *
  * Symbol sequences travel as ONE delimited string per word — each
  * symbol wrapped in U+0001 cells (`<D>sym<D>`, adjacent cells
  * abutting) — because the BPE merge step "replace every adjacent
  * (x, y) occurrence left-to-right" is then EXACTLY the SQL-standard
  * `replace(s, cell(x)||cell(y), cell(xy))`: matches cannot straddle a
  * symbol boundary (a match must start and end at a cell delimiter
  * pair) and both engines scan left-to-right without rescanning
  * replaced output, which is precisely the greedy BPE merge order —
  * `[a,a,a] → [aa,a]`, `[a,b,a,b] → [ab,ab]`. That makes training
  * and encoding bit-reproducible on ANY engine: the
  * `llm_bpe_train`/`llm_bpe_encode` oracle rows replay all rounds in
  * DuckDB and match by hash. Every count is an exact integer and the
  * argmax tie-break (max count, then lexicographically smallest pair)
  * compares UTF-8 strings bytewise identically in Spark and DuckDB.
  *
  * 100 TB story: the corpus is scanned ONCE into a word-frequency
  * table (vocabulary-bounded, not corpus-bounded — the shuffle
  * carries distinct words); each training round is a narrow
  * split/explode over that table plus one keyed aggregate and a
  * 1-ROW collect (the argmax pair). Encoding is a pure per-document
  * projection — a `merges`-deep chain of codegen'd `replace` calls at
  * scan speed, no shuffle at all. Like the IVF trainer
  * ([[Similarity.trainIvfCentroids]]), fleet runs train on a sample:
  * the merge table needs the pair distribution, not the corpus. */
object Bpe {

  /** Cell delimiter. Words containing it are excluded from training
    * and encoding (it cannot appear in real text; the filter makes the
    * contract total rather than corrupting the cell encoding). */
  val D = "\u0001"

  private def cell(sym: String): String = D + sym + D

  /** Whitespace words of `text`, empty and delimiter-carrying words
    * dropped — the shared tokenization contract of both halves. */
  private def words(text: Column): Column =
    filter(split(trim(text), " "), w => w =!= "" && !w.contains(D))

  /** Character-cell encoding of one word: `"abc"` →
    * `<D>a<D><D>b<D><D>c<D>`. `(?s)` keeps the
    * encoding total for any character. */
  private def encodeCells(word: Column): Column =
    regexp_replace(word, "(?s)(.)", D + "$1" + D)

  /** Cell string back to its symbol array. */
  private def symbols(cells: Column): Column =
    split(trim(cells, D), D + D)

  /** Corpus word-frequency table with cell-encoded spellings —
    * the ONE corpus-sized scan of training. */
  def wordFreq(df: DataFrame, text: String): DataFrame =
    graft.ops.Ops.parallelizeInput(df)
      .select(explode(words(col(text))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("s", encodeCells(col("word")))

  /** One trained merge: `lhs`+`rhs` fused after `merge_round` rounds,
    * having been the most frequent adjacent pair (`pair_count`
    * occurrences, weighted by word frequency) at that point. */
  final case class Merge(round: Int, lhs: String, rhs: String,
                         count: Long)

  /** Train `rounds` BPE merges. Deterministic end to end: exact
    * integer pair counts, bytewise lexicographic tie-break, greedy
    * left-to-right merge application. Stops early if no adjacent pair
    * remains. Each round costs one keyed aggregate over the vocabulary
    * and collects exactly one row. */
  def train(df: DataFrame, text: String, rounds: Int): Seq[Merge] = {
    var vocab = wordFreq(df, text).localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab
        .select(col("cnt"), symbols(col("s")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("cnt"),
          explode(sequence(lit(1), size(col("t")) - 1)).as("i"),
          col("t"))
        .select(col("cnt"), element_at(col("t"), col("i")).as("x"),
          element_at(col("t"), col("i") + 1).as("y"))
        .groupBy(col("x"), col("y")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(r, x, y, c)
        // re-checkpoint so round r+1's scan does not replay rounds
        // 1..r's replace chain over the vocabulary
        vocab = vocab
          .withColumn("s",
            replace(col("s"), lit(cell(x) + cell(y)), lit(cell(x + y))))
          .localCheckpoint()
        r += 1
      }
    }
    out.result()
  }

  /** The trained merge table as a DataFrame (the `llm_bpe_train`
    * registry shape): one row per round. */
  def trainTable(df: DataFrame, text: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, text, rounds)
      .map(m => (m.round.toLong, m.lhs, m.rhs, m.count))
      .toDF("merge_round", "lhs", "rhs", "pair_count")
  }

  /** Encode: apply the trained merges to every document and count the
    * resulting tokens. A pure projection (no shuffle): per word, the
    * cell encoding followed by the `merges`-deep codegen'd `replace`
    * chain; per document, an `aggregate` over its word array. Rows
    * with no countable words report zero. `carry` columns pass through
    * untouched (so groupers like language ride the projection instead
    * of needing a corpus-sized self-join later). */
  private def mergedCells(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(encodeCells(word)) { (s, m) =>
      replace(s, lit(cell(m.lhs) + cell(m.rhs)), lit(cell(m.lhs + m.rhs)))
    }

  def encode(df: DataFrame, text: String, id: String,
             merges: Seq[Merge], carry: Seq[String] = Nil): DataFrame =
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id) +: carry.map(col) :+ words(col(text)).as("w"): _*)
      .select(col(id) +: carry.map(col)
        :+ size(col("w")).cast("long").as("n_words")
        :+ aggregate(col("w"), lit(0L),
          (acc, w) => acc + size(symbols(mergedCells(w, merges))).cast("long"))
          .as("n_bpe_tokens"): _*)

  /** SentencePiece-style word-initial marker: makes the flat token
    * sequence losslessly invertible ([[decode]]). */
  val Marker = "▁"

  /** Per-document token SEQUENCE — the actual subword strings in
    * document order, each word's first token prefixed with [[Marker]]
    * so word boundaries survive flattening (the published
    * SentencePiece convention). This is the form the packing /
    * assembly stages consume; [[encode]] is the count projection for
    * eval metrics. A pure projection — no shuffle. Output:
    * (id, toks array<string>). Invertibility assumes input words
    * don't contain the marker character itself (U+2581, a block
    * glyph absent from natural text; marker-carrying words would
    * decode with an extra space). */
  def encodeTokens(df: DataFrame, text: String, id: String,
                   merges: Seq[Merge]): DataFrame =
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), words(col(text)).as("w"))
      .select(col(id), flatten(transform(col("w"), w => {
        val syms = symbols(mergedCells(w, merges))
        transform(syms, (s, i) =>
          when(i === 0, concat(lit(Marker), s)).otherwise(s))
      })).as("toks"))

  /** Invert [[encodeTokens]]: concatenate the tokens, turn each
    * word-initial marker back into a space, trim the leading one.
    * decode ∘ encodeTokens = the single-space word normalization of
    * the input text (exact: BPE merges never cross word boundaries,
    * and a word's symbols concatenate back to the word) — graded
    * end-to-end by `llm_bpe_roundtrip`. */
  def decode(toks: Column): Column =
    trim(replace(array_join(toks, ""), lit(Marker), lit(" ")))

  /** Tokenizer fertility (BPE tokens per word, exact basis points) per
    * `group` — the standard tokenizer-evaluation metric, here by
    * language: encode with `group` carried through the narrow
    * projection, then ONE keyed aggregate (integer sums, integral
    * division — both engines truncate non-negative operands
    * identically). Groups appear only if they contribute countable
    * words, so the division is total. */
  def fertilityByGroup(df: DataFrame, text: String, id: String,
                       group: String, merges: Seq[Merge]): DataFrame =
    encode(df, text, id, merges, carry = Seq(group))
      .groupBy(col(group))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .filter(col("n_words") > 0)
      .withColumn("fertility_bp", expr("(n_bpe_tokens * 10000) DIV n_words"))
}
