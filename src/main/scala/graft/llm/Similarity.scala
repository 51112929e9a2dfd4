package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over an embedding column (ArrayType(FloatType)).
  *
  * Two paths: brute-force cosine top-k (the exactness baseline —
  * queries are broadcast, so cost is |queries|·|corpus| dot products,
  * fully parallel over the corpus), and a random-hyperplane LSH path
  * whose candidate set comes from an equi-join on a bucket key — the
  * 100 TB shape, trading recall for a corpus-partitionable probe.
  *
  * Hot-loop engineering: the float→double cast and the row's norm are
  * computed once per row *before* any pair join, and the per-pair dot
  * product is the codegen'd [[graft.functions.DotProduct]] expression —
  * all with fold order identical to DuckDB's double list functions, so
  * scores stay bit-identical to the oracle.
  */
object Similarity {

  /** Reference cosine via higher-order functions — readable spec
    * implementation; the join paths below use the codegen'd form. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def norm(c: Column) = sqrt(aggregate(c, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (norm(a) * norm(b))
  }

  /** Cast-to-double + per-row norm precompute (one narrow projection).
    * Fans the input out to full parallelism first: the dot-product
    * work (norms here, bucket keys in [[bandedKeys]]) is CPU-bound and
    * would otherwise run inside however few scan tasks the file layout
    * produced (see [[graft.ops.Ops.parallelizeInput]]). */
  private def prepped(df: DataFrame, id: String, emb: String,
                      idAs: String, embAs: String, nrmAs: String): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id).as(idAs),
        transform(col(emb), x => x.cast("double")).as(embAs))
      .withColumn(nrmAs, sqrt(VectorFunctions.dot(col(embAs), col(embAs))))
  }

  private def pairScore: Column =
    VectorFunctions.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm"))

  /** Brute-force top-k: for each row of `queries` (small, broadcast),
    * the k nearest corpus rows by cosine. Output:
    * (q_id, id, score, rn). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     emb: String, k: Int): DataFrame = {
    val q = prepped(queries, id, emb, "q_id", "q_emb", "q_nrm")
    val c = prepped(corpus, id, emb, id, "c_emb", "c_nrm")
    c.join(broadcast(q), col("q_id") =!= col(id))
      .withColumn("score", pairScore)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** Embedding-space near-dup pairs: all pairs with cosine ≥ threshold.
    *
    * Candidates come from banded random-hyperplane LSH — two equi-joins
    * (band keys, then embeddings back by id), never a cross join — and
    * are reranked by exact cosine, so precision is exact and only recall
    * depends on the banding. Recall tuning: a pair at cosine c collides
    * in a band with probability (1 − arccos(c)/π)^rowsPerBand; more
    * bands ⇒ higher recall, more planes per band ⇒ harder pruning. The
    * defaults (16 bands × 2 planes) are sized for low thresholds
    * (~0.45, nearly orthogonal — verified recall 1.0 on the test data
    * at both SFs).
    *
    * SCALE MODEL: a random (non-dup) pair collides in a band with
    * probability 2^-rowsPerBand, so candidates ≈ bands · n² /
    * 2^rowsPerBand — quadratic at ANY fixed rowsPerBand, with the
    * constant controlled by bucket width. rowsPerBand is therefore a
    * function of corpus size, not a tuning constant: keep
    * 2^rowsPerBand ≳ n (rowsPerBand ≈ log₂ n) so buckets stay sparse,
    * and scale bands to hold recall (a pair at cosine c survives with
    * prob 1 − (1 − (1 − arccos(c)/π)^rowsPerBand)^bands — for
    * real near-dups, c ≈ 1, per-band survival stays high even at 16
    * planes). Measured at 100k rows (ScaleProbe, 20×): 32×8 = 256
    * buckets/band → ~1.2e9 candidates, 300 s; 16×16 = 65k buckets/band
    * → ~2.4M candidates, 3.2 s, with full recall on planted
    * cosine-0.999 pairs. The 2-plane default exists only for the
    * low-threshold (~0.45) recall study. */
  def nearDupPairs(corpus: DataFrame, id: String, emb: String,
                   threshold: Double, bands: Int = 16, rowsPerBand: Int = 2,
                   dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(bands * rowsPerBand, dim, seed)
    val bk = bandedKeys(corpus, id, emb, ps, bands, rowsPerBand)
    val cand = bk.select(col("__bid").as("a"), col("band"), col("key"))
      .join(bk.select(col("__bid").as("b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val pa = prepped(corpus, id, emb, "a", "q_emb", "q_nrm")
    val pb = prepped(corpus, id, emb, "b", "c_emb", "c_nrm")
    cand.join(pa, Seq("a")).join(pb, Seq("b"))
      .withColumn("score", pairScore)
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), col("score"))
  }

  /** Planted near-duplicates for recall evaluation: every `every`-th row
    * (by id) gains a copy at id+`idOffset` whose coordinates are jittered
    * by a fixed ±4% per-index pattern (multiplier 1 + 0.02·((i mod 5) − 2)
    * ∈ {0.96 … 1.04}), giving cosine(v, v′) ≈ 0.999 — above any realistic
    * dedup threshold. This is the standard planted-pair protocol for
    * testing a near-dup pipeline on a corpus with no natural duplicates;
    * every step is deterministic IEEE double arithmetic, so the DuckDB
    * oracle recomputes the identical augmented corpus (see
    * queries/Llm.scala `nearDupScaleSql`). Output: (id, emb) with emb
    * cast to array<double>; a narrow union of two projections — no
    * shuffle, no data written. */
  def withPlantedDups(corpus: DataFrame, id: String, emb: String,
                      every: Int = 20, idOffset: Long = 1000000L): DataFrame = {
    val base = corpus.select(col(id),
      transform(col(emb), x => x.cast("double")).as(emb))
    val planted = base.filter(pmod(col(id), lit(every)) === 0)
      .select((col(id) + lit(idOffset)).as(id),
        transform(col(emb), (x, i) =>
          x * (lit(1.0) + lit(0.02) * (pmod(i, lit(5)).cast("double") - lit(2.0))))
          .as(emb))
    base.unionByName(planted)
  }

  /** SemDeDup-style semantic dedup: cluster the corpus with the IVF
    * coarse quantizer, compare embeddings ONLY within a cluster, and
    * remove every vector whose cosine to a LOWER-id cluster-mate
    * reaches `threshold` (the paper's keep-one-per-ε-ball rule with a
    * deterministic keeper). Output, one row per input vector:
    * (id, list_id, n_lower = lower-id cluster-mates, removed,
    * max_lower = best cosine to a lower-id cluster-mate, null when
    * n_lower = 0).
    *
    * Scale shape: candidate pairs are bounded by the cluster
    * partition — Σ|cluster|²/2, never n²/2 — and the cluster join is
    * an equi-join on list_id. `nLists` is a function of corpus size,
    * not a constant: keep nLists ≈ n/targetClusterSize (the paper uses
    * ~100k clusters at billions of rows) so per-cluster work stays
    * flat; cluster assignment itself is a narrow projection. Pass
    * [[trainIvfCentroids]] output for data-adapted clusters. */
  def semDedup(corpus: DataFrame, id: String, emb: String,
               threshold: Double, nLists: Int = 8, dim: Int = 64,
               centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cs = centroids.getOrElse(ivfCentroids(nLists, dim))
    require(cs.length == nLists, s"expected $nLists centroids, got ${cs.length}")
    val p = prepped(corpus, id, emb, id, "c_emb", "c_nrm")
      .withColumn("list_id", ivfListId(col("c_emb"), cs))
    val lo = p.select(col(id).as("a"), col("list_id"),
      col("c_emb").as("q_emb"), col("c_nrm").as("q_nrm"))
    val hi = p.select(col(id).as("b"), col("list_id"),
      col("c_emb"), col("c_nrm"))
    val perB = hi.join(lo, Seq("list_id"))
      .filter(col("a") < col("b"))
      .withColumn("score", pairScore)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_lower"), max(col("score")).as("max_lower"))
    p.select(col(id), col("list_id"))
      .join(perB.withColumnRenamed("b", id), Seq(id), "left")
      .select(col(id), col("list_id"),
        coalesce(col("n_lower"), lit(0L)).as("n_lower"),
        coalesce(col("max_lower") >= threshold, lit(false)).as("removed"),
        col("max_lower"))
  }

  /** Cross-set semantic decontamination: training vectors whose cosine
    * to ANY eval/benchmark vector reaches `threshold` — the
    * embedding-space counterpart of [[Dedup.decontaminate]]'s n-gram
    * overlap scrub (paraphrased eval leakage shares no n-grams but
    * sits next to the benchmark in embedding space). Output, one row
    * per CONTAMINATED training vector: (id, n_eval_hits, max_cos);
    * anti-joining the ids back out is the caller's cleanup step.
    *
    * Scale shape: both sides get banded hyperplane-LSH keys from the
    * same planes (one native [[graft.functions.BandKeysExpr]] each, a
    * narrow projection); candidates are the (band, key) equi-join.
    * The eval side is small by nature (benchmarks are MBs against a
    * 100 TB corpus), so its keys AND its embeddings are broadcast —
    * the corpus side never shuffles, making the whole scrub
    * scan-shaped like the n-gram variant. Banding follows the scale
    * model of [[nearDupPairs]] (rowsPerBand ≈ log₂ n of the TRAIN
    * side); recall holds because real leakage sits at cosine ≈ 1. */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame, id: String,
                            emb: String, threshold: Double,
                            bands: Int = 32, rowsPerBand: Int = 12,
                            dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(bands * rowsPerBand, dim, seed)
    val bt = bandedKeys(train, id, emb, ps, bands, rowsPerBand)
      .select(col("__bid").as("t"), col("band"), col("key"))
    val be = bandedKeys(eval, id, emb, ps, bands, rowsPerBand)
      .select(col("__bid").as("e"), col("band"), col("key"))
    val cand = bt.join(broadcast(be), Seq("band", "key"))
      .select(col("t"), col("e")).distinct()
    val pt = prepped(train, id, emb, "t", "q_emb", "q_nrm")
    val pe = prepped(eval, id, emb, "e", "c_emb", "c_nrm")
    cand.join(pt, Seq("t")).join(broadcast(pe), Seq("e"))
      .withColumn("score", pairScore)
      .filter(col("score") >= threshold)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("score")).as("max_cos"))
      .select(col("t").as(id), col("n_eval_hits"), col("max_cos"))
  }

  /** Margin-based bitext mining (the ratio-margin criterion behind the
    * published LASER/CCMatrix parallel-corpus pipelines): score every
    * cross-set candidate pair by its cosine RELATIVE to both
    * endpoints' neighborhoods — margin(x, y) = cos(x, y) / ((mean of
    * x's k-NN cosines + mean of y's k-NN cosines) / 2) — and keep, per
    * source vector, its best target at or above `marginThresholdE6`
    * (1e6 = margin 1.0). The relative score deflates hub vectors that
    * sit close to everything, which absolute cosine thresholds
    * mis-mine. Output: (src_id, tgt_id, cos_e6, margin_e6).
    *
    * Exactness: each pair cosine quantizes ⌊cos·10⁶+½⌋ BEFORE any
    * aggregation; neighborhood sums are then exact integers and the
    * margin is ONE exact integer division
    * 2·q·n_x·n_y·10⁶ ÷ (Σ_x·n_y + Σ_y·n_x) (mean-of-means over the
    * actual neighbor counts n ≤ k — at the sparse edge of the
    * candidate graph a vector can have fewer than k neighbors), so
    * ranking and thresholding are integer comparisons both engines
    * replay bit-for-bit. Only q > 0 pairs are scored — a
    * negative-cosine pair is never bitext, and it keeps every divide
    * sign-free (Spark `div` truncates toward zero, DuckDB `//` floors;
    * they agree only on non-negatives).
    *
    * Scale shape: candidates come from the cross-set (band, key)
    * equi-join as in [[semanticDecontaminate]], but with BOTH sides
    * corpus-sized — neither broadcasts; banding follows the
    * [[nearDupPairs]] scale model (rowsPerBand ≈ log₂ n). The k-NN
    * stats are two keyed window ranks over the candidate set
    * (checkpointed once — three consumers), the margin a three-way
    * equi-join by endpoint id. Nothing is all-pairs; recall on real
    * translation pairs (cos ≈ 1) follows the banded survival model. */
  def marginMining(src: DataFrame, tgt: DataFrame, id: String, emb: String,
                   k: Int = 4, marginThresholdE6: Long = 1060000L,
                   bands: Int = 16, rowsPerBand: Int = 8,
                   dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(bands * rowsPerBand, dim, seed)
    val bs = bandedKeys(src, id, emb, ps, bands, rowsPerBand)
      .select(col("__bid").as("s"), col("band"), col("key"))
    val bt = bandedKeys(tgt, id, emb, ps, bands, rowsPerBand)
      .select(col("__bid").as("t"), col("band"), col("key"))
    val cand = bs.join(bt, Seq("band", "key"))
      .select(col("s"), col("t")).distinct()
    val pSrc = prepped(src, id, emb, "s", "q_emb", "q_nrm")
    val pTgt = prepped(tgt, id, emb, "t", "c_emb", "c_nrm")
    val scored = cand.join(pSrc, Seq("s")).join(pTgt, Seq("t"))
      .withColumn("q", floor(pairScore * 1000000.0 + 0.5).cast("long"))
      .filter(col("q") > 0)
      .select(col("s"), col("t"), col("q"))
      .localCheckpoint() // fwd rank, bwd rank, margin join all consume it
    val fwd = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("q").desc, col("t"))))
      .filter(col("rn") <= k)
    val statS = fwd.groupBy(col("s"))
      .agg(count(lit(1)).as("n_s"), sum(col("q")).as("sum_s"))
    val statT = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("t")).orderBy(col("q").desc, col("s"))))
      .filter(col("rn") <= k).groupBy(col("t"))
      .agg(count(lit(1)).as("n_t"), sum(col("q")).as("sum_t"))
    fwd.select(col("s"), col("t"), col("q"))
      .join(statS, Seq("s")).join(statT, Seq("t"))
      .withColumn("margin_e6", call_function("div",
        lit(2L) * col("q") * col("n_s") * col("n_t") * lit(1000000L),
        col("sum_s") * col("n_t") + col("sum_t") * col("n_s")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("margin_e6").desc, col("t"))))
      .filter(col("rk") === 1 && col("margin_e6") >= marginThresholdE6)
      .select(col("s").as("src_id"), col("t").as("tgt_id"),
        col("q").as("cos_e6"), col("margin_e6"))
  }

  /** Embedding-space corpus clustering for curation: every vector
    * assigned to its nearest coarse centroid (the same deterministic
    * quantizer the IVF index uses — k-means-trainable via
    * [[trainIvfCentroids]]), with per-cluster statistics attached.
    * This is the primitive behind cluster-balanced sampling, SemDeDup's
    * partitioning and topic-mixture audits. Output per vector:
    * (id, list_id, c_score = dot product to its centroid, cluster_n,
    * cluster_min_id).
    *
    * Scale shape: assignment is a pure narrow projection (no shuffle);
    * the statistics are one (list_id)-keyed aggregate producing nLists
    * rows, broadcast back onto the assignment — the corpus is read
    * once and never reshuffled. All outputs are order-independent
    * (count/min aggregates, deterministic dot-product fold), so the
    * whole operator is oracle-checkable. */
  def clusterStats(corpus: DataFrame, id: String, emb: String,
                   nLists: Int = 8, dim: Int = 64,
                   centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cs = centroids.getOrElse(ivfCentroids(nLists, dim))
    require(cs.length == nLists, s"expected $nLists centroids, got ${cs.length}")
    val scores = array(cs.map(c =>
      VectorFunctions.dot(col("c_emb"), typedlit(c.toSeq))): _*)
    // no norm column: assignment is argmax-of-dot, so the per-row
    // sqrt(dot(e,e)) that prepped() computes would be pure waste here
    val assigned = graft.ops.Ops.parallelizeInput(corpus, col(id))
      .select(col(id).as(id),
        transform(col(emb), x => x.cast("double")).as("c_emb"))
      .withColumn("__cs", scores)
      .select(col(id),
        (array_position(col("__cs"), array_max(col("__cs"))) - 1)
          .cast("int").as("list_id"),
        array_max(col("__cs")).as("c_score"))
    val stats = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("cluster_n"), min(col(id)).as("cluster_min_id"))
    assigned.join(broadcast(stats), Seq("list_id"))
      .select(col(id), col("list_id"), col("c_score"),
        col("cluster_n"), col("cluster_min_id"))
  }

  /** Exact quadratic variant of [[nearDupPairs]] — the recall-1 baseline
    * for tiny inputs and for measuring the banded path's recall. */
  def exactNearDupPairs(corpus: DataFrame, id: String, emb: String,
                        threshold: Double): DataFrame = {
    val a = prepped(corpus, id, emb, "a", "q_emb", "q_nrm")
    val b = prepped(corpus, id, emb, "b", "c_emb", "c_nrm")
    a.join(b, col("a") < col("b"))
      .withColumn("score", pairScore)
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), col("score"))
  }

  /** Per-row (band, key) LSH signatures: id only — embeddings are NOT
    * carried through the ×bands explode (they rejoin by id later).
    * All keys come from ONE native [[graft.functions.BandKeysExpr]]:
    * the composable per-plane form (bands·rowsPerBand DotProduct/when
    * trees) generates a projection whose codegen compile time alone
    * dominated the banding stage at 384 planes (~2 s of a 2.7 s warm
    * near-dup run at sf0.1 — the arithmetic itself is ~tens of ms). */
  private def bandedKeys(df0: DataFrame, id: String, emb: String,
                         ps: Array[Array[Double]], bands: Int,
                         rowsPerBand: Int): DataFrame = {
    graft.functions.BandKeysExpr.register(df0.sparkSession)
    val df = graft.ops.Ops.parallelizeInput(df0, col(id))
    val asDouble = transform(col(emb), x => x.cast("double"))
    df.select(col(id).as("__bid"),
      posexplode(graft.functions.BandKeysExpr.of(asDouble, ps, rowsPerBand))
        .as(Seq("band", "key")))
  }

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Raw splitmix64 plane-component hashes — exposed so the DuckDB
    * oracle can rebuild the identical planes from integer literals. */
  def planeHashes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Long]] =
    Array.tabulate(numPlanes, dim)((p, i) => splitmix(seed + p * 1000003L + i))

  /** Deterministic pseudo-random hyperplanes (splitmix64 → [-1, 1]);
    * fixed seed so plans are reproducible across runs/sessions. */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    planeHashes(numPlanes, dim, seed).map(_.map(_.toDouble / Long.MaxValue))

  /** Sign-of-dot-product bucket id per row: bit p set iff
    * v·plane_p > 0. One narrow projection, no shuffle — a single
    * native band-keys evaluation (one band of `planes.length` bits).
    *
    * Null contract: a null embedding null-propagates to a null bucket
    * (the native expression is a standard null-propagating unary), so
    * such rows drop out of every bucket equi-join — they are
    * unsearchable, not bucketed arbitrarily. Filter or impute null
    * embeddings upstream if they must participate. */
  def withLshBucket(df0: DataFrame, emb: String,
                    planes: Array[Array[Double]]): DataFrame = {
    graft.functions.BandKeysExpr.register(df0.sparkSession)
    val df = graft.ops.Ops.parallelizeInput(df0)
    val asDouble = transform(col(emb), x => x.cast("double"))
    df.withColumn("lsh_bucket", element_at(
      graft.functions.BandKeysExpr.of(asDouble, planes, planes.length), 1))
  }

  /** Symmetric per-vector int8 quantization — the 4× storage/bandwidth
    * lever for a 100 TB embedding corpus. scale = max|x|/127;
    * q_i = floor(x_i/scale + 0.5) as tinyint (so |x − q·scale| ≤
    * scale/2). A pure narrow projection, no shuffle; every step is
    * deterministic IEEE arithmetic, so the DuckDB oracle recomputes it
    * bit-for-bit. Zero vectors quantize to zeros with scale 0. Output:
    * input columns + (scale double, q array<tinyint>). */
  def quantizeInt8(df: DataFrame, emb: String): DataFrame = {
    val asDouble = transform(col(emb), x => x.cast("double"))
    val scale = aggregate(asDouble, lit(0.0),
      (acc, x) => greatest(acc, abs(x))) / 127.0
    df.withColumn("scale", scale)
      .withColumn("q", when(col("scale") > 0,
          transform(asDouble, x =>
            floor(x / col("scale") + 0.5).cast("tinyint")))
        .otherwise(transform(asDouble, _ => lit(0).cast("tinyint"))))
  }

  /** Brute-force top-k over int8 codes — retrieval on the quantized
    * corpus ([[quantizeInt8]]) at 1/4 the memory bandwidth. The
    * per-vector scales cancel out of the cosine, so ranking reduces to
    * the integer cosine of the code vectors; code dot products are
    * sums of |q| ≤ 127 products, exact in double for any fold order —
    * the whole scorer is cross-engine exact, not just approximately
    * right. Output: (q_id, id, score, rn), score = quantized cosine. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, id: String,
                    emb: String, k: Int): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    def codes(df: DataFrame, idAs: String, qAs: String, nAs: String) =
      quantizeInt8(df, emb)
        .select(col(id).as(idAs),
          transform(col("q"), x => x.cast("double")).as(qAs))
        .withColumn(nAs, sqrt(VectorFunctions.dot(col(qAs), col(qAs))))
    val c = codes(corpus, id, "c_emb", "c_nrm")
    val q = codes(queries, "q_id", "q_emb", "q_nrm")
    c.join(broadcast(q), col("q_id") =!= col(id))
      .withColumn("score", pairScore)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** Mean-pool chunk embeddings into one vector per parent document —
    * the assembly step between chunk-level encoding and doc-level
    * retrieval/dedup (chunking long docs for the encoder, pooling back
    * for the index). Exact by the trainer's rule ([[TrainQuant]]):
    * coordinates quantize to 2⁻²⁰ before summing, so the per-(doc,
    * dim) sum is an exact integer and the mean ONE rounded IEEE
    * divide — bit-reproducible across engines. Output is EXPLODED as
    * (group_id, i, mean_e9, n_chunks) — scalar columns hash cleanly
    * in the oracle gate, and a consumer rebuilds the vector with one
    * `sort_array(collect_list(...))` when it needs the array form.
    * One narrow explode + one (doc, dim)-keyed aggregate; dims are a
    * constant factor, so this scales exactly like any grouped agg. */
  def meanPoolEmbeddings(chunks: DataFrame, group: Column,
                         emb: String): DataFrame =
    graft.ops.Ops.parallelizeInput(chunks)
      .select(group.as("group_id"),
        posexplode(transform(col(emb), x => x.cast("double")))
          .as(Seq("i", "x")))
      .groupBy(col("group_id"), col("i"))
      .agg(sum(floor(col("x") * TrainQuant + 0.5).cast("long")).as("s"),
        count(lit(1)).as("n_chunks"))
      .select(col("group_id"), col("i"),
        floor(col("s") * lit(1e9) / (col("n_chunks") * TrainQuant) + 0.5)
          .cast("long").as("mean_e9"),
        col("n_chunks"))

  /** Fixed seed for the IVF coarse quantizer — distinct from the
    * hyperplane seed so the two index families never share geometry. */
  val IvfSeed: Long = 777L

  /** IVF coarse-quantizer centroids. Deterministic splitmix64 vectors,
    * not k-means: training would tighten the lists around the data
    * distribution (and is pluggable — any Array[Array[Double]] works),
    * but fixed centroids keep assignment reproducible across engines,
    * which is what makes the whole index oracle-checkable. */
  def ivfCentroids(nLists: Int, dim: Int, seed: Long = IvfSeed): Array[Array[Double]] =
    planes(nLists, dim, seed)

  /** Quantization unit for the trainer's recentre sums: coordinates
    * are rounded to 2⁻²⁰ before summing so the per-list sum is an
    * exact INTEGER — independent of partition/fold order, hence
    * bit-reproducible across engines (a double sum is not: its value
    * depends on addition order). 2⁻²⁰ ≈ 1e-6 sits far below embedding
    * noise, so the quantization costs nothing in cluster quality. */
  val TrainQuant: Double = 1048576.0 // 2^20

  /** Fixed-iteration Lloyd's trainer for the IVF coarse quantizer:
    * assign every vector to its nearest (max-dot) centroid, recentre
    * each list on the member mean, repeat `iters` times. No random
    * sampling anywhere — init is the deterministic [[ivfCentroids]],
    * the iteration count is fixed, and the recentre mean is computed
    * as an exact integer sum of [[TrainQuant]]-quantized coordinates
    * followed by ONE rounded IEEE divide — so retraining on the same
    * data reproduces the same index bit-for-bit on ANY engine (the
    * `llm_similarity_ivf_trained` oracle row replays all `iters`
    * rounds in DuckDB and matches by hash). Per iteration: one narrow
    * assignment pass plus a (list, dimension)-keyed aggregate whose
    * result is nLists×dim scalars — the only driver collect. Lists
    * that capture no vectors keep their previous centroid. At fleet
    * scale, train on a sample: the quantizer needs the distribution,
    * not the corpus (the exact integer sum stays inside 2⁵³ up to
    * ~10⁹ sampled rows × unit-scale coordinates). */
  /** Deterministic BOUNDED training sample — the fleet rule the
    * trainers document ("train on a sample: the quantizer needs the
    * distribution, not the corpus") made explicit: the `n` rows with
    * the smallest md5(id) — a size-capped, order-free, engine-
    * independent choice. A constant-fraction filter (`id % 2 = 0`)
    * still grows with the corpus; this caps the training set at `n`
    * however large the scan. Physical shape is TakeOrderedAndProject —
    * a per-partition top-n heap merged on the driver, NO global sort —
    * and the identical ORDER BY md5 LIMIT n replays in the oracle, so
    * trained-model rows stay hash-graded end-to-end. */
  def trainSample(df: DataFrame, id: String, n: Int): DataFrame =
    df.orderBy(md5(col(id).cast("string")), col(id)).limit(n)

  def trainIvfCentroids(corpus: DataFrame, emb: String, nLists: Int,
                        iters: Int = 5, dim: Int = 64,
                        seed: Long = IvfSeed): Array[Array[Double]] =
    memoized(corpus, s"ivf|$emb|$nLists|$iters|$dim|$seed") {
      trainIvfCentroidsUncached(corpus, emb, nLists, iters, dim, seed)
    }

  private def trainIvfCentroidsUncached(corpus: DataFrame, emb: String,
      nLists: Int, iters: Int, dim: Int,
      seed: Long): Array[Array[Double]] = {
    VectorFunctions.register(corpus.sparkSession)
    val asDouble = graft.ops.Ops.parallelizeInput(corpus)
      .select(transform(col(emb), x => x.cast("double")).as("e"))
      .localCheckpoint()
    var cs = ivfCentroids(nLists, dim, seed)
    for (_ <- 0 until iters) {
      val next = Array.tabulate(nLists, dim)((l, i) => cs(l)(i))
      asDouble.withColumn("list_id", ivfListId(col("e"), cs))
        .select(col("list_id"), posexplode(col("e")).as(Seq("i", "x")))
        .groupBy(col("list_id"), col("i"))
        .agg(sum(floor(col("x") * TrainQuant + 0.5).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .foreach { r =>
          next(r.getInt(0))(r.getInt(1)) =
            r.getLong(2).toDouble / (r.getLong(3) * TrainQuant)
        }
      cs = next
    }
    cs
  }

  /** Nearest-centroid list id (0-based; ties → lowest id). A pure
    * projection — `array_position(scores, array_max(scores))` — so
    * corpus assignment costs no shuffle and no window. */
  private def ivfListId(asDouble: Column, cs: Array[Array[Double]]): Column = {
    val scores = array(cs.map(c =>
      VectorFunctions.dot(asDouble, typedlit(c.toSeq))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** IVF-flat ANN top-k: the inverted-file scale path. Corpus rows are
    * bucketed into `nLists` inverted lists by nearest centroid (one
    * narrow projection); each query probes its `nProbe` nearest lists
    * (broadcast — queries are small) and reranks candidates by exact
    * cosine. Candidates shrink by ~nProbe/nLists versus brute force;
    * raise nLists for harder pruning, nProbe for recall. Output:
    * (q_id, id, score, rn). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, emb: String,
              k: Int, nLists: Int = 8, nProbe: Int = 2,
              dim: Int = 64,
              centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cs = centroids.getOrElse(ivfCentroids(nLists, dim))
    require(cs.length == nLists, s"expected $nLists centroids, got ${cs.length}")
    val c = prepped(corpus, id, emb, id, "c_emb", "c_nrm")
      .withColumn("list_id", ivfListId(col("c_emb"), cs))
    // per-query probe set: top-nProbe centroid ids by dot product
    val qScores = array(cs.map(cc =>
      VectorFunctions.dot(col("q_emb"), typedlit(cc.toSeq))): _*)
    val q = prepped(queries, id, emb, "q_id", "q_emb", "q_nrm")
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        posexplode(qScores).as(Seq("list_id", "c_score")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("c_score").desc, col("list_id"))))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("list_id"))
    c.join(broadcast(q), Seq("list_id"))
      .filter(col("q_id") =!= col(id))
      .withColumn("score", pairScore)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** Recall@k — the eval harness every ANN index needs as a first-
    * class query, not a notebook afterthought: per query, the
    * fraction of the EXACT top-k the approximate index recovered, in
    * exact integer basis points (n_hit·10⁴ ÷ n_exact, integer
    * division — engine-identical). Input: two (qCol, idCol) result
    * sets (any of [[bruteForceTopK]] / [[ivfTopK]] / [[pqTopK]] /
    * [[ivfPqTopK]] shapes). Scale: one keyed left join on
    * (query, candidate) + one keyed aggregate — result is
    * |queries| rows, never corpus-scale. */
  def recallAtK(approx: DataFrame, exact: DataFrame,
                qCol: String, idCol: String): DataFrame =
    exact.select(col(qCol), col(idCol))
      // defensive distinct: a multi-probe union or raw candidate set
      // with duplicate (q, id) rows would otherwise fan out the left
      // join and silently inflate both n_exact and n_hit
      .join(approx.select(col(qCol), col(idCol))
        .dropDuplicates(qCol, idCol)
        .withColumn("__hit", lit(1L)), Seq(qCol, idCol), "left")
      .groupBy(col(qCol))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_bp", call_function("div",
        col("n_hit") * 10000L, col("n_exact")))
      .select(col(qCol), col("n_exact"), col("n_hit"),
        col("recall_bp"))

  /** L2-normalize an embedding column (double-cast first): PQ trains,
    * encodes and queries on the UNIT SPHERE so the ADC dot-product
    * scores rank like the cosine the rest of the engine uses — the
    * standard normalize-before-PQ rule. One deterministic chain
    * (sqrt of the index-ordered self-dot, one divide per coordinate),
    * replayed verbatim in SQL. Zero vectors stay zero (0/1 guard
    * rather than 0/0 NaN poisoning every code). */
  private def pqNormalize(emb: Column): Column = {
    val e = transform(emb, x => x.cast("double"))
    val nrm = sqrt(VectorFunctions.dot(e, e))
    transform(e, x => x / when(nrm === 0.0, 1.0).otherwise(nrm))
  }

  /** Product-quantization codes for one vector — array of `m` sub-
    * space centroid ids (0-based). Assignment is L2-nearest via the
    * monotone surrogate 2·x·c − |c|² (argMAX — avoids computing |x|²,
    * which is constant per subvector), ties → lowest code, all folds
    * index-ordered so the DuckDB replay is bit-identical. A pure
    * projection: encoding costs no shuffle.
    *
    * `spark` is the session whose temp-function registry resolves the
    * encode expression — pass the session of the DataFrame this Column
    * will run in (SparkSession.active is wrong in multi-session apps).
    * Cluster deployments that inject [[graft.GraftExtensions]] resolve
    * `graft_pq_codes`/`graft_pq_luts` without any registration call. */
  def pqCodes(spark: SparkSession, e: Column,
              codebooks: Array[Array[Array[Double]]]): Column = {
    graft.functions.PqFunctions.register(spark)
    graft.functions.PqFunctions.codes(e, cbsLit(codebooks))
  }

  /** The trained model as one nested-array literal — the constant-
    * size-plan contract: m·k·subDim doubles in a single Catalyst leaf
    * instead of m·k inlined sub-expressions ([[graft.functions
    * .PqFunctions]] has the plan-overhead numbers). */
  private def cbsLit(codebooks: Array[Array[Array[Double]]]): Column =
    typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)

  /** Trained-model memo (the pairsMemo contract from Dedup): keyed by
    * session + params, guarded by PLAN EQUALITY on the canonicalized
    * corpus plan — a hash collision must never serve another corpus's
    * model. Registry rows train the same model behind several
    * retrieval rows (flat-PQ, IVFADC); without the memo each row
    * repays the full training (~10 s of the sf0.1 bench was repeated
    * identical training). Bounded to the 4 most recent plans per key. */
  private val trainMemo =
    new graft.ops.PlanMemo[(Int, String), AnyRef]()

  private def memoized[A <: AnyRef](df: DataFrame, tag: String)
                                   (train: => A): A =
    trainMemo.getOrCompute(
      (System.identityHashCode(df.sparkSession), tag), df)(train)
      .asInstanceOf[A]

  /** Fixed-iteration PQ codebook trainer — `m` INDEPENDENT Lloyd's
    * runs over the subspaces, all folded into ONE corpus pass per
    * iteration (assign all m codes in a single projection, explode to
    * (subspace, code, coordinate), one keyed aggregate): the same
    * exact-integer recentring contract as [[trainIvfCentroids]]
    * ([[TrainQuant]]-quantized sums, one rounded IEEE divide), same
    * deterministic splitmix init (per-subspace seed offset), same
    * empty-cell rule (keep the previous centroid) — so the
    * `llm_similarity_pq_train` oracle replays every round. The model
    * is m·k·(dim/m) scalars (driver, the model-state rule); train on
    * a sample at fleet scale. */
  def trainPqCodebooks(corpus: DataFrame, emb: String, m: Int = 8,
                       k: Int = 16, iters: Int = 3, dim: Int = 64,
                       seed: Long = IvfSeed): Array[Array[Array[Double]]] =
    memoized(corpus, s"pq|$emb|$m|$k|$iters|$dim|$seed") {
      trainPqCodebooksUncached(corpus, emb, m, k, iters, dim, seed)
    }

  private def trainPqCodebooksUncached(corpus: DataFrame, emb: String,
      m: Int, k: Int, iters: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    require(dim % m == 0, "dim must divide evenly into m subspaces")
    VectorFunctions.register(corpus.sparkSession)
    val subDim = dim / m
    val asDouble = graft.ops.Ops.parallelizeInput(corpus)
      .select(pqNormalize(col(emb)).as("e"))
      .localCheckpoint()
    // init centroids scaled to the data shell: unit vectors' subspace
    // norms are ~1/sqrt(m), while raw splitmix planes sit at
    // ~sqrt(subDim/3) — unscaled, the -|c|^2 term dominates the L2
    // surrogate and every point collapses onto the smallest-norm
    // centroid (measured recall 0.08). sqrt(3/dim) lands init norms
    // at ~1/sqrt(m); 3.0/dim is exactly representable (dim a power of
    // two) so the SQL replay multiplies by the identical double.
    val initScale = math.sqrt(3.0 / dim)
    var cbs = Array.tabulate(m)(s =>
      planes(k, subDim, seed + 1000L * s).map(_.map(_ * initScale)))
    for (_ <- 0 until iters) {
      val next = Array.tabulate(m, k, subDim)((s, c, i) => cbs(s)(c)(i))
      asDouble
        .select(col("e"), posexplode(pqCodes(asDouble.sparkSession, col("e"), cbs))
          .as(Seq("s", "code")))
        .select(col("s"), col("code"),
          posexplode(slice(col("e"), col("s") * subDim + 1, lit(subDim)))
            .as(Seq("i", "x")))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(sum(floor(col("x") * TrainQuant + 0.5).cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .collect()
        .foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            r.getLong(3).toDouble / (r.getLong(4) * TrainQuant)
        }
      cbs = next
    }
    cbs
  }

  /** PQ/ADC top-k retrieval — the FAISS-family memory-scale path next
    * to [[ivfTopK]]'s pruning: the corpus is stored as m small-int
    * codes per vector (m bytes at k ≤ 256 — a 32× compression of a
    * 64-float embedding), queries stay exact, and scoring is
    * asymmetric-distance: per query, a LUT of ⌊q_sub·centroid·2²⁰+½⌋
    * per (subspace, code) — m·k integers, broadcast with the query —
    * and each candidate's score is the SUM of m table lookups (exact
    * integer addition, oracle-replayed). Approximation error is the
    * quantizer's, measured against brute force in LlmSpec. Output:
    * (q_id, id, score_q, rn). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, id: String,
             emb: String, k: Int,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    graft.functions.PqFunctions.register(corpus.sparkSession)
    val c = graft.ops.Ops.parallelizeInput(corpus, col(id))
      .select(col(id), pqCodes(corpus.sparkSession, pqNormalize(col(emb)), codebooks)
        .as("codes"))
    val luts = graft.functions.PqFunctions.luts(col("q_e"),
      cbsLit(codebooks), lit(TrainQuant))
    val q = queries.select(col(id).as("q_id"),
        pqNormalize(col(emb)).as("q_e"))
      .select(col("q_id"), luts.as("luts"))
    graft.functions.AdcScore.register(corpus.sparkSession)
    c.join(broadcast(q), col("q_id") =!= col(id))
      .withColumn("score_q",
        graft.functions.AdcScore.of(col("codes"), col("luts")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score_q").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score_q"), col("rn"))
  }

  /** IVFADC — the composition FAISS ships as its billion-scale
    * default: the IVF coarse quantizer prunes candidates to the
    * query's `nProbe` nearest lists, and PQ/ADC scores ONLY those
    * candidates from their nibble codes. The corpus never stores raw
    * vectors in the index: (id, list_id, codes) is the whole
    * per-vector footprint. Cost: |corpus|·nProbe/nLists ADC lookups
    * per query instead of all |corpus| ([[pqTopK]]) or exact dots
    * over the probed lists ([[ivfTopK]]). Both models train with the
    * exact-integer rules, so the entire index — coarse assignment,
    * codes, probes, LUT ranking — replays in the oracle. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, id: String,
                emb: String, k: Int, nLists: Int, nProbe: Int,
                coarse: Array[Array[Double]],
                codebooks: Array[Array[Array[Double]]]): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    graft.functions.PqFunctions.register(corpus.sparkSession)
    val c = graft.ops.Ops.parallelizeInput(corpus, col(id))
      .select(col(id),
        ivfListId(transform(col(emb), x => x.cast("double")), coarse)
          .as("list_id"),
        pqCodes(corpus.sparkSession, pqNormalize(col(emb)), codebooks)
          .as("codes"))
    val qScores = array(coarse.map(cc =>
      VectorFunctions.dot(transform(col(emb), x => x.cast("double")),
        typedlit(cc.toSeq))): _*)
    val luts = graft.functions.PqFunctions.luts(col("q_e"),
      cbsLit(codebooks), lit(TrainQuant))
    val q = queries
      .select(col(id).as("q_id"), pqNormalize(col(emb)).as("q_e"),
        posexplode(qScores).as(Seq("list_id", "c_score")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("c_score").desc, col("list_id"))))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), luts.as("luts"), col("list_id"))
    graft.functions.AdcScore.register(corpus.sparkSession)
    c.join(broadcast(q), Seq("list_id"))
      .filter(col("q_id") =!= col(id))
      .withColumn("score_q",
        graft.functions.AdcScore.of(col("codes"), col("luts")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score_q").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score_q"), col("rn"))
  }

  /** Planted MISLABELED near-duplicates: the same jittered copies as
    * [[withPlantedDups]] but carrying a shifted label — the
    * adversarial case [[hardNegatives]]'s duplicate guard exists for
    * (a stray copy of the anchor marked as a different class would
    * otherwise top the "negatives" list and poison the contrastive
    * batch). Mirrored verbatim in the `llm_hard_negatives` oracle. */
  def withMislabeledDups(corpus: DataFrame, id: String, emb: String,
                         label: String, every: Int = 20,
                         idOffset: Long = 1000000L,
                         nLabels: Int = 10): DataFrame = {
    val base = corpus.select(col(id), col(label),
      transform(col(emb), x => x.cast("double")).as(emb))
    val planted = base.filter(pmod(col(id), lit(every)) === 0)
      .select((col(id) + lit(idOffset)).as(id),
        pmod(col(label) + 1, lit(nLabels)).as(label),
        transform(col(emb), (x, i) =>
          x * (lit(1.0) + lit(0.02) * (pmod(i, lit(5)).cast("double") - lit(2.0))))
          .as(emb))
    base.unionByName(planted)
  }

  /** Hard-negative mining for contrastive training data: per query,
    * the top-`k` most-similar corpus rows that are (a) not the query,
    * (b) not same-`label` (the published recipe — similar but wrong
    * class), and (c) below `dupThreshold` cosine (a near-duplicate of
    * the anchor is a positive in disguise — often a mislabeled copy —
    * not a negative). Both exclusions run BEFORE the rank window, so
    * `rn` ranks the eligible set. Candidates come from the same IVF
    * probe join as [[ivfTopK]]. Output: (q_id, id, score, rn).
    *
    * 100 TB story: identical to ivfTopK — corpus side is one narrow
    * list-assignment projection, queries broadcast, candidates shrink
    * ~nProbe/nLists, one rank window keyed by q_id; the extra label /
    * threshold predicates are pushed into the joined stream and cost
    * nothing. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, id: String,
                    emb: String, label: String, k: Int,
                    dupThreshold: Double, nLists: Int = 8,
                    nProbe: Int = 2, dim: Int = 64,
                    centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cs = centroids.getOrElse(ivfCentroids(nLists, dim))
    require(cs.length == nLists, s"expected $nLists centroids, got ${cs.length}")
    def prep(df: DataFrame, idAs: String, labelAs: String, embAs: String,
             nrmAs: String) =
      graft.ops.Ops.parallelizeInput(df, col(id))
        .select(col(id).as(idAs), col(label).as(labelAs),
          transform(col(emb), x => x.cast("double")).as(embAs))
        .withColumn(nrmAs, sqrt(VectorFunctions.dot(col(embAs), col(embAs))))
    val c = prep(corpus, id, "c_label", "c_emb", "c_nrm")
      .withColumn("list_id", ivfListId(col("c_emb"), cs))
    val qScores = array(cs.map(cc =>
      VectorFunctions.dot(col("q_emb"), typedlit(cc.toSeq))): _*)
    val q = prep(queries, "q_id", "q_label", "q_emb", "q_nrm")
      .select(col("q_id"), col("q_label"), col("q_emb"), col("q_nrm"),
        posexplode(qScores).as(Seq("list_id", "c_score")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("c_score").desc, col("list_id"))))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("q_label"), col("q_emb"), col("q_nrm"),
        col("list_id"))
    c.join(broadcast(q), Seq("list_id"))
      .filter(col("q_id") =!= col(id) && col("c_label") =!= col("q_label"))
      .withColumn("score", pairScore)
      .filter(col("score") < dupThreshold)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** ANN top-k: candidates = corpus rows in the query's bucket
    * (equi-join on bucket — the scale path), reranked by exact cosine.
    * Recall < 1 by construction; raise `numPlanes` ↓bucket size,
    * lower it ↑recall. */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String,
              emb: String, k: Int, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val ps = planes(numPlanes, dim)
    def prep(df: DataFrame, idAs: String, embAs: String, nrmAs: String) =
      withLshBucket(df, emb, ps)
        .select(col(id).as(idAs), col("lsh_bucket"),
          transform(col(emb), x => x.cast("double")).as(embAs))
        .withColumn(nrmAs, sqrt(VectorFunctions.dot(col(embAs), col(embAs))))
    val cPrep = prep(corpus, id, "c_emb", "c_nrm")
    val qPrep = prep(queries, "q_id", "q_emb", "q_nrm")
    cPrep.join(broadcast(qPrep), Seq("lsh_bucket"))
      .filter(col("q_id") =!= col(id))
      .withColumn("score", pairScore)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** Planted defective vectors for [[embeddingHygiene]] non-vacuity
    * (the synthetic embeddings are all clean): NaN in element 0 on
    * id % 31 = 0, +Inf in element 0 on id % 37 = 0, the whole vector
    * zeroed on id % 41 = 0 — applied in THIS order (zeroing wins on
    * overlap), mirrored verbatim in the DuckDB oracle. */
  def withPlantedBadVectors(df: DataFrame, id: String, emb: String): DataFrame =
    df.withColumn(emb,
      when(pmod(col(id), lit(41)) === 0,
        transform(col(emb), _ => lit(0.0f)))
      .when(pmod(col(id), lit(31)) === 0,
        transform(col(emb), (x, i) =>
          when(i === 0, lit(Float.NaN)).otherwise(x)))
      .when(pmod(col(id), lit(37)) === 0,
        transform(col(emb), (x, i) =>
          when(i === 0, lit(Float.PositiveInfinity)).otherwise(x)))
      .otherwise(col(emb)))

  /** Embedding hygiene gate — the validation every ANN/dedup pipeline
    * needs before trusting a vector column: per vector, the dimension
    * count, NaN / ±Inf presence, the all-zero degenerate (undefined
    * cosine), and the composite `ok` verdict against the expected
    * dimensionality. A single narrow projection (no shuffle, scan
    * speed at any corpus size); every check is an exact predicate —
    * no norms, no epsilons — so the DuckDB oracle replays the row
    * verbatim. Run it BEFORE [[quantizeInt8]]/[[ivfTopK]]: one NaN
    * poisons a dot product silently, and zero vectors make cosine
    * 0/0. */
  def embeddingHygiene(df: DataFrame, id: String, emb: String,
                       expectedDim: Int): DataFrame =
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id),
        size(col(emb)).cast("long").as("n_dims"),
        exists(col(emb), x => isnan(x)).as("has_nan"),
        exists(col(emb), x =>
          x === lit(Float.PositiveInfinity) ||
          x === lit(Float.NegativeInfinity)).as("has_inf"),
        forall(col(emb), x => x === lit(0.0f)).as("all_zero"))
      .withColumn("ok",
        !col("has_nan") && !col("has_inf") && !col("all_zero") &&
          col("n_dims") === expectedDim)

  /** Johnson–Lindenstrauss random projection — dimensionality
    * reduction to `outDim` via the same seeded splitmix64 hyperplanes
    * the ANN/banding stack uses (so the DuckDB oracle rebuilds them
    * from integer literals and replays every coordinate). Coordinate
    * j = v·plane_j / √outDim — one codegen'd dot per output
    * dimension, a pure narrow projection (no shuffle, scan speed).
    * Plane entries are uniform on [−1, 1] (variance ⅓), so the
    * unbiasing scale is √(outDim/3): squared distances are preserved
    * in expectation within the standard JL (1±ε) bound at
    * outDim = O(log n / ε²) — EmbeddingSpec measures the distortion
    * on real pairs. Output: (id, p, coord_e6) exploded one row per
    * output dimension, coordinate quantized ⌊·10⁶+½⌋ AFTER the
    * single deterministic dot (the house float rule). */
  def jlProject(df: DataFrame, id: String, emb: String,
                outDim: Int, dim: Int, seed: Long = 42L): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    val ps = planes(outDim, dim, seed)
    val scale = math.sqrt(outDim / 3.0)
    val dots = ps.toSeq.map(p =>
      VectorFunctions.dot(transform(col(emb), x => x.cast("double")),
        typedlit(p.toSeq)) / scale)
    graft.ops.Ops.parallelizeInput(df, col(id))
      .select(col(id), posexplode(array(dots: _*)).as(Seq("p", "c")))
      .select(col(id), col("p"),
        floor(col("c") * 1000000 + 0.5).cast("long").as("coord_e6"))
  }

  /** Exact integer Gram matrix of an embedding column — the Σ vᵢvⱼ
    * accumulation PCA / whitening / OPQ rotation training starts
    * from, as a corpus-scale aggregate. Per-row products quantize
    * ⌊vᵢ·vⱼ·2²⁰+½⌋ BEFORE the sum, so the accumulation is an integer
    * sum — exact under any partial order, replayed verbatim by the
    * oracle (a float Gram would differ in the last ulps per
    * partitioning). Shape: two sequence-explodes (upper triangle,
    * dim(dim+1)/2 rows per vector) + one (i, j)-keyed sum with
    * map-side combine — no driver state, no dim² aggregate columns.
    * Output: (i, j, g_q) for i ≤ j, g_q in 2⁻²⁰ units. Feed the
    * collected matrix (dim² scalars — model state, the IVF rule) to
    * [[pcaWhiten]]. */
  def gramMatrix(df: DataFrame, emb: String, dim: Int): DataFrame =
    graft.ops.Ops.parallelizeInput(df, monotonically_increasing_id())
      .select(transform(col(emb), x => x.cast("double")).as("e"))
      .select(col("e"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("e"), col("i"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"))
      .select(col("i"), col("j"),
        floor(element_at(col("e"), col("i") + 1) *
          element_at(col("e"), col("j") + 1) * 1048576 + 0.5)
          .cast("long").as("p_q"))
      .groupBy(col("i"), col("j")).agg(sum(col("p_q")).as("g_q"))

  /** PCA whitening from a collected Gram matrix: eigendecompose by
    * cyclic Jacobi rotations (deterministic driver-side float math on
    * the EXACT integer Gram input — dim² scalars, the model-state
    * rule), return the top-k (eigenvalue, eigenvector) pairs sorted
    * by eigenvalue descending with a deterministic sign convention
    * (first nonzero component positive). The whitening transform is
    * W = Λ^(−½)·Uᵀ; EmbeddingSpec checks orthonormality,
    * reconstruction, and agreement of U·Λ·Uᵀ with the input. */
  def pcaWhiten(gram: Array[Array[Double]], k: Int,
                sweeps: Int = 20): Seq[(Double, Array[Double])] = {
    val n = gram.length
    val a = gram.map(_.clone())
    val v = Array.tabulate(n, n)((r, c) => if (r == c) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      if (math.abs(a(p)(q)) > 1e-13) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until n) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
    }
    (0 until n).map { d =>
      val vec = Array.tabulate(n)(i => v(i)(d))
      val firstNz = vec.indexWhere(x => math.abs(x) > 1e-12)
      if (firstNz >= 0 && vec(firstNz) < 0) {
        var i = 0; while (i < n) { vec(i) = -vec(i); i += 1 }
      }
      (a(d)(d), vec)
    }.sortBy(-_._1).take(k)
  }
}
