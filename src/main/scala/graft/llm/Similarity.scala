package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ArrayType(FloatType)).
  *
  * Two paths: brute-force cosine top-k (the exactness baseline —
  * queries are broadcast, so cost is |queries|·|corpus| dot products,
  * fully parallel over the corpus), and a random-hyperplane LSH path
  * whose candidate set comes from an equi-join on a bucket key — the
  * 100 TB shape, trading recall for a corpus-partitionable probe.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed as a
    * sequential double fold (dot / (√na·√nb)) — bit-identical to
    * DuckDB's `list_cosine_similarity` on double lists, which the
    * oracle uses. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def norm(c: Column) = sqrt(aggregate(c, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (norm(a) * norm(b))
  }

  /** Brute-force top-k: for each row of `queries` (small, broadcast),
    * the k nearest corpus rows by cosine. Output:
    * (q_id, id, score, rn). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     emb: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("q_id"), col(emb).as("q_emb"))
    val scored = corpus.select(col(id), col(emb))
      .join(broadcast(q), col("q_id") =!= col(id))
      .withColumn("score", cosine(col("q_emb"), col(emb)))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }

  /** All pairs with cosine ≥ threshold — embedding-space near-dup
    * detection. Quadratic: keep for oracle-scale corpora; at fleet
    * scale use [[lshBuckets]] first. */
  def nearDupPairs(corpus: DataFrame, id: String, emb: String,
                   threshold: Double): DataFrame = {
    val a = corpus.select(col(id).as("a"), col(emb).as("ea"))
    val b = corpus.select(col(id).as("b"), col(emb).as("eb"))
    a.join(b, col("a") < col("b"))
      .withColumn("score", cosine(col("ea"), col("eb")))
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), col("score"))
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 → [-1, 1]);
    * fixed seed so plans are reproducible across runs/sessions. */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    Array.tabulate(numPlanes, dim) { (p, i) =>
      val h = splitmix(seed + p * 1000003L + i)
      (h.toDouble / Long.MaxValue)
    }
  }

  /** Sign-of-dot-product bucket id per row: bit p set iff
    * v·plane_p > 0. One narrow projection, no shuffle. */
  def withLshBucket(df: DataFrame, emb: String,
                    planes: Array[Array[Double]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(col(emb), typedlit(plane.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1 << p)).otherwise(0)
    }.reduce(_ + _)
    df.withColumn("lsh_bucket", bucket)
  }

  /** ANN top-k: candidates = corpus rows in the query's bucket
    * (equi-join on bucket — the scale path), reranked by exact cosine.
    * Recall < 1 by construction; raise `numPlanes` ↓bucket size,
    * lower it ↑recall. */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String,
              emb: String, k: Int, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(numPlanes, dim)
    val c = withLshBucket(corpus, emb, ps)
    val q = withLshBucket(queries, emb, ps)
      .select(col(id).as("q_id"), col(emb).as("q_emb"), col("lsh_bucket"))
    c.join(q, Seq("lsh_bucket")).filter(col("q_id") =!= col(id))
      .withColumn("score", cosine(col("q_emb"), col(emb)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("score").desc, col(id))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col(id), col("score"), col("rn"))
  }
}
