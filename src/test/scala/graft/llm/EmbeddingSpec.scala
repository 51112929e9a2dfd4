package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Linear-algebra layer contracts: JL distance preservation with the
  * unbiasing scale, Gram exactness against a driver replay, and the
  * Jacobi eigensolver's spectral guarantees. */
class EmbeddingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, dir).cache()
  private lazy val vecs: Map[Long, Array[Double]] = emb
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("jlProject: unbiased squared distances within JL tolerance at outDim 8") {
    val proj = Similarity.jlProject(emb, "vec_id", "embedding",
        outDim = 8, dim = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2) / 1e6)
      }
    val ids = vecs.keys.toSeq.sorted.take(60)
    val ratios = for {
      Seq(a, b) <- ids.combinations(2).toSeq
    } yield {
      val d0 = vecs(a).zip(vecs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val d1 = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      d1 / d0
    }
    val mean = ratios.sum / ratios.size
    // unbiased in expectation: the mean over ~1800 pairs concentrates
    assert(math.abs(mean - 1.0) < 0.25, s"mean distance ratio $mean")
    // per-pair spread at k=8 is wide but bounded in practice
    assert(ratios.count(r => r > 0.2 && r < 3.5).toDouble / ratios.size > 0.95)
  }

  test("gramMatrix equals a driver-side exact replay; symmetric PSD-ish") {
    val g = Similarity.gramMatrix(emb, "embedding", dim = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(g.size == 64 * 65 / 2)
    // driver replay with the identical quantization
    val want = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    vecs.values.foreach { v =>
      for (i <- 0 until 64; j <- i until 64)
        want((i, j)) += math.floor(v(i) * v(j) * 1048576 + 0.5).toLong
    }
    g.foreach { case (k, got) => assert(got == want(k), s"$k") }
  }

  test("pcaWhiten: orthonormal eigenbasis, descending spectrum, reconstruction") {
    val n = 64
    val gq = Similarity.gramMatrix(emb, "embedding", dim = n)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val gram = Array.tabulate(n, n)((i, j) =>
      gq((math.min(i, j), math.max(i, j))) / 1048576.0)
    val eig = Similarity.pcaWhiten(gram, k = n)
    assert(eig.size == n)
    // descending, and non-negative up to quantization noise
    eig.map(_._1).sliding(2).foreach { case Seq(a, b) => assert(a >= b); case _ => }
    assert(eig.last._1 > -1e-3 * math.abs(eig.head._1))
    // orthonormal
    for (a <- eig.indices; b <- a until eig.size) {
      val d = eig(a)._2.zip(eig(b)._2).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"<u$a, u$b> = $d")
    }
    // spectral reconstruction: || U L U^T - G ||_max small vs scale
    val scale = math.abs(eig.head._1)
    for (i <- 0 until n; j <- 0 until n) {
      val r = eig.map { case (l, u) => l * u(i) * u(j) }.sum
      assert(math.abs(r - gram(i)(j)) < 1e-6 * scale, s"($i, $j)")
    }
    // top-8 captures most variance in this synthetic clustered corpus
    val top = eig.take(8).map(_._1).sum
    val tot = eig.map(_._1).sum
    assert(top / tot > 0.2, s"top-8 share ${top / tot}")
  }
}
