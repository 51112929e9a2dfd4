package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BandKeysExpr, Md5Hash64Expr, SearchSortedExpr}

/** Property tests for the native expressions' scalar kernels against
  * independent straight-line references — no Spark session needed
  * (the kernels are what both eval and codegen call). */
class FunctionsSpec extends AnyFunSuite {

  /** Deterministic sampling from a Gen (no scalatest-scalacheck bridge
    * in the offline cache; fixed seed keeps runs reproducible). */
  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] = {
    var seed = Seed(7L)
    (0 until n).flatMap { _ =>
      val r = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.choose(0, 16)
    xs <- Gen.listOfN(n, Gen.choose(-5.0, 5.0))
  } yield xs.toArray

  test("BandKeysExpr.compute matches a per-plane reference for random inputs") {
    val cases = samples(for {
      dim <- Gen.choose(1, 8)
      rpb <- Gen.choose(1, 5)
      bands <- Gen.choose(1, 4)
      v <- Gen.listOfN(dim, Gen.choose(-3.0, 3.0))
      planes <- Gen.listOfN(bands * rpb, Gen.listOfN(dim, Gen.choose(-1.0, 1.0)))
    } yield (dim, rpb, v.toArray, planes.map(_.toArray).toArray))
    assert(cases.nonEmpty)
    cases.foreach { case (dim, rpb, v, planes) =>
      val got = BandKeysExpr
        .compute(new GenericArrayData(v), planes.flatten, dim, rpb)
        .toIntArray().toSeq
      val want = planes.grouped(rpb).map { band =>
        band.zipWithIndex.map { case (pl, r) =>
          val dot = pl.zip(v).map { case (a, b) => a * b }.sum
          if (dot > 0) 1 << r else 0
        }.sum
      }.toSeq
      // reference dot folds pairwise like the kernel (same order, same
      // IEEE result — both are strict left folds over index order)
      assert(got == want, s"dim=$dim rpb=$rpb v=${v.toSeq} planes=${planes.map(_.toSeq).toSeq}")
    }
  }

  test("SearchSortedExpr.upperBound matches linear scan on sorted arrays") {
    val cases = samples(for {
      xs <- vecGen
      v <- Gen.choose(-6.0, 6.0)
    } yield (xs.sorted, v))
    cases.foreach { case (xs, v) =>
      val got = SearchSortedExpr.upperBound(new GenericArrayData(xs), v)
      val want = xs.indexWhere(_ > v) match { case -1 => xs.length; case i => i }
      assert(got == want, s"xs=${xs.toSeq} v=$v")
    }
  }

  test("BloomMightContainExpr: no false negatives over random keys") {
    val keys = samples(Gen.choose(Long.MinValue, Long.MaxValue), n = 500)
    val members = keys.take(250).distinct
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(members.length.toLong.max(1L), 0.01)
    members.foreach(bloom.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val expr = graft.functions.BloomMightContainExpr.expr(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), out.toByteArray)
      .asInstanceOf[graft.functions.BloomMightContainExpr]
    // the deserialized-from-literal filter answers exactly like the
    // original: every member found, probes agree bit-for-bit
    keys.foreach { k =>
      assert(expr.probe(k) == bloom.mightContainLong(k))
    }
    assert(members.forall(expr.probe))
  }

  test("Md5Hash64Expr.hash equals the first 8 digest bytes, big-endian signed") {
    val cases = samples(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray), n = 100)
    cases.foreach { bytes =>
      val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val want = java.nio.ByteBuffer.wrap(digest).getLong
      assert(Md5Hash64Expr.hash(bytes) == want)
    }
  }
}
