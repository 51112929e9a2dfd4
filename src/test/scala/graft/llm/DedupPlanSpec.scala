package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The LSH parameter planner's S-curve math and its promised
  * monotonicities — pure driver-side scalar logic, no session. */
class DedupPlanSpec extends AnyFunSuite {

  private def recall(b: Int, r: Int, s: Double) =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  test("chosen plan meets the recall target at the threshold") {
    for {
      n <- Seq(10000L, 1000000L, 100000000L)
      t <- Seq(0.5, 0.8, 0.9)
      rho <- Seq(0.9, 0.99)
    } {
      val (b, r, rec, _) = Dedup.planMinhashBands(n, t, rho)
      assert(rec >= rho, s"n=$n t=$t rho=$rho -> ($b x $r) recall $rec")
      assert(math.abs(rec - recall(b, r, t)) < 1e-12)
      assert(b * r <= 256)
      // b is minimal for this r: one fewer band misses the target
      if (b > 1) assert(recall(b - 1, r, t) < rho,
        s"b not minimal at n=$n t=$t rho=$rho")
    }
  }

  test("bigger corpora push toward harder pruning (non-increasing candidate work)") {
    // the chosen plan's expected random-candidate RATE (work / pairs)
    // must not grow with n: more rows never buys looser buckets
    val rates = Seq(1e4, 1e6, 1e8, 1e10).map { n =>
      val (b, r, _, work) = Dedup.planMinhashBands(n.toLong, 0.8, 0.95)
      (work / (0.5 * n * n), b, r)
    }
    rates.sliding(2).foreach { case Seq((ra, _, _), (rb, _, _)) =>
      assert(rb <= ra + 1e-18, s"rate grew: $rates")
    }
    // and at 1e10 rows the per-pair rate is vanishing (sparse buckets)
    assert(rates.last._1 < 1e-6)
  }

  test("a higher recall target never plans fewer bands at fixed r selection") {
    val (b1, r1, _, _) = Dedup.planMinhashBands(1000000L, 0.8, 0.9)
    val (b2, r2, _, _) = Dedup.planMinhashBands(1000000L, 0.8, 0.999)
    assert(recall(b2, r2, 0.8) >= 0.999 && recall(b1, r1, 0.8) >= 0.9)
    assert(b2 * r2 >= b1 * r1, "stricter recall cannot cost fewer hashes")
  }

  test("minhashLshAuto finds planted near-identical pairs with self-planned banding") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // 60 distinct docs + near-identical copies of every 5th (one token
    // of ~40 changed -> shingle Jaccard well above 0.5)
    val base = (0L until 60L).map { i =>
      i -> (0 until 40).map(w => s"w${i}_$w").mkString(" ")
    }
    val copies = base.filter(_._1 % 5 == 0).map { case (i, t) =>
      (i + 1000L) -> t.replace(s"w${i}_7", "CHANGED")
    }
    val df = (base ++ copies).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshAuto(df, "text", "doc_id",
        minJaccard = 0.5, targetRecall = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = base.map(_._1).filter(_ % 5 == 0)
      .map(i => (i, i + 1000L)).toSet
    // planned banding at recall 0.99: every planted pair found, and
    // the exact rerank admits no cross-document false positives
    assert(pairs == expected, s"got $pairs want $expected")
  }

  test("infeasible budgets fail loudly") {
    val e = intercept[IllegalArgumentException](
      Dedup.planMinhashBands(1000L, 0.9, targetRecall = 0.999999,
        maxHashes = 4))
    assert(e.getMessage.contains("maxHashes"))
  }
}
