package graft.llm

import graft.SparkSpec

/** The LSH parameter planner's S-curve math and its promised
  * monotonicities, plus the auto-banded operator; shares the suite
  * session (the planner itself is driver-side scalar logic). */
class DedupPlanSpec extends SparkSpec {

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

  test("corpus size genuinely moves the plan: bigger n buys harder pruning") {
    val plans = Seq(1e2, 1e4, 1e6, 1e9, 1e12).map { n =>
      val (b, r, _, _) = Dedup.planMinhashBands(n.toLong, 0.8, 0.95)
      (n, b, r)
    }
    // rowsPerBand is non-decreasing in n, and strictly increases
    // somewhere across 10 orders of magnitude — the rule is real, not
    // a constant the n merely decorates
    plans.sliding(2).foreach { case Seq((_, _, r1), (_, _, r2)) =>
      assert(r2 >= r1, s"pruning got SOFTER with more rows: $plans")
    }
    assert(plans.last._3 > plans.head._3,
      s"plan never moved across n=1e2..1e12: $plans")
    // and the per-pair random-collision rate vanishes at fleet scale
    val (bBig, rBig, _, _) = Dedup.planMinhashBands(1000000000000L, 0.8, 0.95)
    assert(bBig * math.pow(0.05, rBig) < 1e-9)
  }

  test("a higher recall target never plans fewer bands at fixed r selection") {
    val (b1, r1, _, _) = Dedup.planMinhashBands(1000000L, 0.8, 0.9)
    val (b2, r2, _, _) = Dedup.planMinhashBands(1000000L, 0.8, 0.999)
    assert(recall(b2, r2, 0.8) >= 0.999 && recall(b1, r1, 0.8) >= 0.9)
    assert(b2 * r2 >= b1 * r1, "stricter recall cannot cost fewer hashes")
  }

  test("minhashLshAuto finds planted near-identical pairs with self-planned banding") {
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

  test("low-threshold mining exposes the background-similarity knob") {
    // minJaccard at or below the default background must be callable
    // by lowering backgroundSim, and the failure message names it
    val e = intercept[IllegalArgumentException](
      Dedup.planMinhashBands(1000L, 0.05, 0.9))
    assert(e.getMessage.contains("backgroundSim"))
    val (b, r, rec, _) = Dedup.planMinhashBands(1000L, 0.05, 0.9,
      backgroundSim = 0.005)
    assert(rec >= 0.9 && b >= 1 && r >= 1)
  }

  test("infeasible budgets fail loudly") {
    val e = intercept[IllegalArgumentException](
      Dedup.planMinhashBands(1000L, 0.9, targetRecall = 0.999999,
        maxHashes = 4))
    assert(e.getMessage.contains("maxHashes"))
  }
}
