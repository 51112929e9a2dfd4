package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Invariants of the deterministic dataset-assembly operators (the
  * oracle rows check exact assignment; these check the contract). */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir).cache()

  test("datasetSplit: exhaustive, disjoint, near the requested fractions, deterministic") {
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val split = Sampling.datasetSplit(docs, col("doc_id"), fr)
      .select(col("doc_id"), col("split"))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.keySet == Set("train", "val", "test")) // exhaustive
    assert(counts.values.sum == n.toLong)                // disjoint
    fr.foreach { case (label, f) =>
      val got = counts(label) / n
      assert(math.abs(got - f) < 0.05, s"$label: got $got want ~$f")
    }
    val again = Sampling.datasetSplit(docs, col("doc_id"), fr)
      .select(col("doc_id"), col("split")).collect().map(_.toSeq).toSet
    assert(split.collect().map(_.toSeq).toSet == again)  // deterministic
  }

  test("datasetSplit: growing a fraction only grows its set (bucket stability)") {
    def trainIds(trainFrac: Double) =
      Sampling.datasetSplit(docs, col("doc_id"),
          Seq("train" -> trainFrac, "rest" -> (1.0 - trainFrac)))
        .filter(col("split") === "train")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val t80 = trainIds(0.80)
    val t90 = trainIds(0.90)
    assert(t80.subsetOf(t90), "ids must keep their buckets as cuts move")
    assert(t90.size > t80.size)
  }

  test("stratifiedSample: per-stratum rates honored, subset, deterministic") {
    val ev = Tables.events(spark, dir)
    val sampled = Sampling.stratifiedSample(ev, col("event_id"),
      col("event_type"), rates = Map("purchase" -> 0.5), defaultRate = 0.1)
    val inRates = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val outRates = sampled.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    outRates.foreach { case (t, got) =>
      val want = if (t == "purchase") 0.5 else 0.1
      val rate = got.toDouble / inRates(t)
      assert(math.abs(rate - want) < 0.07, s"$t: got $rate want ~$want")
    }
    // a sample is a subset of its input
    assert(sampled.join(ev, Seq("event_id"), "left_anti").count() == 0)
  }

  test("takePerStratum: exactly k per stratum, subset, salt redraws") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("event_type"))
    val k = 50
    val out = Sampling.takePerStratum(ev, col("event_id"), col("event_type"), k)
      .cache()
    // exactly k per stratum (every stratum here has > k rows)
    val sizes = out.groupBy(col("event_type")).count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) == k))
    // a subset of the input, deterministic across runs
    assert(out.join(ev, Seq("event_id"), "left_anti").count() == 0)
    assert(graft.ops.Ops.frameDiff(out,
      Sampling.takePerStratum(ev, col("event_id"), col("event_type"), k)).isEmpty)
    // a stratum SMALLER than k keeps all its rows
    val tiny = Sampling.takePerStratum(ev.limit(7), col("event_id"),
      lit("all"), k)
    assert(tiny.count() == 7)
    // a different salt draws a different sample
    val other = Sampling.takePerStratum(ev, col("event_id"),
      col("event_type"), k, salt = "take2")
    assert(out.join(other, Seq("event_id"), "left_anti").count() > 0)
  }

  test("tokenBudgetSample: budget respected with <= 1 doc overshoot, prefix property, salt redraws") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("source"), col("text"))
    val budgets = Map("src0" -> 400L, "src1" -> 800L)
    val out = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")), budgets, defaultBudget = 600L)
      .cache()
    // per-source totals: the LAST kept doc may overshoot, but the
    // tokens BEFORE it always fit — max(cum - n) < budget per source
    out.groupBy(col("source"))
      .agg(max(col("cum_tokens") - col("n_tokens")).as("max_start"))
      .collect().foreach { r =>
        val b = budgets.getOrElse(r.getString(0), 600L)
        assert(r.getLong(1) < b, s"${r.getString(0)}: start ${r.getLong(1)} >= $b")
      }
    // every source is non-vacuously truncated at this SF (each holds
    // >= 1100 tokens, all budgets are <= 800)
    val keptPerSrc = out.groupBy(col("source")).count().collect()
    assert(keptPerSrc.length == 20)
    val inPerSrc = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    keptPerSrc.foreach(r =>
      assert(r.getLong(1) < inPerSrc(r.getString(0)),
        s"${r.getString(0)} not truncated"))
    // prefix property: kept set = the rank-prefix — no kept doc ranks
    // after a dropped doc of the same source (rank = (md5 h, id))
    val all = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")),
      budgets = Map.empty, defaultBudget = Long.MaxValue)
    val ranked = all.join(out.select(col("doc_id"), lit(1).as("__kept")),
      Seq("doc_id"), "left")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("cum_tokens"))
    val brokenPrefix = ranked
      .withColumn("__later_kept", max(col("__kept")).over(
        w.rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .filter(col("__kept").isNull && col("__later_kept") === 1)
      .count()
    assert(brokenPrefix == 0L, "kept set is not a rank prefix")
    // deterministic; a different salt redraws the fill
    assert(graft.ops.Ops.frameDiff(out,
      Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")), budgets, 600L)).isEmpty)
    val other = Sampling.tokenBudgetSample(docs, col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")), budgets, 600L, salt = "budget2")
    assert(out.join(other, Seq("doc_id"), "left_anti").count() > 0)
  }

  test("datasetSplitByCluster: no near-dup pair straddles splits, singletons unchanged") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 5, maxDf = 5, minJaccard = 0.5).select(col("a"), col("b"))
    val clusters = Dedup.duplicateClusters(pairs).cache()
    assert(clusters.count() > 0) // non-vacuous at this SF
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val byCluster = Sampling.datasetSplitByCluster(docs, col("doc_id"),
      clusters, fr).select(col("doc_id"), col("split")).cache()
    // every jaccard pair lands in ONE split — the leakage rule
    val straddlers = pairs
      .join(byCluster.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("split", "sa"), Seq("a"))
      .join(byCluster.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("split", "sb"), Seq("b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddlers == 0L)
    // doc-level hashing DOES leak on this corpus — the operator earns
    // its keep (if this ever goes to zero the test corpus stopped
    // exercising the rule)
    val plain = Sampling.datasetSplit(docs, col("doc_id"), fr)
      .select(col("doc_id"), col("split"))
    val plainStraddlers = pairs
      .join(plain.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("split", "sa"), Seq("a"))
      .join(plain.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("split", "sb"), Seq("b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(plainStraddlers > 0L)
    // singletons (not in any cluster) keep their plain assignment
    val singles = byCluster.join(clusters.select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .join(plain.withColumnRenamed("split", "plain_split"), Seq("doc_id"))
      .filter(col("split") =!= col("plain_split")).count()
    assert(singles == 0L)
  }

  test("unimaxAllocation: hand-computed allocations, cap and budget bind correctly") {
    import spark.implicits._
    // one row per (lang, n_tokens): sizes A=10, B=100, C=1000
    val docs = (Seq.fill(1)(("A", 10L)) ++ Seq.fill(2)(("B", 50L)) ++
      Seq.fill(4)(("C", 250L))).toDF("lang", "n")
    val got = Sampling.unimaxAllocation(docs, "lang", col("n"),
        budget = 600L, epochCap = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // ascending order A(10), B(100), C(1000), rem 600:
    //  A: fair 600/3=200, cap 30  -> 30, rem 570   (cap-bound)
    //  B: fair 570/2=285, cap 300 -> 285, rem 285  (budget-bound)
    //  C: fair 285/1=285, cap 3000 -> 285           (budget-bound)
    assert(got.toSeq == Seq(
      ("A", 10L, 30L, 3000000L),
      ("B", 100L, 285L, 2850000L),
      ("C", 1000L, 285L, 285000L)), got.toSeq.toString)
    assert(got.map(_._3).sum <= 600L)
    // a budget past everyone's cap: every group gets exactly cap*size
    val capped = Sampling.unimaxAllocation(docs, "lang", col("n"),
        budget = 100000L, epochCap = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(capped.forall { case (_, sz, a) => a == 3L * sz })
  }

  test("temperatureAllocation: sqrt-compressed shares, budget respected, T=4 flatter than T=2") {
    import spark.implicits._
    // perfect squares so quantized weights are exact: 100 -> q=10*2^20,
    // 10000 -> q=100*2^20; alloc ratio 1:10 where proportional is 1:100
    val docs = Seq(("A", 100L), ("B", 10000L)).toDF("lang", "n")
    val t2 = Sampling.temperatureAllocation(docs, "lang", col("n"),
        budget = 1000L, sqrtSteps = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(t2.toSeq == Seq(
      ("A", 100L, 10L << 20, 90L),     // 1000*10 // 110
      ("B", 10000L, 100L << 20, 909L)), t2.toSeq.toString)
    assert(t2.map(_._4).sum <= 1000L)
    // T=4 (two sqrts): even flatter — small group's share grows
    val t4 = Sampling.temperatureAllocation(docs, "lang", col("n"),
        budget = 1000L, sqrtSteps = 2)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(t4("A") > t2.find(_._1 == "A").get._4)
    assert(t4("A") + t4("B") <= 1000L)
  }

  test("curriculumOrder: equal-count bands in score order, pos a per-shard permutation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, (i * 37) % 211)).toDF("id", "sc")
    val r = Sampling.curriculumOrder(docs, col("id"), col("sc"),
        nBuckets = 4, shards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3),
        x.getLong(4), x.getLong(5))) // id, sc, shard, bucket, pos
    r.groupBy(_._3).foreach { case (_, g) =>
      // pos is a contiguous permutation 0..n-1 within the shard
      assert(g.map(_._5).sorted.toSeq == g.indices.map(_.toLong))
      // bands are equal-count (within 1) and never interleave in pos
      val sizes = g.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
      val byPos = g.sortBy(_._5).map(_._4)
      assert(byPos.sameElements(byPos.sorted), "bands interleaved in pos")
      // every score in band b is <= every score in band b+1
      val maxPer = g.groupBy(_._4).view.mapValues(_.map(_._2).max).toMap
      val minPer = g.groupBy(_._4).view.mapValues(_.map(_._2).min).toMap
      maxPer.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(maxPer(a) <= minPer(b),
          s"band $a max ${maxPer(a)} > band $b min ${minPer(b)}")
        case _ =>
      }
    }
    // deterministic: same salt reproduces bit-identically
    val r2 = Sampling.curriculumOrder(docs, col("id"), col("sc"),
        nBuckets = 4, shards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(5))).toMap
    assert(r.forall { case (id, _, _, _, pos) => r2(id) == pos })
  }

  test("weightedSample: expectation, caps, determinism, salt independence") {
    import spark.implicits._
    val n = 5000
    // weights 1..5000: W = n(n+1)/2; expected count for target m is
    // sum over i of min(1, m*w_i/W)
    val rows = (1L to n.toLong).map(i => (i, i)).toDF("id", "w")
    val target = 500L
    val kept = Sampling.weightedSample(rows, col("id"), col("w"), target)
      .select("id").collect().map(_.getLong(0)).toSet
    val bigW = n.toLong * (n + 1) / 2
    val expected = (1L to n.toLong)
      .map(w => math.min(1.0, target.toDouble * w / bigW)).sum
    val sd = math.sqrt(expected) // <= binomial sd upper bound
    assert(math.abs(kept.size - expected) < 5 * sd,
      s"got ${kept.size}, expected ~$expected (sd $sd)")
    // heavier rows keep more often (aggregate monotonicity)
    val loRate = (1 to n / 2).count(i => kept(i.toLong)).toDouble / (n / 2)
    val hiRate = (n / 2 + 1 to n).count(i => kept(i.toLong)).toDouble / (n / 2)
    assert(hiRate > loRate * 1.5, s"hi $hiRate vs lo $loRate")
    // a weight past the cap (m*w >= W) is ALWAYS kept
    val capped = Seq((99L, bigW)).toDF("id", "w")
    assert(Sampling.weightedSample(capped.union(rows), col("id"), col("w"),
      target).filter(col("id") === 99L).count() === 1L)
    // deterministic under the same salt, redrawn under another
    val again = Sampling.weightedSample(rows, col("id"), col("w"), target)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
    val other = Sampling.weightedSample(rows, col("id"), col("w"), target,
        salt = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other != kept)
  }
}
