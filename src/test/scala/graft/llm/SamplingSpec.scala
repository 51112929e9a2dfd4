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
}
