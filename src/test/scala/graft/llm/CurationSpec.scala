package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Invariants of the round-5 curation operators (PII redaction,
  * boilerplate removal, mixture upsampling, semantic dedup) — the
  * oracle rows check exact cross-engine agreement; these check the
  * operators' contracts against the planting rules. */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val docs = Tables.documents(spark, dir).cache()
  private lazy val embs = Tables.embeddings(spark, dir).cache()

  test("redactPii: plants detected per the id rule, redaction is a fixed point") {
    val planted = TextAnalysis.withPlantedPii(docs, "text", "doc_id")
    val out = TextAnalysis.redactPii(planted, "text", "doc_id").cache()
    // counts follow the planting rule exactly (base corpus has no PII)
    val bad = out.filter(
      col("n_email") =!= when(pmod(col("doc_id"), lit(7)) === 0, 1L).otherwise(0L) ||
      col("n_ipv4") =!= when(pmod(col("doc_id"), lit(5)) === 0, 1L).otherwise(0L) ||
      col("n_phone") =!= when(pmod(col("doc_id"), lit(11)) === 0, 1L).otherwise(0L))
    assert(bad.count() == 0)
    // docs with nothing planted are untouched
    val untouched = out
      .join(docs.select(col("doc_id"), md5(col("text").cast("binary")).as("orig_md5")),
        Seq("doc_id"))
      .filter(col("n_email") + col("n_ipv4") + col("n_phone") === 0)
      .filter(col("redacted_md5") =!= col("orig_md5"))
    assert(untouched.count() == 0)
    // redaction is a fixed point: no pattern matches the redacted text
    val redacted = planted.select(col("doc_id"),
      TextAnalysis.PiiPatterns.foldLeft(col("text")) {
        case (c, (_, p, r)) => regexp_replace(c, p, r)
      }.as("text"))
    val residual = TextAnalysis.redactPii(redacted, "text", "doc_id")
      .filter(col("n_email") + col("n_ipv4") + col("n_phone") > 0)
    assert(residual.count() == 0)
  }

  test("removeBoilerplate: strips exactly the planted banner, cleaned = original") {
    val planted = Dedup.withPlantedBoilerplate(docs, "text", "doc_id")
    val out = Dedup.removeBoilerplate(planted, "text", "doc_id",
      k = 5, minDf = 50L).cache()
    val bannerLen = Dedup.BoilerplateBanner.split(" ").length
    // every third doc loses exactly the banner, others lose nothing
    val bad = out.filter(col("n_removed") =!=
      when(pmod(col("doc_id"), lit(3)) === 0, bannerLen.toLong).otherwise(0L))
    assert(bad.count() == 0)
    // cleaning a banner-prefixed doc recovers the original text exactly
    val mismatch = out
      .join(docs.select(col("doc_id"), md5(col("text").cast("binary")).as("orig_md5")),
        Seq("doc_id"))
      .filter(col("cleaned_md5") =!= col("orig_md5"))
    assert(mismatch.count() == 0)
  }

  test("mixtureEpochs: floor of 1, upweighted sources repeat, plan is broadcast") {
    val weights = Map("src0" -> 0.2, "src3" -> 0.1)
    val plan = Sampling.mixtureEpochs(docs, "source", col("n_chars"),
      weights, defaultWeight = 0.04)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(plan.values.forall(_ >= 1L))
    assert(plan("src0") > plan("src3") && plan("src3") > 1L)
    assert(plan.filterKeys(s => !weights.contains(s)).values.forall(_ == 1L))
    val up = Sampling.mixtureUpsample(docs, "source", col("n_chars"),
      weights, defaultWeight = 0.04)
    // every row repeats exactly its source's epoch count, 0-indexed
    val perDoc = up.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("max_e"))
      .join(docs.select(col("doc_id")), Seq("doc_id"))
    val wrong = perDoc.filter(col("max_e") =!= col("n") - 1).count() +
      perDoc.withColumn("want",
          weights.toSeq.sortBy(_._1).foldLeft[org.apache.spark.sql.Column](lit(1L)) {
            case (els, (s, _)) => when(col("source") === s, lit(plan(s))).otherwise(els)
          })
        .filter(col("n") =!= col("want")).count()
    assert(wrong == 0)
    // the plan side joins broadcast — the corpus side never shuffles
    assert(up.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("removeBoilerplate: all-boilerplate and shorter-than-k documents") {
    import spark.implicits._
    val banner = "x y z w v"                 // 5 tokens = one 5-gram
    val docs = (0L until 60L).map { i =>
      if (i < 58) (i, s"$banner unique$i")   // banner + 1 own token
      else if (i == 58) (i, banner)          // ONLY boilerplate
      else (i, "a b c")                      // shorter than k: no grams
    }.toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "text", "doc_id", k = 5, minDf = 50L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the all-banner doc empties out: md5 of the empty string
    assert(out(58L).getLong(2) == 5L &&
      out(58L).getString(3) == "d41d8cd98f00b204e9800998ecf8427e")
    // a shorter-than-k doc contributes no grams and keeps everything
    assert(out(59L).getLong(2) == 0L)
    // ordinary docs keep exactly their unique token
    assert(out(0L).getLong(1) == 6L && out(0L).getLong(2) == 5L)
  }

  test("redactPii: adjacent and multiple PII in one document") {
    import spark.implicits._
    val docs = Seq(
      (0L, "mail a.b+c@ex-1.co.uk then 192.168.0.1 call +1-415-555-0199"),
      (1L, "two mails x@y.io z@w.ai and ips 1.2.3.4 5.6.7.8"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 1L && out(0L).getLong(2) == 1L &&
      out(0L).getLong(3) == 1L)
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 2L &&
      out(1L).getLong(3) == 0L)
    assert(out(2L).getLong(1) + out(2L).getLong(2) + out(2L).getLong(3) == 0L)
  }

  test("semDedup: planted copies removed, bases kept, cluster-bounded join") {
    val planted = Similarity.withPlantedDups(embs, "vec_id", "embedding",
      every = 20)
    val out = Similarity.semDedup(planted, "vec_id", "embedding",
      threshold = 0.95, nLists = 8).cache()
    // exactly the planted jittered copies (cosine ≈ 0.999 to their
    // lower-id base, same cluster) are removed; no base vector is
    val removed = out.filter(col("removed")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val plantedIds = embs.filter(pmod(col("vec_id"), lit(20)) === 0)
      .collect().map(_.getLong(0) + 1000000L).toSet
    assert(removed == plantedIds)
    // removal verdicts are consistent with the reported max_lower
    assert(out.filter(col("removed") && col("max_lower") < 0.95).count() == 0)
    assert(out.filter(!col("removed") && col("max_lower") >= 0.95).count() == 0)
    // candidates come from the cluster equi-join, never a cross join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"))
  }
}
