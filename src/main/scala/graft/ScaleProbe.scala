package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf-dir inputs `K`× with disjoint keys and
  * time the heavy pipelines, looking for super-linear cliffs the
  * per-round bench (fixed SF) cannot see. Emits one JSON line per
  * probe. Usage: runMain graft.ScaleProbe [sfDir] [K]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replicate with disjoint ids: copy c shifts every key by c * 10^9
    def rep(df: DataFrame, idCols: Seq[String]): DataFrame = {
      val copies = spark.range(k).select(col("id").as("__copy"))
      idCols.foldLeft(df.crossJoin(copies))((d, c) =>
        d.withColumn(c, col(c) + col("__copy") * 1000000000L))
        .drop("__copy")
    }

    val docs = rep(Tables.documents(spark, sfDir), Seq("doc_id"))
      .localCheckpoint()
    val emb = rep(Tables.embeddings(spark, sfDir), Seq("vec_id"))
      .localCheckpoint()
    val events = rep(Tables.events(spark, sfDir), Seq("event_id", "user_id"))
      .localCheckpoint()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","k":$k,"sec":$sec%.2f}""")
    }

    time("minhash_lsh")(llm.Dedup.minhashLsh(docs, "text", "doc_id"))
    time("simhash_pairs")(llm.Dedup.simhashPairs(
      llm.Dedup.simhash(docs, "text", "doc_id", k = 2), "doc_id",
      maxHamming = 7, bands = 8))
    time("jaccard_pairs")(llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 5, maxDf = 5, minJaccard = 0.5))
    // measures the connected-components increment (the pair set above
    // is session-memoized, exactly as in a real engine run)
    time("dedup_clusters")(llm.Dedup.duplicateClusters(
      llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        k = 5, maxDf = 5, minJaccard = 0.5).select(col("a"), col("b"))))
    // Near-dup at a *realistic* dedup threshold (0.8): the banding must
    // match the threshold — 8 planes/band ⇒ 256 buckets/band of real
    // pruning. The registry's 0.45-threshold variant needs 2-plane
    // bands for recall, whose 4 buckets/band cannot prune: correct at
    // oracle scale, quadratic beyond ~10k rows. That cliff is inherent
    // to hyperplane LSH near orthogonality, not a plan defect — don't
    // probe it, document it (Similarity.nearDupPairs scaladoc).
    time("neardup_banded_t0.8")(llm.Similarity.nearDupPairs(emb, "vec_id",
      "embedding", threshold = 0.8, bands = 32, rowsPerBand = 8))
    time("ann_topk")(llm.Similarity.annTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
      numPlanes = 4))
    time("ivf_topk")(llm.Similarity.ivfTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
      nLists = 8, nProbe = 2))
    time("quantize_int8")(llm.Similarity.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("scale"), col("q")))
    time("quantized_topk")(llm.Similarity.quantizedTopK(emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5))
    locally {
      val t0 = System.nanoTime()
      llm.Similarity.trainIvfCentroids(emb, "embedding", nLists = 8, iters = 2)
      println(f"""{"probe":"ivf_train_2it","k":$k,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }
    // decontamination: the benchmark side stays fixed-size while the
    // corpus replicates — the realistic shape (eval suites don't grow
    // with the corpus), so the probe shows the broadcast-join scan scale
    time("decontaminate")(llm.Dedup.decontaminate(docs,
      Tables.documents(spark, sfDir).filter(pmod(col("doc_id"), lit(20)) === 0),
      "text", "doc_id", k = 8))
    time("repetition_signals")(llm.TextAnalysis.repetitionSignals(
      docs, "text", "doc_id", k = 2))
    time("sessionize")(llm.Sessionize.sessions(events, "user_id", "ts_us",
      order = Seq(col("ts_us"), col("event_id")),
      gapMicros = 1800000000L, valueCol = "value"))
    time("resample_15m")(ops.Ops.resample(
      events.withColumn("bucket_s", ops.Ops.bucketUs(col("ts_us"), 900L)),
      col("bucket_s"), Seq.empty,
      Seq(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("v_c"))))

    spark.stop()
  }
}
