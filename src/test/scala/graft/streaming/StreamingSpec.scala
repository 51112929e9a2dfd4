package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Streaming semantics vs their batch equivalents on the same data. */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming resample over file drops matches the batch aggregate") {
    val batch = Tables.events(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val srcDir = Files.createTempDirectory("stream-src").toString
    batch.write.mode("overwrite").parquet(srcDir)

    val stream = Streaming.fileStream(spark, srcDir,
      batch.schema, maxFilesPerTrigger = 2)
    val agg = Streaming.resample(stream, "ts", "15 minutes", "1 hour",
      aggs = Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v")))

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("resampled").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("resampled")
      .select(col("bucket.start").as("b"), col("n"), col("v"))
      .orderBy(col("b")).collect()
    val want = batch
      .groupBy(window(col("ts"), "15 minutes").getField("start").as("b"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy(col("b")).collect()
    assert(got.length == want.length && got.sameElements(want))
  }

  test("nb count partials: tranche sums equal single-pass; a replayed partial corrupts") {
    import graft.llm.{Dedup, TextAnalysis}
    val docs = Dedup.withPlantedBoilerplate(
      Tables.documents(spark, dir), "text", "doc_id")
    val label = when(pmod(col("doc_id"), lit(3)) === 0, 1L).otherwise(-1L)
    def counts(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.nbPartialCounts(df, "text", "doc_id", label, 128)
    val whole = counts(docs)
    val tranches = (0 to 2).map(i =>
      counts(docs.filter(pmod(col("doc_id"), lit(3)) === i)))
    val merged = tranches.reduce(_ unionByName _)
      .groupBy("bucket")
      .agg(sum("cnt_pos").as("cnt_pos"), sum("cnt_neg").as("cnt_neg"))
    assert(graft.ops.Ops.frameDiff(
      whole.select("bucket", "cnt_pos", "cnt_neg"), merged).isEmpty)
    // replaying one tranche double-counts: the merged model must move
    val dup = (tranches :+ tranches.head).reduce(_ unionByName _)
    val cleanModel = TextAnalysis.nbModelFromCounts(
      tranches.reduce(_ unionByName _), spark, 128)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val dupModel = TextAnalysis.nbModelFromCounts(dup, spark, 128)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(cleanModel != dupModel,
      "a replayed partial must change the model (sum-merge dichotomy)")
  }

  test("stream-stream interval join matches the batch bucketized join, out-of-order batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1600000000000000L
    val win = 300000000L // 5 min
    // intervals at 0, 10, 47 min; points scattered inside and outside
    val ivs = Seq((100L, base), (101L, base + 600000000L),
      (102L, base + 2820000000L))
    val pts = Seq((1L, base + 1L), (2L, base + 299999999L),
      (3L, base + 300000000L),            // boundary: excluded
      (4L, base + 700000000L), (5L, base + 2820000000L),
      (6L, base + 5000000000L))           // matches nothing

    val pMem = MemoryStream[(Long, Long)]
    val iMem = MemoryStream[(Long, Long)]
    val pS = pMem.toDF().toDF("click_id", "p_us")
      .withColumn("p_ts", timestamp_micros(col("p_us")))
    val iS = iMem.toDF().toDF("incident_id", "i_us")
      .withColumn("i_ts", timestamp_micros(col("i_us")))
    val joined = Streaming.intervalJoinStream(pS, iS, "p_ts", "i_ts",
      lengthUs = win, lateness = "2 hours")
    val q = joined.select("incident_id", "click_id").writeStream
      .outputMode("append").format("memory").queryName("stream_ij").start()
    try {
      // worst-case order: late interval arrives after its points
      pMem.addData(pts.take(4): _*)
      q.processAllAvailable()
      iMem.addData(ivs(1), ivs(2))
      q.processAllAvailable()
      pMem.addData(pts.drop(4): _*)
      iMem.addData(ivs(0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_ij")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.ops.Ops.intervalJoin(
        pts.toDF("click_id", "p_us"),
        ivs.toDF("incident_id", "lo")
          .withColumn("hi", col("lo") + win),
        "p_us", "lo", "hi", bucketWidth = win)
      .collect().map(r => (r.getAs[Long]("incident_id"),
        r.getAs[Long]("click_id"))).toSet
    assert(want.nonEmpty && got == want, s"got $got want $want")
  }

  test("streaming sessionize matches the batch rollup once watermark closes sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1600000000000000L // epoch µs
    val gap = 60000000L          // 60 s
    val evs = Seq(
      (1L, base, 10.005), (1L, base + 30000000L, 1.0), // user 1, session 1
      (1L, base + 200000000L, 2.0),                    // user 1, session 2
      (2L, base + 10000000L, 5.0), (2L, base + 65000000L, 0.5)) // user 2, s1

    val mem = MemoryStream[(Long, Long, Double)]
    val ds = mem.toDF().toDF("userId", "tsUs", "value")
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds")
      .as[Streaming.SessionEvent]
    val q = Streaming.sessionize(ds, gap).writeStream
      .outputMode("append").format("memory").queryName("stream_sessions").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // a far-future event pushes the watermark past every gap horizon
      mem.addData((99L, base + 10000000000L, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_sessions")
      .filter(col("user_id") =!= 99) // its own session never closes
      .select("user_id", "session_id", "session_start_us", "n_events", "sum_value_c")
      .orderBy("user_id", "session_id").collect().map(_.toSeq)
    val want = graft.llm.Sessionize.sessions(
        evs.toDF("user_id", "ts_us", "value"), "user_id", "ts_us",
        order = Seq(col("ts_us")), gapMicros = gap, valueCol = "value")
      .orderBy("user_id", "session_id").collect().map(_.toSeq)
    assert(got.length == 3 && got.sameElements(want),
      s"got ${got.mkString(";")} want ${want.mkString(";")}")
  }

  test("sessionize state: numbering continues across a timeout, then expires") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1600000000000000L // epoch µs
    val s = 1000000L             // 1 second in µs
    val gap = 60 * s
    // retention = 3 gaps = 180 s: a user dormant longer is forgotten
    val mem = MemoryStream[(Long, Long, Double)]
    val ds = mem.toDF().toDF("userId", "tsUs", "value")
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "0 seconds")
      .as[Streaming.SessionEvent]
    val q = Streaming.sessionize(ds, gap, retentionGaps = 3).writeStream
      .outputMode("append").format("memory").queryName("session_retention").start()
    try {
      def step(evs: (Long, Long, Double)*): Unit = {
        mem.addData(evs: _*); q.processAllAvailable()
      }
      step((1L, base, 1.0))                 // open session 1
      step((99L, base + 120 * s, 0.0))      // watermark past gap → close s1
      step((1L, base + 130 * s, 2.0))       // back WITHIN retention
      step((99L, base + 200 * s, 0.0))      // close s2 — numbering must continue
      step((99L, base + 400 * s, 0.0))      // dormant past retention → forget user 1
      step((1L, base + 420 * s, 3.0))       // back AFTER retention
      step((99L, base + 600 * s, 0.0))      // close the post-expiry session
    } finally q.stop()

    val got = spark.table("session_retention")
      .filter(col("user_id") === 1)
      .select("session_id", "session_start_us")
      .orderBy("session_start_us").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      (1L, base),            // first session
      (2L, base + 130 * s),  // sentinel alive → numbering continued
      (1L, base + 420 * s)), // sentinel expired → numbering restarted
      s"got ${got.mkString(";")}")
  }

  test("streaming dedup drops in-watermark duplicates, keeps one per key") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1600000000000000L
    val mem = MemoryStream[(Long, String)]
    val ds = mem.toDF().toDF("ts_us", "text")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("key", sha2(col("text"), 256))
    val q = Streaming.dedupStream(ds, "ts", "10 minutes", Seq("key"))
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      mem.addData((base, "a"), (base + 1L, "a"), (base + 2L, "b"))
      q.processAllAvailable()
      mem.addData((base + 3L, "a"), (base + 4L, "c")) // "a" still in state
      q.processAllAvailable()
    } finally q.stop()
    val texts = spark.table("deduped").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("a", "b", "c"), texts.toString)
  }

  test("streaming dedup index: incremental pairs across batches equal the full recompute") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("dedup-idx-src").toString
    val base = Files.createTempDirectory("dedup-idx").toString
    val (indexDir, pairsDir, ckDir) =
      (s"$base/index", s"$base/pairs", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, docs.schema)
      // compactEvery = 2: the second batch compacts BOTH sinks, so the
      // assertions below also prove pairs/index read-equivalence
      // across an in-stream compaction
      val q = Streaming.dedupIndexStream(src, "text", "doc_id",
        indexDir, pairsDir, ckDir, compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // batch 0: 80% of the corpus; batch 1: the rest
    docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val got = spark.read.parquet(pairsDir).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.llm.Dedup.minhashLsh(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty,
      s"streaming ${got.size} pairs vs batch ${want.size}")
    // the index now holds one signature row per (long-enough) document
    val nSigs = spark.read.parquet(indexDir).count()
    val nDocs = graft.llm.Dedup.minhashSignatures(
      graft.llm.Dedup.wordShingles(docs, "text", "doc_id", 5),
      "doc_id", 8).count()
    assert(nSigs == nDocs)
  }

  test("sketchStream: merged partials equal the batch sketch; replay and compaction are harmless") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("sketch-src").toString
    val base = Files.createTempDirectory("sketch").toString

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, docs.schema,
        maxFilesPerTrigger = 1)
      // compactEvery = 2 also exercises in-stream register compaction
      val q = Streaming.sketchStream(src, "text", "lang", "doc_id",
        s"$base/regs", s"$base/ck", compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // worst-case split: three interleaved tranches, two stream runs
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val want = graft.llm.TextAnalysis.distinctTokenSketch(
      docs, "text", "lang", "doc_id").collect().toSet
    val regs = spark.read.parquet(s"$base/regs")
    val got = graft.llm.TextAnalysis.sketchFromRegisters(
      regs.drop("batch_id"), "lang").collect().toSet
    assert(got == want && want.nonEmpty)
    // idempotence under replayed partials: duplicating any batch's
    // rows cannot move a max-merge — the exactly-once guarantee
    // degrades gracefully even if a sink partition were duplicated
    val replayed = regs.drop("batch_id")
      .union(regs.drop("batch_id").limit(200))
    val got2 = graft.llm.TextAnalysis.sketchFromRegisters(replayed, "lang")
      .collect().toSet
    assert(got2 == want)
  }

  test("cmsStream: sum-merged partials equal the batch sketch; replay is NOT harmless") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("cms-src").toString
    val base = Files.createTempDirectory("cms").toString

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, docs.schema,
        maxFilesPerTrigger = 1)
      // compactEvery = 2 also exercises in-stream register compaction
      // (row-preserving, so the SUM is unaffected)
      val q = Streaming.cmsStream(src, "text", s"$base/regs",
        s"$base/ck", width = 256, compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // worst-case split: three interleaved tranches, two stream runs
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val want = graft.llm.TextAnalysis.cmsTokenEstimates(
      docs, "text", width = 256, k = 25).collect().toSeq
    val regs = spark.read.parquet(s"$base/regs")
    val got = graft.llm.TextAnalysis.cmsFromRegisters(
      regs.drop("batch_id"), docs, "text", width = 256, k = 25)
      .collect().toSeq
    assert(got == want && want.nonEmpty)
    // counts are ADDITIVE: a duplicated partial MUST move the
    // estimates — exactly-once at the sink is load-bearing for CMS
    // where the HLL's max-merge would shrug a replay off
    val replayed = regs.drop("batch_id").union(regs.drop("batch_id"))
    val got2 = graft.llm.TextAnalysis.cmsFromRegisters(
      replayed, docs, "text", width = 256, k = 25).collect().toSeq
    assert(got2 != want, "a doubled partial should double the counts")
    assert(got2.map(r => (r.getString(0), r.getLong(1))) ==
      want.map(r => (r.getString(0), r.getLong(1))))
    got2.zip(want).foreach { case (d, w) =>
      assert(d.getLong(2) == 2 * w.getLong(2),
        s"${w.getString(0)}: doubled partial gave ${d.getLong(2)}, want 2x${w.getLong(2)}")
    }
  }

  test("bm25IndexStream: accumulated index scores exactly like the batch row; replay is NOT harmless") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("bm25-src").toString
    val base = Files.createTempDirectory("bm25").toString

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, docs.schema,
        maxFilesPerTrigger = 1)
      // compactEvery = 2: compaction is row-preserving, so the derived
      // statistics (df, dl, N, total) are unaffected
      val q = Streaming.bm25IndexStream(src, "text", "doc_id",
        s"$base/index", s"$base/ck", compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // interleaved tranches across two stream runs (resume exercised)
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val qs = graft.llm.Dedup.tokenize(
        docs.filter(col("doc_id") % 100 === 0), "text", "doc_id")
      .select(col("doc_id").as("query_id"), explode(col("toks")).as("term"))
    val want = graft.llm.TextAnalysis.bm25TopK(docs, "text", "doc_id",
        qs, k = 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val tf = spark.read.parquet(s"$base/index")
    val got = graft.llm.TextAnalysis.bm25FromIndex(tf.drop("batch_id"),
        "doc_id", qs, k = 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(got == want && want.nonEmpty)
    // the statistics are ADDITIVE: a duplicated batch partition would
    // double df/N/total and change every score — exactly-once at the
    // sink is load-bearing, as for the CMS
    val doubled = tf.drop("batch_id").union(tf.drop("batch_id"))
    val got2 = graft.llm.TextAnalysis.bm25FromIndex(doubled, "doc_id",
        qs, k = 10)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(got2 != want, "a duplicated partition should change scores")
  }

  test("cdcIndexStream: streamed chunk index probes exactly like the batch index; replay IS harmless") {
    val docs = Tables.documents(spark, dir)
    val srcDir = Files.createTempDirectory("cdc-src").toString
    val base = Files.createTempDirectory("cdc").toString

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, docs.schema,
        maxFilesPerTrigger = 1)
      val q = Streaming.cdcIndexStream(src, "text", "doc_id",
        s"$base/index", s"$base/ck", compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // interleaved tranches across two stream runs (resume exercised)
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    // the re-crawl batch: shifted copies that only the chunk probe
    // can attribute to their originals
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + lit(4000000L)).as("doc_id"),
        concat(lit(graft.llm.Chunking.ShiftPrefix + " "), col("text"))
          .as("text"))
    def probe(index: org.apache.spark.sql.DataFrame) =
      graft.llm.Chunking.cdcIncremental(batch, index, "text", "doc_id",
          k = 4, modulus = 8, minSharedBp = 5000L)
        .orderBy(col("doc_id")).collect().toSeq
    val want = probe(graft.llm.Chunking.contentDefinedChunks(
      docs, "text", "doc_id", k = 4, modulus = 8))
    val streamed = spark.read.parquet(s"$base/index")
    val got = probe(streamed.drop("batch_id", "src_batch"))
    assert(got == want && want.nonEmpty)
    // membership is idempotent: a duplicated partition does NOT move
    // the probe (the index distincts to (corpus_id, digest)) — the
    // opposite pole from the SUM-merged bm25/CMS sinks
    val doubled = streamed.drop("batch_id", "src_batch")
      .union(streamed.drop("batch_id", "src_batch"))
    assert(probe(doubled) == want, "replayed partition must be harmless")
  }

  test("readAsOfBatch: point-in-time reads survive compaction; identical cross-batch partials both count") {
    val docs = Tables.documents(spark, dir)
    // t1 duplicates t0's TEXTS under new ids: their CMS partials are
    // byte-identical rows — the case compaction's dropDuplicates would
    // silently halve without the src_batch provenance column
    val t0 = docs.filter(col("doc_id") < 60)
    val t1 = t0.select((col("doc_id") + 10000).as("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    val t2 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 120)
    val t3 = docs.filter(col("doc_id") >= 120 && col("doc_id") < 180)
    val srcDir = Files.createTempDirectory("asof-src").toString
    val base = Files.createTempDirectory("asof").toString
    val stamped = scala.collection.mutable.Set.empty[String]
    Seq(t0, t1, t2, t3).zipWithIndex.foreach { case (t, i) =>
      t.coalesce(1).write.mode("append").parquet(srcDir)
      new java.io.File(srcDir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".") && !stamped.contains(f.getName))
        .foreach { f =>
          f.setLastModified(1600000000000L + i * 60000L)
          stamped += f.getName
        }
    }
    val src = Streaming.fileStream(spark, srcDir, docs.schema,
      maxFilesPerTrigger = 1)
    // compactEvery=2: batch 0's partition folds after batch 1, and the
    // generation re-folds with batches 1-2 after batch 3 — so the
    // identical t0/t1 partials end up in ONE generation partition
    val q = Streaming.cmsStream(src, "text", s"$base/regs", s"$base/ck",
      width = 256, compactEvery = 2).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()

    def merged(regs: org.apache.spark.sql.DataFrame) =
      regs.groupBy(col("lane").cast("long").as("lane"),
          col("bucket").cast("long").as("bucket"))
        .agg(sum(col("cnt")).cast("long").as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    def batchRegs(df: org.apache.spark.sql.DataFrame) =
      merged(graft.llm.TextAnalysis.cmsRegisters(df, "text", width = 256))

    // full as-of == single-pass over everything — in particular the
    // identical t0 and t1 partials BOTH count through the fold
    assert(merged(Streaming.readAsOfBatch(spark, s"$base/regs", 3L)) ==
      batchRegs(t0.unionByName(t1).unionByName(t2).unionByName(t3)))
    // historical as-of recovers exactly the first k+1 batches' state,
    // even though those partitions no longer exist as written
    assert(merged(Streaming.readAsOfBatch(spark, s"$base/regs", 1L)) ==
      batchRegs(t0.unionByName(t1)))
    assert(merged(Streaming.readAsOfBatch(spark, s"$base/regs", 2L)) ==
      batchRegs(t0.unionByName(t1).unionByName(t2)))
    // a compaction actually happened (some generation partition exists)
    assert(new java.io.File(s"$base/regs").listFiles()
      .exists(f => f.getName.startsWith("batch_id=-")))
    // pre-src_batch dirs fail loudly, never a silent partial read
    val old = Files.createTempDirectory("asof-old").toString
    t0.limit(5).select(col("doc_id"), lit(0L).as("batch_id"))
      .write.partitionBy("batch_id").mode("overwrite").parquet(old)
    intercept[IllegalArgumentException] {
      Streaming.readAsOfBatch(spark, old, 0L)
    }
  }

  test("streaming curation across batches equals the batch pipeline") {
    val planted = graft.llm.Curation.withPlantedEverything(
      Tables.documents(spark, dir), "text", "doc_id")
    val srcDir = Files.createTempDirectory("curation-src").toString
    val base = Files.createTempDirectory("curation").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, planted.schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // arrival order = id order, so first-arrival keeper = min-id keeper:
    // bases land in batch 0, the planted +924000 copies in batch 1
    planted.filter(col("doc_id") < 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    planted.filter(col("doc_id") >= 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val got = spark.read.parquet(survDir)
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = graft.llm.Curation.pipeline(planted, "text", "doc_id")
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && want.nonEmpty,
      s"streaming ${got.size} survivors vs batch ${want.size}")
    // every copy was killed by the cross-batch index anti-join
    assert(!got.exists(_._1 >= 924000L))
  }

  test("index compaction: read-equivalent, exactly-once across interleaved batches") {
    val planted = graft.llm.Curation.withPlantedEverything(
      Tables.documents(spark, dir), "text", "doc_id")
    val srcDir = Files.createTempDirectory("compact-src").toString
    val base = Files.createTempDirectory("compact").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, planted.schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    def drop(pred: org.apache.spark.sql.Column): Unit = {
      planted.filter(pred).coalesce(1).write.mode("append").parquet(srcDir)
      runOnce()
    }
    def partDirs(d: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("batch_id=")).toSet
    }

    // three id-ordered batches, then compact, then a fourth batch
    drop(col("doc_id") < 15)
    drop(col("doc_id") >= 15 && col("doc_id") < 30)
    drop(col("doc_id") >= 30 && col("doc_id") < 924000L)

    // read-equivalence: the DATA rows are identical before and after
    // (batch_id is the partition bookkeeping compaction rewrites)
    val indexBefore = spark.read.parquet(indexDir).drop("batch_id")
      .localCheckpoint()
    val survBefore = spark.read.parquet(survDir).drop("batch_id")
      .localCheckpoint()
    assert(Streaming.compactIndex(spark, indexDir))
    assert(Streaming.compactIndex(spark, survDir))
    assert(graft.ops.Ops.frameDiff(indexBefore,
      spark.read.parquet(indexDir).drop("batch_id")).isEmpty)
    assert(graft.ops.Ops.frameDiff(survBefore,
      spark.read.parquet(survDir).drop("batch_id")).isEmpty)
    // batches 0/1 collapsed into one generation; open batch 2 untouched
    assert(partDirs(indexDir) == Set("batch_id=-1", "batch_id=2"))
    // re-running against an already-compacted dir is a no-op (one
    // generation + one open batch — nothing left to merge)
    assert(!Streaming.compactIndex(spark, indexDir))

    // the stream continues exactly-once across the compaction: the
    // planted copies still dedup against the compacted index, and the
    // final corpus equals the batch pipeline's
    drop(col("doc_id") >= 924000L)
    val got = spark.read.parquet(survDir)
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = graft.llm.Curation.pipeline(planted, "text", "doc_id")
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && want.nonEmpty,
      s"streaming ${got.size} survivors vs batch ${want.size}")
    assert(!got.exists(_._1 >= 924000L))
  }

  test("in-stream auto-compaction (compactEvery) keeps the index bounded and results exact") {
    val planted = graft.llm.Curation.withPlantedEverything(
      Tables.documents(spark, dir), "text", "doc_id")
    val srcDir = Files.createTempDirectory("autocompact-src").toString
    val base = Files.createTempDirectory("autocompact").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, planted.schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir, compactEvery = 2).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    def drop(pred: org.apache.spark.sql.Column): Unit = {
      planted.filter(pred).coalesce(1).write.mode("append").parquet(srcDir)
      runOnce()
    }
    // 4 id-ordered batches; compaction fires inside batches 1 and 3
    drop(col("doc_id") < 15)
    drop(col("doc_id") >= 15 && col("doc_id") < 30)
    drop(col("doc_id") >= 30 && col("doc_id") < 924000L)
    drop(col("doc_id") >= 924000L)

    // the index dir never accumulates one partition per batch: after 4
    // batches it holds at most a generation or two plus the open batch
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).toSeq
    assert(dirs.size <= 3, s"index partitions not bounded: $dirs")

    // and the curated corpus still equals the batch pipeline's
    val got = spark.read.parquet(survDir)
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = graft.llm.Curation.pipeline(planted, "text", "doc_id")
      .select(col("doc_id"), col("clean_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("reconcile re-keys streamed survivors to the batch keeper under any arrival order") {
    val planted = graft.llm.Curation.withPlantedEverything(
      Tables.documents(spark, dir), "text", "doc_id")
    val srcDir = Files.createTempDirectory("reconcile-src").toString
    val base = Files.createTempDirectory("reconcile").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, planted.schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // WORST-CASE arrival order: the planted +924000 copies arrive
    // BEFORE their bases, so first-arrival keeps the copy
    planted.filter(col("doc_id") >= 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    planted.filter(col("doc_id") < 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val batchKeepers = graft.llm.Curation.pipeline(planted, "text", "doc_id")
      .select(col("doc_id"), col("clean_md5"))
    // the raw streamed survivors DIFFER from the batch pipeline here
    // (copies arrived first and were kept) — the documented contract
    val raw = spark.read.parquet(survDir).select(col("doc_id"), col("clean_md5"))
    assert(raw.filter(col("doc_id") >= 924000L).count() > 0)

    // reconcile recovers the batch keeper exactly...
    val reconciled = graft.llm.Curation.reconcile(
      spark, survDir, indexDir, "doc_id")
    assert(graft.ops.Ops.frameDiff(reconciled, batchKeepers).isEmpty)
    // ...and composed with the epoch-assembly shuffle, the streamed
    // corpus is row-equal to the batch pipeline's full output
    val assembled = graft.llm.Sampling.shuffleOrder(reconciled, col("doc_id"))
      .select(col("doc_id"), col("clean_md5"), col("order_key"),
        col("shard"), col("pos"))
    assert(graft.ops.Ops.frameDiff(assembled,
      graft.llm.Curation.pipeline(planted, "text", "doc_id")).isEmpty)

    // assembly-time survivors compaction: the result is row-identical
    // while the per-batch partitions collapse into a sealed generation
    // (plus the open last batch, which compaction never touches). Runs
    // LAST: compaction rewrites files, so pre-compaction DataFrames
    // over the sink (their listings are captured at creation) must not
    // be reused after it — the same rule any table rewrite has
    val reconCompacted = graft.llm.Curation.reconcile(
      spark, survDir, indexDir, "doc_id", compactSurvivors = true)
    assert(graft.ops.Ops.frameDiff(reconCompacted, batchKeepers).isEmpty)
    val partDirs = new java.io.File(survDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(partDirs.exists(_.startsWith("batch_id=-")),
      s"expected a sealed generation partition, got $partDirs")
  }

  test("classifier-gated stream + reconcile equals the batch classified pipeline, any order") {
    val planted = graft.llm.Curation.withPlantedEverything(
      Tables.documents(spark, dir), "text", "doc_id")
    val weights = graft.llm.TextAnalysis.standInWeights(spark, 262144)
    val srcDir = Files.createTempDirectory("clf-stream-src").toString
    val base = Files.createTempDirectory("clf-stream").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, planted.schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir,
        classifier = Some((weights, 262144))).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // worst-case arrival order again: copies before bases
    planted.filter(col("doc_id") >= 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    planted.filter(col("doc_id") < 924000L)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()

    val batch = graft.llm.Curation.pipelineClassified(planted, "text",
      "doc_id", weights, 262144)
    // classifier-rejected docs never reach the streamed index, copies
    // agree with their bases, so reconcile + assembly lands exactly on
    // the batch composition
    val assembled = graft.llm.Sampling.shuffleOrder(
        graft.llm.Curation.reconcile(spark, survDir, indexDir, "doc_id"),
        col("doc_id"))
      .select(col("doc_id"), col("clean_md5"), col("order_key"),
        col("shard"), col("pos"))
    assert(graft.ops.Ops.frameDiff(assembled, batch).isEmpty)
    // non-vacuous: the classifier actually rejected gate survivors
    assert(batch.count() <
      graft.llm.Curation.pipeline(planted, "text", "doc_id").count())
  }

  test("old-format index partitions (no id column) fail loudly, not silently") {
    import spark.implicits._
    val base = Files.createTempDirectory("oldfmt").toString
    val (survDir, indexDir) = (s"$base/surv", s"$base/index")
    // a new-format partition AND a pre-`id` partition in the same index
    // dir — the mixed-schema case where an unchecked read silently
    // nulls `id` for the old rows and reconcile's min(id) goes wrong
    Seq((5L, "aa", 1L)).toDF("doc_id", "clean_md5", "h64")
      .write.parquet(s"$indexDir/batch_id=1")
    Seq(("bb", 2L)).toDF("clean_md5", "h64")
      .write.parquet(s"$indexDir/batch_id=0")
    Seq((5L, "aa")).toDF("doc_id", "clean_md5").write.parquet(survDir)
    val e = intercept[IllegalArgumentException] {
      graft.llm.Curation.reconcile(spark, survDir, indexDir, "doc_id")
    }
    assert(e.getMessage.contains("older index format"))
    // a resumed STREAM over the same dir fails on its first batch too
    val srcDir = Files.createTempDirectory("oldfmt-src").toString
    Seq((1L, "some document text here")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = Streaming.fileStream(spark, srcDir,
      Seq((0L, "x")).toDF("doc_id", "text").schema)
    val q = Streaming.curationStream(src, "text", "doc_id",
      survDir, indexDir, s"$base/ck").start()
    val se = intercept[Exception] {
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // the cause chain carries the schema require; Spark wraps it in a
    // StreamingQueryException
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(se).exists(m => m != null && m.contains("older index format")))
  }

  test("streaming curation survives an all-dropped first batch") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("curation0-src").toString
    val base = Files.createTempDirectory("curation0").toString
    val (survDir, indexDir, ckDir) = (s"$base/surv", s"$base/index", s"$base/ck")
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, schema)
      val q = Streaming.curationStream(src, "text", "doc_id",
        survDir, indexDir, ckDir).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    // batch 0: every doc fails the gate (too short) — the index sink
    // receives only marker files; the stream must NOT wedge on batch 1
    (0L until 5L).map(i => (i, "too short")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    // zero survivors: the sink holds only marker files
    assert(!Streaming.dirHasData(spark, survDir))
    // batch 1: a real corpus; survivors land, duplicates still dedup
    val good = "alpha the bravo codes delta eagle frost gamma hotel india " +
      "juliet kilos lemon mango north oscar paper quill romeo sugar tango uncle"
    Seq((100L, good), (101L, good), (102L, good + " extra words here"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val surv = spark.read.parquet(survDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(100L, 102L)) // 101 deduped within the batch
  }

  test("compactIndex seals full generations: rewrite work stays bounded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("seal").toString
    def writeBatch(b: Long): Unit =
      (0L until 50L).map(i => (b * 1000 + i, s"v$i")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/batch_id=$b")
    def gens: Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory)
        .map(st => st.getPath.getName ->
          fs.getContentSummary(st.getPath).getLength).toMap
    }
    // batches 0..3 + open 4; a tiny size target makes the first
    // compaction produce a generation that is already "full"
    (0L to 4L).foreach(writeBatch)
    assert(Streaming.compactIndex(spark, dir, targetBytes = 1024))
    val afterFirst = gens
    assert(afterFirst.keySet == Set("batch_id=-1", "batch_id=4"))
    // more batches arrive; the sealed gen must NOT be rewritten —
    // the new generation absorbs only the new closed batches
    (5L to 7L).foreach(writeBatch)
    assert(Streaming.compactIndex(spark, dir, targetBytes = 1024))
    val afterSecond = gens
    assert(afterSecond.keySet == Set("batch_id=-1", "batch_id=-2", "batch_id=7"),
      afterSecond.keySet.toString)
    assert(afterSecond("batch_id=-1") == afterFirst("batch_id=-1"))
    // and the data survives both compactions intact
    assert(spark.read.parquet(dir).count() == 8 * 50)
  }

  test("dirHasData: sees data under a dot-prefixed ANCESTOR of the index dir") {
    import spark.implicits._
    // hidden components ABOVE the index root must not hide the index:
    // an index under e.g. /home/x/.work/ is legal, and before the
    // qualified-path fix the ancestor walk escaped the root and turned
    // the probe permanently false — silently disabling cross-batch dedup
    val parent = Files.createTempDirectory("dot-parent")
    val idx = s"$parent/.work/index"
    Seq((1L, "x")).toDF("id", "v").write.parquet(idx)
    assert(Streaming.dirHasData(spark, idx))
    // hidden components BELOW the root still hide their subtree
    val idx2 = s"$parent/.work/index2"
    Seq((1L, "x")).toDF("id", "v").write.parquet(s"$idx2/.staging")
    assert(!Streaming.dirHasData(spark, idx2))
  }

  test("lake append stream lands each dropped file exactly once") {
    val batch = Tables.events(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("shard", pmod(col("user_id"), lit(2)).cast("int"))
    val srcDir = Files.createTempDirectory("stream-lake-src").toString
    val destDir = Files.createTempDirectory("stream-lake-dest").toString
    val ckDir = Files.createTempDirectory("stream-lake-ck").toString
    batch.write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val src = Streaming.fileStream(spark, srcDir, batch.schema)
      val q = Streaming.lakeAppendStream(src, destDir, ckDir, Seq("shard")).start()
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(destDir).count()
    assert(n1 == batch.count())
    runOnce() // second AvailableNow run: checkpoint ⇒ no re-ingest
    assert(spark.read.parquet(destDir).count() == n1)
  }
}
