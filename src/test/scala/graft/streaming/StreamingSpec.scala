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
