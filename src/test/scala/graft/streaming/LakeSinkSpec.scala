package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** `writeStream.format("lake")` — the pure-SQL streaming sink: every
  * micro-batch is one manifest transaction, appends are exactly-once
  * across crash replay (the `#txn` commit header + progress marker),
  * and upsert mode applies keyed CDC batches through the same
  * retrying upsert the Scala stream uses. */
class LakeSinkSpec extends SparkSpec {

  import spark.implicits._

  private def toNfp(df: org.apache.spark.sql.DataFrame) = df.select(
    lit("ethereum").as("chain_name"),
    lit("IncreaseLiquidity").as("name"),
    concat(lit("0xtx"), lpad(col("value").cast("string"), 5, "0"))
      .as("transaction_hash"),
    (lit(1000L) + col("value")).as("block_number"),
    lit(0L).as("tx_index"), lit("0xu1").as("from_address"),
    col("value").cast("string").as("amount"),
    (col("value") * 10).cast("string").as("amount0"),
    (col("value") * 100).cast("string").as("amount1"),
    col("value").cast("string").as("tokenId"),
    pmod(col("value"), lit(7)).as("log_index"))

  test("append mode: micro-batches land as manifest transactions; restart appends only new data") {
    val root = Files.createTempDirectory("lake-sink").toString
    val ck = Files.createTempDirectory("lake-sink-ck").toString
    val lake = new Lake(spark, root)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(0L until 10L: _*)
    def run(): Unit = {
      val q = toNfp(mem.toDF().withColumnRenamed("value", "value"))
        .writeStream.format("lake")
        .option("root", root).option("table", Schemas.Nfp)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(lake.read(Schemas.Nfp).count() == 10L)
    // nothing new: a re-run must not duplicate
    run()
    assert(lake.read(Schemas.Nfp).count() == 10L)
    mem.addData(10L until 15L: _*)
    run()
    assert(lake.read(Schemas.Nfp).count() == 15L)
    // the commits carry the op + txn headers and are manifest-served
    val hist = lake.commitHistory(Schemas.Nfp)
    assert(hist.count(_._3 == "append") >= 2, hist.toString)
    assert(lake.listCalls.get() == 0L)
  }

  test("crash replay is exactly-once: a replayed batchId is skipped even without the progress marker") {
    val root = Files.createTempDirectory("lake-sink2").toString
    val lake = new Lake(spark, root)
    val sink = new LakeSink(spark, root, Schemas.Nfp, "append",
      Seq.empty, Seq.empty, None, retain = false, appId = "app-A")
    def batch(ids: Seq[Long]) =
      toNfp(ids.toDF("value"))
    sink.addBatch(0L, batch(0L until 8L))
    assert(lake.read(Schemas.Nfp).count() == 8L)
    // the engine replays batch 0 after a crash: skipped wholesale
    sink.addBatch(0L, batch(0L until 8L))
    assert(sink.skips.get() == 1L)
    assert(lake.read(Schemas.Nfp).count() == 8L, "replayed append doubled")
    // HARD crash window: the progress marker never landed - the #txn
    // commit header (atomic with the publish) must still dedupe.
    // Simulate by deleting the marker dir outright.
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_streamtxn/${Schemas.Nfp}"), true)
    assert(lake.lastSinkBatch(Schemas.Nfp, "app-A") == 0L,
      "the commit header alone must carry the high-water")
    sink.addBatch(0L, batch(0L until 8L))
    assert(lake.read(Schemas.Nfp).count() == 8L,
      "marker-less replay double-applied")
    // a second INDEPENDENT sink identity is not blocked
    val sinkB = new LakeSink(spark, root, Schemas.Nfp, "append",
      Seq.empty, Seq.empty, None, retain = false, appId = "app-B")
    sinkB.addBatch(0L, batch(100L until 104L))
    assert(lake.read(Schemas.Nfp).count() == 12L)
  }

  test("upsert mode crash replay: the #txn header lands atomically with the merge and dedupes without the marker") {
    val root = Files.createTempDirectory("lake-sink5").toString
    val lake = new Lake(spark, root)
    lake.append(toNfp((0L until 10L).toDF("value")).coalesce(1),
      Schemas.Nfp)
    val sink = new LakeSink(spark, root, Schemas.Nfp, "upsert",
      Seq("chain_name", "transaction_hash"), Seq.empty, None,
      retain = false, appId = "app-U")
    def batch() = toNfp((100L until 104L).toDF("value"))
    sink.addBatch(0L, batch())
    assert(lake.read(Schemas.Nfp).count() == 14L)
    val commits = lake.commitHistory(Schemas.Nfp).size
    // HARD crash window: the progress marker never landed — the
    // upsert commit's #txn header (atomic with the manifest publish)
    // must carry the high-water alone. Before the fix the upsert
    // path wrote NO header: final state was idempotent but the
    // replay landed a DUPLICATE data-changing commit whose churn CDC
    // consumers would see twice.
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_streamtxn/${Schemas.Nfp}"), true)
    assert(lake.lastSinkBatch(Schemas.Nfp, "app-U") == 0L,
      "the upsert commit header alone must carry the high-water")
    sink.addBatch(0L, batch())
    assert(sink.skips.get() == 1L, "marker-less upsert replay re-applied")
    assert(lake.commitHistory(Schemas.Nfp).size == commits,
      "marker-less upsert replay landed a duplicate data-changing commit")
    assert(lake.read(Schemas.Nfp).count() == 14L)
  }

  test("upsert mode: keyed CDC batches update/insert/delete through the manifest transaction") {
    val root = Files.createTempDirectory("lake-sink3").toString
    val ck = Files.createTempDirectory("lake-sink3-ck").toString
    val lake = new Lake(spark, root)
    lake.append(toNfp((0L until 20L).toDF("value")).coalesce(1),
      Schemas.Nfp)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Boolean)]
    // (key id, new amount, delete?) — update 3, delete 2, insert 2
    mem.addData((1L, "u1", false), (5L, "u5", false), (9L, "u9", false),
      (2L, "", true), (6L, "", true),
      (100L, "n100", false), (101L, "n101", false))
    val src = mem.toDF().toDF("value", "amt", "del")
    val shaped = src.select(
      lit("ethereum").as("chain_name"),
      lit("IncreaseLiquidity").as("name"),
      concat(lit("0xtx"), lpad(col("value").cast("string"), 5, "0"))
        .as("transaction_hash"),
      (lit(1000L) + col("value")).as("block_number"),
      lit(0L).as("tx_index"), lit("0xu1").as("from_address"),
      col("amt").as("amount"),
      (col("value") * 10).cast("string").as("amount0"),
      (col("value") * 100).cast("string").as("amount1"),
      col("value").cast("string").as("tokenId"),
      pmod(col("value"), lit(7)).as("log_index"),
      col("del").as("_del"))
    val q = shaped
      .writeStream.format("lake")
      .option("root", root).option("table", Schemas.Nfp)
      .option("mode", "upsert")
      .option("keys", "chain_name,transaction_hash")
      .option("deleteCol", "_del")
      .option("retain", "true")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = lake.read(Schemas.Nfp)
      .select(col("transaction_hash"), col("amount")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.size == 20L, s"expected 20 rows (20 - 2 + 2), got ${got.size}")
    assert(got("0xtx00001") == "u1" && got("0xtx00005") == "u5" &&
      got("0xtx00009") == "u9", got.toString)
    assert(!got.contains("0xtx00002") && !got.contains("0xtx00006"))
    assert(got("0xtx00100") == "n100" && got("0xtx00101") == "n101")
  }

  test("upsert orderBy compacts intra-batch duplicates to the latest row per key") {
    val root = Files.createTempDirectory("lake-sink4").toString
    val lake = new Lake(spark, root)
    lake.append(toNfp((0L until 5L).toDF("value")).coalesce(1), Schemas.Nfp)
    val sink = new LakeSink(spark, root, Schemas.Nfp, "upsert",
      Seq("chain_name", "transaction_hash"), orderBy = Seq("block_number"),
      deleteCol = None, retain = false, appId = "app-ord")
    // two versions of key 1 in ONE batch: block_number orders them,
    // the later (higher) one must win; without orderBy the upsert's
    // uniqueness gate would refuse this batch outright
    val dup = toNfp(Seq(1L, 2L).toDF("value"))
      .withColumn("amount", lit("old"))
      .unionByName(toNfp(Seq(1L).toDF("value"))
        .withColumn("block_number", lit(9999L))
        .withColumn("amount", lit("new")))
    sink.addBatch(0L, dup)
    val got = lake.read(Schemas.Nfp)
      .select(col("transaction_hash"), col("amount")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("0xtx00001") == "new" && got("0xtx00002") == "old",
      got.toString)
    assert(got.size == 5)
  }

  test("option validation refuses loudly") {
    val provider = new LakeSinkProvider
    def mk(opts: Map[String, String]) =
      provider.createSink(spark.sqlContext, opts, Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Append())
    intercept[IllegalArgumentException] {
      mk(Map("table" -> "t", "txnAppId" -> "a")) // no root
    }
    intercept[IllegalArgumentException] {
      // upsert without keys
      mk(Map("root" -> "/tmp/x", "table" -> "t", "mode" -> "upsert",
        "txnAppId" -> "a"))
    }
    intercept[IllegalArgumentException] {
      // no identity at all
      mk(Map("root" -> "/tmp/x", "table" -> "t"))
    }
    intercept[IllegalArgumentException] {
      mk(Map("root" -> "/tmp/x", "table" -> "t", "mode" -> "replace",
        "txnAppId" -> "a"))
    }
  }
}
