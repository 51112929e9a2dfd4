package graft.plans

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** The manifest-served [[ManifestFileIndex]] beyond the lake's 1-column
  * default: n-column hive layouts (`chain_name=…/dt=…`) plan, prune and
  * type-cast from metadata alone, and a path that cannot serve the
  * declared partition columns fails LOUDLY instead of planning wrong
  * partition values. */
class ManifestFileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def listEntries(dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        out += ((f.getPath.toString, f.getLen))
    }
    out.result()
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in plan"))

  private lazy val twoColDir: String = {
    val dir = Files.createTempDirectory("mfi-2col").toString
    (for (c <- Seq("ethereum", "base"); d <- 1 to 3; i <- 1 to 10) yield
      (c, d, i.toLong, s"v$c-$d-$i"))
      .toDF("chain_name", "day", "seq", "payload")
      .write.mode("overwrite").partitionBy("chain_name", "day").parquet(dir)
    dir
  }

  private val twoColSchema = StructType(Seq(
    StructField("chain_name", StringType),
    StructField("day", IntegerType),
    StructField("seq", LongType),
    StructField("payload", StringType)))

  test("a two-column hive layout plans from the manifest and prunes on BOTH columns") {
    val df = ManifestFileIndex.relation(spark, new Path(twoColDir),
      listEntries(twoColDir), twoColSchema, Seq("chain_name", "day"))
    // full read: all rows, partition values decoded and typed
    assert(df.count() == 60L)
    assert(df.schema("day").dataType == IntegerType)
    val q = df.filter(col("chain_name") === "ethereum" && col("day") === 2)
    assert(q.count() == 10L)
    // pruning happened at the INDEX, on both dimensions
    val scan = scanOf(q.select(col("seq")))
    val kept = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    assert(kept.nonEmpty && kept.forall(p =>
      p.contains("chain_name=ethereum") && p.contains("day=2")),
      kept.mkString(", "))
    // a one-column filter prunes that dimension only
    val scanC = scanOf(df.filter(col("day") === 3).select(col("seq")))
    val keptC = scanC.relation.location
      .listFiles(scanC.partitionFilters, scanC.dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    assert(keptC.nonEmpty && keptC.forall(_.contains("day=3")))
    assert(keptC.exists(_.contains("chain_name=ethereum")) &&
      keptC.exists(_.contains("chain_name=base")))
  }

  test("non-string partition values cast through Spark's cast; nulls decode") {
    val dir = Files.createTempDirectory("mfi-cast").toString
    Seq(("2024-03-01", 1L), ("2024-03-02", 2L), (null: String, 3L))
      .toDF("dt", "v")
      .withColumn("dt", col("dt").cast(DateType))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val schema = StructType(Seq(StructField("dt", DateType),
      StructField("v", LongType)))
    val df = ManifestFileIndex.relation(spark, new Path(dir),
      listEntries(dir), schema, Seq("dt"))
    assert(df.schema("dt").dataType == DateType)
    assert(df.filter(col("dt") === lit("2024-03-02").cast(DateType))
      .select("v").as[Long].collect().toSeq == Seq(2L))
    assert(df.filter(col("dt").isNull)
      .select("v").as[Long].collect().toSeq == Seq(3L))
  }

  test("timestamp partition values decode in the SESSION timezone, matching Spark's reader") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val dir = Files.createTempDirectory("mfi-tz").toString
      Seq(("2024-03-01 10:30:00", 1L), ("2024-03-02 22:15:00", 2L))
        .toDF("ts", "v")
        .withColumn("ts", col("ts").cast(TimestampType))
        .write.mode("overwrite").partitionBy("ts").parquet(dir)
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("v", LongType)))
      val viaManifest = ManifestFileIndex.relation(spark, new Path(dir),
        listEntries(dir), schema, Seq("ts"))
        .select("ts", "v").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
        .sortBy(_._2).toSeq
      val viaSpark = spark.read.schema(schema).parquet(dir)
        .select("ts", "v").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
        .sortBy(_._2).toSeq
      assert(viaManifest == viaSpark,
        s"manifest-served timestamps diverged from Spark's reader under " +
          s"a non-UTC session zone:\n  manifest=$viaManifest\n  " +
          s"spark=$viaSpark")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("a layout missing a declared partition column is refused loudly") {
    // files live under chain_name= only, but the caller declares
    // (chain_name, day) — planning would otherwise serve wrong values
    val dir = Files.createTempDirectory("mfi-miss").toString
    Seq(("ethereum", 1L)).toDF("chain_name", "v")
      .write.mode("overwrite").partitionBy("chain_name").parquet(dir)
    val schema = StructType(Seq(StructField("chain_name", StringType),
      StructField("day", IntegerType), StructField("v", LongType)))
    val e = intercept[IllegalStateException] {
      ManifestFileIndex.relation(spark, new Path(dir),
        listEntries(dir), schema, Seq("chain_name", "day"))
    }
    assert(e.getMessage.contains("no 'day='"), e.getMessage)
  }

  test("a partition column absent from the schema is refused at relation()") {
    val e = intercept[IllegalArgumentException] {
      ManifestFileIndex.relation(spark, new Path(twoColDir),
        listEntries(twoColDir), twoColSchema, Seq("chain_name", "nope"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }
}
