package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plan-shape proof for the lake's scale contract: chain filters prune
  * PARTITIONS (directory level, never opened), block-range predicates
  * reach the parquet scan as pushed filters (row-group stats skipping),
  * and projections prune the read schema. These are the three
  * mechanisms that make a 100 TB lake readable — asserted on the
  * physical plan, not assumed. */
class LakeScanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lake: Lake = {
    val l = new Lake(spark, Files.createTempDirectory("graft-scan-lake").toString)
    val rows = for (c <- Seq("ethereum", "optimism"); b <- 1L to 50L) yield
      (c, s"0xpool$b", new java.sql.Timestamp(1620000000000L + b), 1000L + b,
        s"0xtx$c$b", b, (-100 - b).toString)
    val df = rows.toDF("chain_name", "address", "block_timestamp",
        "block_number", "transaction_hash", "log_index", "tick")
    lazy val full = Schemas.swaps.fields.map(f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name))
    l.append(df.select(full.toSeq: _*), Schemas.PoolSwapEvents)
    l
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in plan"))

  test("chain filter becomes a partition filter; block range is pushed; schema prunes") {
    val q = lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === "ethereum" &&
        col("block_number") >= 1010L && col("block_number") <= 1020L)
      .select(col("block_number"), col("tick"))
    val scan = scanOf(q)
    // chain filter prunes at the DIRECTORY level, not per row
    assert(scan.partitionFilters.exists(_.toString.contains("chain_name")),
      s"chain_name not a partition filter: ${scan.partitionFilters}")
    // block range reaches parquet as pushed data filters (stats skipping)
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(block_number") &&
      pushed.contains("LessThanOrEqual(block_number"), s"pushed: $pushed")
    // only the referenced data columns are read
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("block_number", "tick"), readCols.toString)
    // and the pruned read returns exactly the expected rows
    assert(q.count() == 11)
  }

  test("partition pruning actually skips the other chain's files") {
    val q = lake.read(Schemas.PoolSwapEvents)
      .filter(col("chain_name") === "ethereum")
      .select(col("block_number"))
    val scan = scanOf(q)
    val files = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    val paths = files.flatMap(_.files.map(_.getPath.toString))
    assert(paths.nonEmpty && paths.forall(_.contains("chain_name=ethereum")),
      paths.mkString(", "))
  }
}
