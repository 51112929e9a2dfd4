package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Lake compaction contracts: the plan's bin-packing invariants and
  * the rewrite's exact row preservation + file-count reduction. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(): Lake = {
    val root = Files.createTempDirectory("compact-lake").toString
    new Lake(spark, root)
  }

  private val T = Schemas.FactoryPoolCreated

  private def seed(lake: Lake, appends: Int, rowsPer: Int): Unit =
    (1 to appends).foreach { a =>
      val df = (1 to rowsPer).map { i =>
        ("mainnet", new java.sql.Timestamp(1700000000000L + a * 1000 + i),
          (a * 1000 + i).toLong, s"0xtx$a-$i", i.toLong,
          "0xt0", "0xt1", "3000", "60", s"0xpool$a-$i")
      }.toDF("chain_name", "block_timestamp", "block_number",
        "transaction_hash", "log_index", "token0", "token1", "fee",
        "tickSpacing", "pool")
      lake.append(df, T)
    }

  test("plan: covers every file once; bins fill to target; oversized files isolate") {
    val lake = freshLake()
    seed(lake, appends = 12, rowsPer = 50)
    val inv = lake.fileInventory(T)
    assert(inv.size >= 12, s"expected >= 12 part files, got ${inv.size}")
    val target = inv.map(_._3).sum / 3
    val plan = lake.compactionPlan(T, target)
    assert(plan.map(_._3).sorted == inv.map(_._2).sorted) // exhaustive
    // bins are dense 0..max and every bin except the last is full
    val byBin = plan.groupBy(_._2).toSeq.sortBy(_._1)
    assert(byBin.map(_._1) == byBin.indices)
    byBin.dropRight(1).foreach { case (b, fs) =>
      assert(fs.map(_._4).sum >= target / 2, s"bin $b underfull")
    }
    // an oversized file gets its own bin
    val small = lake.compactionPlan(T, 1L)
    assert(small.groupBy(_._2).values.forall(_.size == 1))
  }

  test("compact: rows preserved exactly, file count drops, re-compaction is a no-op") {
    val lake = freshLake()
    seed(lake, appends = 10, rowsPer = 40)
    val before = lake.read(T).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|")))
    val nFilesBefore = lake.fileInventory(T).size
    val total = lake.fileInventory(T).map(_._3).sum
    val rewritten = lake.compact(T, targetBytes = total / 2)
    assert(rewritten >= 1)
    val after = lake.read(T).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|")))
    assert(after.length == before.length && after.sameElements(before),
      "compaction must preserve rows exactly")
    val nFilesAfter = lake.fileInventory(T).size
    assert(nFilesAfter < nFilesBefore,
      s"files $nFilesBefore -> $nFilesAfter")
    // a larger target legitimately folds the compacted files once
    // more; after that every bin is a single file and compaction is a
    // fixpoint (no churn on already-compact tables)
    lake.compact(T, targetBytes = total * 10)
    assert(lake.compact(T, targetBytes = total * 10) == 0)
    val finalRows = lake.read(T).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|")))
    assert(finalRows.sameElements(before))
  }
}
