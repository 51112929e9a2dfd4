package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manifest metadata-layer probe: does the commit-log fold/checkpoint
  * path hold at table sizes the per-round specs (25-file lakes) never
  * reach? Synthesizes manifests of 10⁴/10⁵/10⁶ entries — no data
  * files; [[graft.v3.Lake.publishSynthetic]] exercises the REAL
  * lock-held publish and the REAL fold — and measures, per size:
  *
  *  - `manifest_ckpt_write`  lock-held checkpoint serialize+write
  *    (what every 16th commit pays while holding the commit lock)
  *  - `manifest_delta_write` one delta commit (what the other 15 pay)
  *  - `manifest_cold_fold`   fresh-driver fold: checkpoint read +
  *    15 delta replays + sort ([[graft.v3.Lake.fileInventory]])
  *  - `manifest_warm_fold`   the cached re-read a warm driver pays
  *  - `manifest_plan_full`   driver plan (split sizing, partition
  *    grouping) of a full-table scan over the manifest-served index
  *  - `manifest_plan_pruned` same with a one-chain partition filter
  *  - `manifest_heap_mb`     approximate driver heap held by the
  *    folded entry list (the per-table steady-state cost)
  *
  * Emits one JSON line per (probe, n). Usage:
  * runMain graft.ManifestProbe [n,n,…] (default 10000,100000,1000000)
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 100000, 1000000))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def emit(probe: String, n: Int, sec: Double): Unit =
      println(f"""{"probe":"$probe","n":$n,"sec":$sec%.3f}""")

    val table = graft.v3.Schemas.Nfp
    ns.foreach { n =>
      val root = java.nio.file.Files
        .createTempDirectory(s"manifest-probe-$n").toString
      val lake = new graft.v3.Lake(spark, root)
      // entry shape mirrors a real fleet table: 16 chains, realistic
      // rel-path lengths, ~128 MB files
      def entry(i: Int): (String, Long) =
        (s"chain_name=c${i % 16}/part-17458$i-0000$i.parquet", 128L << 20)
      var current = (0 until n).map(entry)

      // 1. lock-held checkpoint write (the every-16th-commit cost)
      val (_, ckptSec) = timed(lake.publishSynthetic(table, current))
      emit("manifest_ckpt_write", n, ckptSec)

      // 2. 15 delta commits (+2 files, −1): the steady-state cost
      var deltaTotal = 0.0
      (1 to 15).foreach { d =>
        val added = Seq(entry(n + 2 * d - 1), entry(n + 2 * d))
        val removed = Set(current.head._1)
        val next = current.tail ++ added
        val (_, s) =
          timed(lake.publishSynthetic(table, next, Some((added, removed))))
        deltaTotal += s
        current = next
      }
      emit("manifest_delta_write", n, deltaTotal / 15.0)

      // 3. cold fold: a fresh driver pays checkpoint + 15 deltas once
      val coldLake = new graft.v3.Lake(spark, root)
      val (inv, coldSec) = timed(coldLake.fileInventory(table))
      require(inv.size == n + 15, s"fold diverged: ${inv.size}")
      emit("manifest_cold_fold", n, coldSec)
      // 4. warm fold (cached)
      val (_, warmSec) = timed(coldLake.fileInventory(table))
      emit("manifest_warm_fold", n, warmSec)

      // 5. plan a full scan and a pruned scan: .rdd forces split
      // planning + partition grouping WITHOUT launching a job, so the
      // nonexistent data files are never opened
      val (_, planFull) =
        timed(coldLake.read(table).rdd.getNumPartitions)
      emit("manifest_plan_full", n, planFull)
      // warm: the relation cache serves the SAME immutable plan —
      // a repeated read pays Spark's split planning, not index
      // reconstruction
      val (_, planWarm) =
        timed(coldLake.read(table).rdd.getNumPartitions)
      emit("manifest_plan_warm", n, planWarm)
      val (_, planPruned) = timed(coldLake.read(table)
        .filter(col("chain_name") === "c3").rdd.getNumPartitions)
      emit("manifest_plan_pruned", n, planPruned)

      // 5b. the DSv2 catalog path at the same sizes: a pure-SQL pruned
      // plan pays loadTable (manifest-served currentEntries) + the
      // ManifestPartitioningIndex build (synthetic FileStatus map,
      // group-by-parent, PartitionSpec over the leaf dirs) + Spark's
      // own DSv2 pushdown/split planning. Cold = first SQL plan on a
      // fresh catalog; warm = the repeat (inventory caches hot; the
      // index itself is rebuilt per loadTable — the number that says
      // whether THAT needs a cache too)
      val cat = s"mprobe_${n}_${System.nanoTime()}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.LakeCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      def dsv2Pruned(): Int = spark.sql(
        s"SELECT * FROM $cat.$table WHERE chain_name = 'c3'")
        .rdd.getNumPartitions
      val (_, dsv2Cold) = timed(dsv2Pruned())
      emit("dsv2_plan_pruned_cold", n, dsv2Cold)
      val (_, dsv2Warm) = timed(dsv2Pruned())
      emit("dsv2_plan_pruned_warm", n, dsv2Warm)

      // 6. retained heap of the folded per-table state: measure used
      // memory with a fresh fold HELD, then again after dropping the
      // reference — the difference is what one warm table costs a
      // long-lived driver
      val rt = Runtime.getRuntime
      var heldLake = new graft.v3.Lake(spark, root)
      var held = heldLake.fileInventory(table)
      require(held.size == n + 15)
      System.gc(); Thread.sleep(300L)
      val withHeld = rt.totalMemory() - rt.freeMemory()
      held = null; heldLake = null
      System.gc(); Thread.sleep(300L)
      val without = rt.totalMemory() - rt.freeMemory()
      println(f"""{"probe":"manifest_heap_mb","n":$n,""" +
        f""""mb":${math.max(0L, withHeld - without) / 1e6}%.1f}""")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
