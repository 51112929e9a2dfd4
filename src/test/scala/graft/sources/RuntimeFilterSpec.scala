package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** Dynamic file pruning through Spark's DSv2 runtime-filtering seam:
  * a join whose build side carries a selective filter hands its
  * actual key values to the lake scan at execution, and whole files
  * drop via the stats sidecar's [min, max] envelopes before any task
  * schedules. Pruning is asserted by FILE COUNT through the
  * DataSkipping seam, never by timing. */
class RuntimeFilterSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%06d", 1000L + i, i % 13L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}", s"$i", i % 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def fixture(tag: String): (Lake, String, String) = {
    val root = Files.createTempDirectory(tag).toString
    val lake = new Lake(spark, root)
    val cat = tag.replaceAll("[^A-Za-z0-9]", "_")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (lake, root, cat)
  }

  private def seamOf(dir: String): (Long, Long) =
    graft.plans.DataSkipping.skipStats(dir).getOrElse((0L, 0L))

  test("a dim-filtered join prunes fact FILES at runtime via the stats envelope") {
    val (lake, root, cat) = fixture("rtf-files")
    // 4 single-file waves, block_number monotone: disjoint per-file
    // ranges on the join key
    (0 until 4).foreach(j =>
      lake.append(rows(j * 100 until (j + 1) * 100).coalesce(1),
        Schemas.Nfp))
    import spark.implicits._
    // 'hit' keys live in wave 0 ONLY; 'miss' keys cover other waves,
    // so the static dim filter is what makes pruning possible. The
    // dim must be FILE-backed: a LocalRelation dim gets its filter
    // constant-folded away (ConvertToLocalRelation) and the planner
    // no longer sees a selective build side to prune with.
    ((1005L to 1045L by 10).map((_, "hit")) ++
      (1150L to 1350L by 50).map((_, "miss")))
      .toDF("bn", "grp").write.mode("overwrite")
      .parquet(s"$root/rtf_dim")
    spark.read.parquet(s"$root/rtf_dim")
      .createOrReplaceTempView("rtf_dim")
    val dirStr = s"$root/${Schemas.Nfp}"
    val s0 = seamOf(dirStr)
    val df = spark.sql(
      s"""SELECT f.log_index, count(*) AS n
         |FROM $cat.${Schemas.Nfp} f JOIN rtf_dim d
         |  ON f.block_number = d.bn
         |WHERE d.grp = 'hit'
         |GROUP BY f.log_index""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ids 5,15,25,35,45 -> log_index = id % 7
    val exp = Seq(5, 15, 25, 35, 45).groupBy(_ % 7L)
      .map { case (k, v) => (k, v.size.toLong) }
    assert(got == exp, s"join result wrong: $got vs $exp")
    val s1 = seamOf(dirStr)
    val (cand, kept) = (s1._1 - s0._1, s1._2 - s0._2)
    // the seam records every data-filtered walk of the 4 files: the
    // static isnotnull pushdown keeps 4/4, the RUNTIME walk keeps 1/4
    // — so each runtime-pruned walk shows as a deficit of exactly 3
    val prunedWalks = (cand - kept) / 3
    assert(cand > 0 && cand % 4 == 0 && (cand - kept) % 3 == 0 &&
      prunedWalks >= 1,
      s"runtime file pruning kept $kept of $cand candidates " +
        "(expected at least one 1-of-4 runtime walk)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic-pruning filter was planted:\n$plan")
  }

  test("a stats-disabled table keeps every file but stays exact under the runtime filter") {
    val (lake, root, cat) = fixture("rtf-nostats")
    lake.createTable("nfp_ns", lake.effectiveSchema(Schemas.Nfp))
    lake.setTableProperties("nfp_ns", Map("stats.collect" -> "false"))
    (0 until 4).foreach(j =>
      lake.append(rows(j * 100 until (j + 1) * 100).coalesce(1),
        "nfp_ns"))
    import spark.implicits._
    ((1005L to 1045L by 10).map((_, "hit")) ++
      (1150L to 1350L by 50).map((_, "miss")))
      .toDF("bn", "grp").createOrReplaceTempView("rtf_dim_ns")
    val df = spark.sql(
      s"""SELECT count(*) AS n FROM $cat.nfp_ns f JOIN rtf_dim_ns d
         |  ON f.block_number = d.bn WHERE d.grp = 'hit'""".stripMargin)
    assert(df.first().getLong(0) == 5L)
  }

  test("advertised filter attributes survive column pruning (resolveRefs hazard)") {
    val (lake, root, cat) = fixture("rtf-prune")
    (0 until 2).foreach(j =>
      lake.append(rows(j * 100 until (j + 1) * 100).coalesce(1),
        Schemas.Nfp))
    import spark.implicits._
    Seq((1005L, "hit"), (1150L, "miss")).toDF("bn", "grp")
      .createOrReplaceTempView("rtf_dim_pr")
    // the fact scan reads ONLY (block_number, log_index): every other
    // stats column is pruned away — advertising one of them as a
    // filter attribute would make PartitionPruning's resolveRefs
    // throw on this unrelated query
    val df = spark.sql(
      s"""SELECT f.log_index FROM $cat.${Schemas.Nfp} f
         |JOIN rtf_dim_pr d ON f.block_number = d.bn
         |WHERE d.grp = 'hit'""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("dynamic PARTITION pruning engages on chain_name through the same seam") {
    val (lake, root, cat) = fixture("rtf-part")
    lake.append(rows(0 until 100, chain = "ethereum")
      .unionByName(rows(100 until 200, chain = "base")), Schemas.Nfp)
    import spark.implicits._
    Seq(("ethereum", "hit"), ("base", "miss")).toDF("ch", "grp")
      .write.mode("overwrite").parquet(s"$root/rtf_dim_part")
    spark.read.parquet(s"$root/rtf_dim_part")
      .createOrReplaceTempView("rtf_dim_part")
    val df = spark.sql(
      s"""SELECT count(*) AS n FROM $cat.${Schemas.Nfp} f
         |JOIN rtf_dim_part d ON f.chain_name = d.ch
         |WHERE d.grp = 'hit'""".stripMargin)
    assert(df.first().getLong(0) == 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic-pruning filter on the partition column:\n$plan")
  }
}
