package graft.v3

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental materialized views: SUM/COUNT aggregates stored as a
  * lake table and refreshed in O(changed files) from the commit
  * log's change feed — inserts add, deletes subtract, rewrite-only
  * commits contribute nothing. Every case cross-checks the view
  * against a from-scratch recomputation (exceptAll both ways). */
class LakeMvSpec extends SparkSpec {

  private def rows(ids: Seq[Int], amtOf: Int => Long = i => i * 10L,
                   nameOf: Int => String = _ => "E") = {
    import spark.implicits._
    ids.map { i =>
      ("ethereum", nameOf(i), f"0xtx$i%06d", 1000L + i, i % 13L,
        "0xu1", s"$i", s"${amtOf(i)}", s"${i * 100}", s"$i", i % 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def fixture(tag: String): Lake =
    new Lake(spark, Files.createTempDirectory(tag).toString)

  private val group = Seq("chain_name", "log_index")
  private def define(lake: Lake): Unit =
    lake.createMaterializedView("nfp_mv", Schemas.Nfp, group,
      Map("cents" -> "CAST(amount0 AS BIGINT)"))

  /** The view must equal this from-scratch recomputation exactly. */
  private def recompute(lake: Lake): DataFrame =
    lake.read(Schemas.Nfp).groupBy(group.map(col): _*)
      .agg(sum(coalesce(col("amount0").cast("long"), lit(0L)))
        .cast("long").as("cents"),
        count(lit(1)).as("mv_count"))

  private def assertMatches(lake: Lake): Unit = {
    val mv = lake.read("nfp_mv")
      .select("chain_name", "log_index", "cents", "mv_count")
    val exp = recompute(lake)
      .select("chain_name", "log_index", "cents", "mv_count")
    assert(mv.exceptAll(exp).count() == 0L &&
      exp.exceptAll(mv).count() == 0L,
      s"view diverged from recompute:\nview=${mv.collect().toSeq}\n" +
        s"exp=${exp.collect().toSeq}")
  }

  test("initial refresh is a FULL load; re-refresh is a noop; the view matches a recompute") {
    val lake = fixture("mv-full")
    lake.append(rows(0 until 60).coalesce(1), Schemas.Nfp)
    define(lake)
    val r1 = lake.refreshMaterializedView("nfp_mv")
    assert(r1.mode == "full")
    assertMatches(lake)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "noop")
  }

  test("appends, updates and deletes refresh INCREMENTALLY and stay exact; rewrite-only commits contribute nothing") {
    val lake = fixture("mv-incr")
    lake.append(rows(0 until 60).coalesce(1), Schemas.Nfp)
    define(lake)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "full")
    // append + update + delete waves
    lake.append(rows(60 until 90).coalesce(1), Schemas.Nfp)
    lake.upsert(
      rows(0 until 10, amtOf = i => i * 10L + 5).withColumn("__del",
        lit(false))
        .unionByName(rows(10 until 13).withColumn("__del", lit(true))),
      Schemas.Nfp, Seq("chain_name", "transaction_hash"),
      deleteCol = Some("__del"), retain = true)
    val r2 = lake.refreshMaterializedView("nfp_mv")
    assert(r2.mode == "incremental", s"got $r2")
    assertMatches(lake)
    // compaction carries no row changes: the next refresh may walk
    // the new commits but must change NOTHING
    lake.compact(Schemas.Nfp, targetBytes = 1L << 30, retain = true)
    val before = lake.read("nfp_mv").collect().toSet
    val r3 = lake.refreshMaterializedView("nfp_mv")
    assert(r3.mode == "incremental" || r3.mode == "noop")
    assert(lake.read("nfp_mv").collect().toSet == before)
    assertMatches(lake)
    // a group dropping to zero rows tombstones OUT of the view
    lake.upsert(rows(0 until 90).filter(col("log_index") === 3L)
      .withColumn("__del", lit(true)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"),
      retain = true)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "incremental")
    assert(lake.read("nfp_mv").filter(col("log_index") === 3L)
      .count() == 0L)
    assertMatches(lake)
    // an UN-retained rewrite breaks change-feed replay: the refresh
    // degrades to a FULL rebuild (still exact) - and refuses instead
    // when full rebuilds are disallowed
    lake.upsert(rows(20 until 22, amtOf = _ => 7L)
      .withColumn("__del", lit(false)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    lake.upsert(rows(22 until 24, amtOf = _ => 7L)
      .withColumn("__del", lit(false)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    intercept[Exception] {
      lake.refreshMaterializedView("nfp_mv", allowFullRebuild = false)
    }
    assert(lake.refreshMaterializedView("nfp_mv").mode == "full")
    assertMatches(lake)
  }

  test("a NULL-valued group key refuses loudly (the view is KEYED by its groups)") {
    val lake = fixture("mv-null")
    // group by (chain_name, name) with name NULL on some rows: the
    // view table is keyed by the group columns, and the lake's upsert
    // refuses null keys by design (a null key can never be replaced
    // or deleted, only duplicated) - the refresh surfaces that
    // refusal instead of materializing an unmergeable row
    lake.append(rows(0 until 30,
      nameOf = i => if (i % 3 == 0) null else "E").coalesce(1),
      Schemas.Nfp)
    lake.createMaterializedView("nfp_mv", Schemas.Nfp,
      Seq("chain_name", "name"),
      Map("cents" -> "CAST(amount0 AS BIGINT)"))
    val e = intercept[Exception] {
      lake.refreshMaterializedView("nfp_mv")
    }
    assert(e.getMessage.contains("null"),
      s"null group must refuse naming the hazard: ${e.getMessage}")
    // coalescing the null away in the source, via a fresh view over
    // a group expression-free column set, works: name is non-null in
    // the remaining rows
    lake.upsert(rows(0 until 30).filter(pmod(col("block_number"),
        lit(3)) === 1000L % 3) // ids 0,3,6,... have null names
      .withColumn("__del", lit(true)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"),
      retain = true)
    assert(lake.read(Schemas.Nfp).filter(col("name").isNull)
      .count() == 0L)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "full")
    assertMatchesBy(lake, Seq("chain_name", "name"))
  }

  private def assertMatchesBy(lake: Lake, g: Seq[String]): Unit = {
    val mv = lake.read("nfp_mv")
      .select((g :+ "cents" :+ "mv_count").map(col): _*)
    val exp = lake.read(Schemas.Nfp).groupBy(g.map(col): _*)
      .agg(sum(coalesce(col("amount0").cast("long"), lit(0L)))
        .cast("long").as("cents"), count(lit(1)).as("mv_count"))
      .select((g :+ "cents" :+ "mv_count").map(col): _*)
    assert(mv.exceptAll(exp).count() == 0L &&
      exp.exceptAll(mv).count() == 0L,
      s"view diverged:\nview=${mv.collect().toSeq}\nexp=${exp.collect().toSeq}")
  }

  test("the graft_mv_refresh TVF drives refresh from pure SQL") {
    val lake = fixture("mv-tvf")
    lake.append(rows(0 until 30).coalesce(1), Schemas.Nfp)
    define(lake)
    val cat = "mv_tvf_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    graft.sources.LakeMaintenance.register(spark)
    val r = spark.sql(
      s"SELECT * FROM graft_mv_refresh('$cat.nfp_mv')").first()
    assert(r.getString(0) == "full", s"got $r")
    assertMatches(lake)
    assert(spark.sql(
      s"SELECT mode FROM graft_mv_refresh('$cat.nfp_mv')")
      .first().getString(0) == "noop")
  }

  test("bookkeeping survives a lost progress marker (the #txn commit header answers); a recreated source refuses") {
    val lake = fixture("mv-txn")
    lake.append(rows(0 until 40).coalesce(1), Schemas.Nfp)
    define(lake)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "full")
    // kill the durable marker: the view's own commit log still knows
    // its last reflected source version
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${lake.root}/_streamtxn/nfp_mv"), true)
    assert(lake.refreshMaterializedView("nfp_mv").mode == "noop")
    // dropTable+recreate restarts version numbering - refuse loudly
    lake.dropTable(Schemas.Nfp)
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val e = intercept[Exception] {
      lake.refreshMaterializedView("nfp_mv")
    }
    assert(e.getMessage.contains("dropped and recreated"))
  }
}
