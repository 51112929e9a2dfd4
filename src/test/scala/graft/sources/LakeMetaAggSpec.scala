package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** Metadata-only aggregates: a bare COUNT(*)/MIN/MAX over a lake
  * table answers from manifest + stats sidecar as a LocalScan — ZERO
  * scan tasks — whenever every file carries the needed fact; partial
  * stats, filters, grouping, or exotic functions fall back to the
  * ordinary scan with identical results. */
class LakeMetaAggSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%06d", 1000L + i, i % 13L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}",
        if (i % 2 == 0) null else s"$i", i % 7L)
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

  /** Did the query serve from metadata (a LocalTableScan leaf, no
    * file scan)? String-matched under AQE, which wraps the plan in an
    * AdaptiveSparkPlanExec leaf. */
  private def servedFromMetadata(df: org.apache.spark.sql.DataFrame)
      : Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan") &&
      !plan.contains("FileScan") && !plan.contains("RowDataSourceScan")
  }

  test("bare COUNT(*)/MIN/MAX serve from metadata with ZERO scan tasks; values exact incl. strings and a fresh driver") {
    val (lake, root, cat) = fixture("metaagg-serve")
    (0 until 3).foreach(j =>
      lake.append(rows(j * 100 until (j + 1) * 100).coalesce(1),
        Schemas.Nfp))
    val df = spark.sql(s"SELECT count(*) AS n, min(block_number) AS mn, " +
      s"max(block_number) AS mx, min(transaction_hash) AS smn, " +
      s"max(transaction_hash) AS smx FROM $cat.${Schemas.Nfp}")
    val r = df.first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((300L, 1000L, 1299L)))
    assert(r.getString(3) == "0xtx000000" && r.getString(4) == "0xtx000299")
    assert(servedFromMetadata(df),
      s"metadata aggregate scheduled a scan:\n" +
        df.queryExecution.executedPlan)
    // a FRESH driver serves from the persisted sidecar, still no scan
    val lake2 = new Lake(spark, root)
    assert(lake2.metadataRowCount(Schemas.Nfp).contains(300L))
    assert(lake2.footerReads.get() == 0L,
      "metadata count opened a footer")
    // count(1) is count(*)
    val df1 = spark.sql(s"SELECT count(1) FROM $cat.${Schemas.Nfp}")
    assert(df1.first().getLong(0) == 300L)
    assert(servedFromMetadata(df1))
  }

  test("fallbacks: WHERE, GROUP BY, partial stats, count(col) and avg all take the ordinary scan with exact results") {
    val (lake, _, cat) = fixture("metaagg-fall")
    lake.append(rows(0 until 100).coalesce(1), Schemas.Nfp)
    def scanServed(sql: String): (org.apache.spark.sql.Row, Boolean) = {
      val df = spark.sql(sql)
      (df.first(), servedFromMetadata(df))
    }
    // a filter needs the rows
    val (rf, sf) = scanServed(s"SELECT count(*) FROM " +
      s"$cat.${Schemas.Nfp} WHERE block_number < 1010")
    assert(rf.getLong(0) == 10L && !sf)
    // grouping needs the rows
    val (rg, sg) = scanServed(s"SELECT count(*) FROM " +
      s"$cat.${Schemas.Nfp} GROUP BY log_index ORDER BY 1 LIMIT 1")
    assert(rg.getLong(0) == 14L && !sg)
    // count(col) skips nulls - not the manifest row count
    val (rc, sc) = scanServed(
      s"SELECT count(tokenId) FROM $cat.${Schemas.Nfp}")
    assert(rc.getLong(0) == 50L && !sc)
    // avg is not servable
    val (ra, sa) = scanServed(
      s"SELECT avg(block_number) FROM $cat.${Schemas.Nfp}")
    assert(math.abs(ra.getDouble(0) - 1049.5) < 1e-9 && !sa)
    // PARTIAL STATS: a stats-disabled table cannot prove anything
    val (lake2, _, cat2) = fixture("metaagg-nostats")
    lake2.setTableProperties(Schemas.Nfp, Map("stats.collect" -> "false"))
    lake2.append(rows(0 until 50).coalesce(1), Schemas.Nfp)
    assert(lake2.metadataRowCount(Schemas.Nfp).isEmpty)
    val dfn = spark.sql(s"SELECT count(*), max(block_number) FROM " +
      s"$cat2.${Schemas.Nfp}")
    val rn = dfn.first()
    assert(rn.getLong(0) == 50L && rn.getLong(1) == 1049L)
    assert(!servedFromMetadata(dfn),
      "partial-stats table must fall back to a scan")
  }

  test("deletion vectors: COUNT subtracts cardinalities exactly; MIN/MAX refuse (the extremum may be deleted); SQL stays exact") {
    val (lake, _, cat) = fixture("metaagg-dv")
    lake.setTableProperties(Schemas.Nfp, Map("dv.maxFraction" -> "0.5"))
    lake.append(rows(0 until 100).coalesce(1), Schemas.Nfp)
    assert(lake.deleteWhere(Schemas.Nfp,
      col("block_number") >= 1090L, retain = true).landedFiles == 0)
    assert(lake.metadataRowCount(Schemas.Nfp).contains(90L))
    // max lives in the DELETED tail: metadata bounds must refuse
    assert(lake.metadataBounds(Schemas.Nfp, "block_number").isEmpty)
    // and the SQL answer (through the DV fallback scan) stays exact
    val r = spark.sql(s"SELECT count(*), max(block_number) FROM " +
      s"$cat.${Schemas.Nfp}").first()
    assert(r.getLong(0) == 90L && r.getLong(1) == 1089L)
  }

  test("edge shapes: empty table serves 0/NULL; an all-null column serves NULL bounds") {
    import org.apache.spark.sql.types._
    val (lake, _, cat) = fixture("metaagg-edge")
    val t = "edge_tbl"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("k", LongType, nullable = true),
      StructField("hole", LongType, nullable = true))))
    val dfe = spark.sql(s"SELECT count(*), max(k) FROM $cat.$t")
    val re = dfe.first()
    assert(re.getLong(0) == 0L && re.isNullAt(1))
    assert(servedFromMetadata(dfe))
    import spark.implicits._
    lake.append((0 until 40)
      .map(i => ("ethereum", i.toLong, null: java.lang.Long))
      .toDF("chain_name", "k", "hole").coalesce(1), t)
    val dfh = spark.sql(s"SELECT count(*), min(hole), max(hole), " +
      s"min(k), max(k) FROM $cat.$t")
    val rh = dfh.first()
    assert(rh.getLong(0) == 40L && rh.isNullAt(1) && rh.isNullAt(2) &&
      rh.getLong(3) == 0L && rh.getLong(4) == 39L)
    assert(servedFromMetadata(dfh),
      s"all-null bounds must still serve from metadata:\n" +
        dfh.queryExecution.executedPlan)
  }
}
