package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.v3.Schemas

/** The SQL catalog surface: `SELECT … FROM <catalog>.<table>` plans
  * through the manifest (zero driver listings), `VERSION AS OF`
  * replays a pinned snapshot, SHOW TABLES serves from `_manifest/`,
  * and DDL that would bypass the lake's transactional writes refuses
  * loudly. */
class LakeCatalogSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum",
                   amt: Int => String = i => s"$i") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%05d", 1000L + i, 0L,
        "0xu1", amt(i), s"${i * 10}", s"${i * 100}", s"$i", 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private lazy val root: String = {
    val r = Files.createTempDirectory("lake-cat").toString
    spark.conf.set("spark.sql.catalog.graft_lake",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_lake.root", r)
    r
  }
  // the spec's WRITER instance; the catalog serves from its own
  // (asserted zero-listing via the lastInstance seam below)
  private lazy val lake = new graft.v3.Lake(spark, root)

  private def catalogLake = LakeCatalog.instance("graft_lake")
    .flatMap(_.currentLake)
    .getOrElse(fail("catalog has not served a query yet"))

  private def seed(): Long = {
    if (!lake.hasManifest(Schemas.Nfp)) {
      lake.append(rows(0 until 20), Schemas.Nfp)
      lake.append(rows(100 until 110, chain = "base"), Schemas.Nfp)
      val v0 = lake.snapshot(Schemas.Nfp)
      lake.upsert(rows(0 until 3, amt = i => s"u$i"), Schemas.Nfp,
        Seq("chain_name", "transaction_hash"), retain = true)
      v0
    } else lake.snapshotVersions(Schemas.Nfp).head
  }

  test("SELECT over a lake table is manifest-served: ZERO listings, filters work") {
    seed()
    assert(spark.sql("SELECT count(*) AS c FROM graft_lake.nfp")
      .collect()(0).getLong(0) == 30L)
    val got = spark.sql(
      """SELECT amount FROM graft_lake.nfp
        | WHERE chain_name = 'ethereum' AND transaction_hash = '0xtx00001'
        |""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(got == Seq("u1"), s"merged row diverged: $got")
    // partition + data filters planned and executed with no listings
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_lake.nfp WHERE chain_name = 'base'")
      .collect()(0).getLong(0) == 10L)
    assert(catalogLake.listCalls.get() == 0L,
      s"SQL reads listed ${catalogLake.listCalls.get()} time(s)")
  }

  test("VERSION AS OF replays the pinned snapshot") {
    val v0 = seed()
    val old = spark.sql(
      s"""SELECT amount FROM graft_lake.nfp VERSION AS OF $v0
         | WHERE transaction_hash = '0xtx00001'""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(old == Seq("1"), s"pinned read diverged: $old")
    // current state still shows the merge
    assert(spark.sql(
      """SELECT amount FROM graft_lake.nfp
        | WHERE transaction_hash = '0xtx00001'""".stripMargin)
      .collect().map(_.getString(0)).toSeq == Seq("u1"))
  }

  test("INSERT INTO routes through the lake's manifest transaction; OVERWRITE refuses") {
    seed()
    spark.sql(
      """INSERT INTO graft_lake.nfp VALUES
        | ('base', 'IncreaseLiquidity', '0xsql1', 9000, 0,
        |  '0xu9', 'sqlv', '1', '2', '3', 7)""".stripMargin)
    val got = spark.sql(
      "SELECT amount FROM graft_lake.nfp WHERE transaction_hash = '0xsql1'")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("sqlv"), s"SQL append lost: $got")
    // the append COMMITTED a manifest version: writer-side reads see it
    // and manifest matches disk exactly
    assert(lake.read(graft.v3.Schemas.Nfp)
      .filter(col("transaction_hash") === "0xsql1").count() == 1L)
    assert(lake.fileInventory(graft.v3.Schemas.Nfp) ==
      lake.listInventory(graft.v3.Schemas.Nfp))
    // refusal may come from Spark's capability check (no
    // truncate/overwrite capability declared) or from the sink — both
    // are loud, and nothing may land either way
    intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE graft_lake.nfp VALUES
          | ('base', 'x', '0xsql2', 9001, 0, '0xu9', 'v', '1', '2', '3', 7)
          |""".stripMargin)
    }
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_lake.nfp WHERE transaction_hash = '0xsql2'")
      .collect()(0).getLong(0) == 0L, "refused OVERWRITE landed rows")
  }

  test("ALTER TABLE ADD COLUMN maps onto additive schema evolution; drops refuse") {
    seed()
    spark.sql("ALTER TABLE graft_lake.nfp ADD COLUMNS (lang STRING)")
    // evolution committed: the SQL read plans under the new schema,
    // old files null-fill
    val rows = spark.sql(
      """SELECT lang FROM graft_lake.nfp
        | WHERE transaction_hash = '0xtx00002'""".stripMargin).collect()
    assert(rows.length == 1 && rows(0).isNullAt(0))
    assert(lake.effectiveSchema(graft.v3.Schemas.Nfp)
      .fieldNames.contains("lang"))
    // a drop has no lake shape (old files would become unreadable)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_lake.nfp DROP COLUMN amount1")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("no lake shape") ||
      m.contains("DROP COLUMN")), chain(e).mkString("; "))
    // the refused drop changed nothing: the column survived
    assert(lake.effectiveSchema(graft.v3.Schemas.Nfp)
      .fieldNames.contains("amount1"))
  }

  test("SHOW TABLES serves from the manifest dir; DDL writes refuse loudly") {
    seed()
    val tables = spark.sql("SHOW TABLES IN graft_lake")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains(Schemas.Nfp), tables.toString)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.brand_new (x INT) USING parquet")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("Lake API")), chain(e).mkString("; "))
  }

  test("a manifest-less foreign table without chain_name= dirs serves unpartitioned") {
    seed()
    import spark.implicits._
    // a foreign writer dropped plain parquet (chain_name as a DATA
    // column, no hive layout) into the lake root: the listing-fallback
    // read must serve it through SQL like lake.read does from Scala,
    // not die in the partition parser
    Seq(
      ("ethereum", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        100L, "0xf1", 1L, "0xa", "0xb", "500", "10", "0xpool1"),
      ("base", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        200L, "0xf2", 2L, "0xc", "0xd", "3000", "60", "0xpool2"))
      .toDF("chain_name", "block_timestamp", "block_number",
        "transaction_hash", "log_index", "token0", "token1", "fee",
        "tickSpacing", "pool")
      .write.mode("overwrite").parquet(s"$root/${Schemas.FactoryPoolCreated}")
    val got = spark.sql(
      s"""SELECT chain_name, pool FROM graft_lake.${Schemas.FactoryPoolCreated}
         | ORDER BY chain_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("base", "0xpool2"), ("ethereum", "0xpool1")), got)
  }
}
