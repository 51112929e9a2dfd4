package graft.v3

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generated columns (Delta's GENERATED ALWAYS AS): declared as
  * `generated.col.<name>` table properties. A write omitting the
  * column gets it computed; one supplying it gets every row
  * validated null-safely against the expression; declaration
  * validates the expression, its references, and the existing rows.
  */
class LakeGeneratedSpec extends SparkSpec {

  private def rows(ids: Seq[Int], liOf: Int => Long = i => i % 7L) = {
    import spark.implicits._
    ids.map { i =>
      ("ethereum", "IncreaseLiquidity", f"0xtx$i%06d", 1000L + i,
        i % 13L, "0xu1", s"$i", s"${i * 10}", s"${i * 100}", s"$i",
        liOf(i))
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def fixture(tag: String): Lake =
    new Lake(spark, Files.createTempDirectory(tag).toString)

  private def causes(t: Throwable): String = {
    var c: Throwable = t
    val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  // log_index = (block_number - 1000) % 7 holds for the fixture rows
  private val genExpr = "pmod(block_number - 1000, 7)"

  test("an omitted generated column is COMPUTED; a supplied one is validated; divergence refuses naming the column") {
    val lake = fixture("gen-basic")
    lake.append(rows(0 until 30).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      s"generated.col.log_index" -> genExpr))
    // computed: append WITHOUT log_index
    lake.append(rows(30 until 60).drop("log_index").coalesce(1),
      Schemas.Nfp)
    assert(lake.read(Schemas.Nfp)
      .filter(col("log_index") =!= pmod(col("block_number") - 1000,
        lit(7))).count() == 0L)
    assert(lake.read(Schemas.Nfp).filter(col("log_index").isNull)
      .count() == 0L)
    // validated: a correct supplied batch passes
    lake.append(rows(60 until 70).coalesce(1), Schemas.Nfp)
    assert(lake.read(Schemas.Nfp).count() == 70L)
    // a divergent supplied batch refuses, names the column, lands
    // nothing
    val v0 = lake.latestCommitVersion(Schemas.Nfp)
    val e = intercept[Exception] {
      lake.append(rows(70 until 80, liOf = _ => 99L).coalesce(1),
        Schemas.Nfp)
    }
    assert(causes(e).contains("generated column log_index"))
    assert(lake.latestCommitVersion(Schemas.Nfp) == v0)
  }

  test("declaration validates refs and existing rows; self/chained references refuse") {
    val lake = fixture("gen-decl")
    lake.append(rows(0 until 20).coalesce(1), Schemas.Nfp)
    // existing rows diverge from a wrong expression
    val e = intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "generated.col.log_index" -> "pmod(block_number, 5)"))
    }
    assert(e.getMessage.contains("existing row diverges"))
    assert(!lake.tableProperties(Schemas.Nfp)
      .contains("generated.col.log_index"))
    // unknown target column
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "generated.col.no_such" -> "1"))
    }
    // self-reference
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "generated.col.log_index" -> "log_index + 0"))
    }
    // chained generation (references another generated column)
    lake.setTableProperties(Schemas.Nfp, Map(
      "generated.col.log_index" -> genExpr))
    val e2 = intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "generated.col.tx_index" -> "pmod(log_index, 13)"))
    }
    assert(e2.getMessage.contains("stored columns only"))
  }

  test("upsert computes/validates generated columns; tombstones are exempt; SQL UPDATE validates at the staged gate") {
    val lake = fixture("gen-upsert")
    lake.append(rows(0 until 40).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      "generated.col.log_index" -> genExpr))
    // upsert WITHOUT the column: computed
    lake.upsert(rows(40 until 45).drop("log_index")
      .withColumn("__del", lit(false)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    assert(lake.read(Schemas.Nfp).count() == 45L)
    assert(lake.read(Schemas.Nfp)
      .filter(col("log_index") =!= pmod(col("block_number") - 1000,
        lit(7))).count() == 0L)
    // tombstone with a divergent payload still deletes
    lake.upsert(rows(0 until 3, liOf = _ => 42L)
      .withColumn("__del", lit(true)), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    assert(lake.read(Schemas.Nfp).count() == 42L)
    // SQL UPDATE writing a divergent value dies at the staged gate
    val cat = "gen_sql_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", lake.root)
    val v0 = lake.latestCommitVersion(Schemas.Nfp)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.${Schemas.Nfp} SET log_index = 6 " +
        "WHERE tx_index = 2")
    }
    assert(causes(e).contains("generated column log_index"))
    assert(lake.latestCommitVersion(Schemas.Nfp) == v0)
    // an UPDATE that keeps the invariant passes (touches amount only)
    spark.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount = '0' " +
      "WHERE tx_index = 2")
    assert(lake.read(Schemas.Nfp)
      .filter(col("tx_index") === 2 && col("amount") =!= "0")
      .count() == 0L)
  }

  test("DEFAULT columns fill omitted columns, never validate supplied ones, and refuse to coexist with generation") {
    val lake = fixture("gen-default")
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      "default.col.name" -> "'DefaultEvent'"))
    // omitted -> default applied
    lake.append(rows(10 until 20).drop("name").coalesce(1), Schemas.Nfp)
    assert(lake.read(Schemas.Nfp)
      .filter(col("name") === "DefaultEvent").count() == 10L)
    // supplied -> kept verbatim, never validated
    lake.append(rows(20 until 25).coalesce(1), Schemas.Nfp)
    assert(lake.read(Schemas.Nfp)
      .filter(col("name") === "IncreaseLiquidity").count() == 15L)
    // unknown target refuses; a column cannot be default AND generated
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "default.col.no_such" -> "'x'"))
    }
    lake.setTableProperties(Schemas.Nfp, Map(
      "generated.col.log_index" -> genExpr))
    val e = intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "default.col.log_index" -> "0"))
    }
    assert(e.getMessage.contains("cannot be both"))
    val e2 = intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "generated.col.name" -> "'x'"))
    }
    assert(e2.getMessage.contains("cannot be both"))
  }
}
