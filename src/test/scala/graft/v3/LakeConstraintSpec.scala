package graft.v3

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write constraints (Delta-style invariants): CHECK expressions and
  * NOT NULL columns declared as table properties, validated against
  * existing rows at declaration time and enforced on every
  * data-adding path — append inline, upsert inline with tombstone
  * exemption, SQL UPDATE through the staged-file gate. A violation
  * always refuses loudly with the constraint named and leaves the
  * table untouched. */
class LakeConstraintSpec extends SparkSpec {

  private def rows(ids: Seq[Int], amtOf: Int => String = i => s"${i * 10}") = {
    import spark.implicits._
    ids.map { i =>
      ("ethereum", "IncreaseLiquidity", f"0xtx$i%06d", 1000L + i,
        i % 13L, "0xu1", s"$i", amtOf(i), s"${i * 100}", s"$i", i % 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def fixture(tag: String): Lake = {
    val root = Files.createTempDirectory(tag).toString
    new Lake(spark, root)
  }

  private def rootCause(t: Throwable): String = {
    var c: Throwable = t
    val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("a violating append refuses loudly naming the constraint and lands NOTHING") {
    val lake = fixture("ck-append")
    lake.append(rows(0 until 50).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      "constraint.check.nonneg_amount" ->
        "CAST(amount0 AS BIGINT) >= 0",
      "constraint.notnull" -> "transaction_hash"))
    val v0 = lake.latestCommitVersion(Schemas.Nfp)
    val files0 = lake.fileInventory(Schemas.Nfp).map(_._2).toSet
    val e = intercept[Exception] {
      lake.append(rows(50 until 60,
        amtOf = i => s"${-i}").coalesce(1), Schemas.Nfp)
    }
    assert(rootCause(e).contains("nonneg_amount"),
      s"violation must name the constraint:\n${rootCause(e)}")
    assert(lake.latestCommitVersion(Schemas.Nfp) == v0 &&
      lake.fileInventory(Schemas.Nfp).map(_._2).toSet == files0,
      "the violating append changed the table")
    // a NULL check RESULT passes (SQL semantics): amount0 null rows
    // pass nonneg but fail a separate notnull only if declared
    lake.append(rows(60 until 70)
      .withColumn("amount0", lit(null).cast("string")).coalesce(1),
      Schemas.Nfp)
    assert(lake.read(Schemas.Nfp).count() == 60L)
    // NOT NULL violation
    val e2 = intercept[Exception] {
      lake.append(rows(70 until 80)
        .withColumn("transaction_hash", lit(null).cast("string"))
        .coalesce(1), Schemas.Nfp)
    }
    assert(rootCause(e2).contains("NOT NULL"))
  }

  test("declaring a constraint the existing data violates refuses with an example row") {
    val lake = fixture("ck-decl")
    lake.append(rows(0 until 20, amtOf = i => s"${i - 5}").coalesce(1),
      Schemas.Nfp)
    val e = intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "constraint.check.pos" -> "CAST(amount0 AS BIGINT) > 0"))
    }
    assert(e.getMessage.contains("existing row violates"))
    // the refused property must NOT be committed
    assert(!lake.tableProperties(Schemas.Nfp).contains(
      "constraint.check.pos"))
    // an unknown column in the expression refuses loudly too
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "constraint.check.ghost" -> "no_such_col > 0"))
    }
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "constraint.notnull" -> "no_such_col"))
    }
  }

  test("upsert guards updates inline but exempts tombstones; violating upsert leaves state unchanged") {
    val lake = fixture("ck-upsert")
    lake.append(rows(0 until 40).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      "constraint.check.nonneg_amount" -> "CAST(amount0 AS BIGINT) >= 0"))
    // a tombstone whose payload would violate still deletes fine
    val del = rows(0 until 5, amtOf = _ => "-999")
      .withColumn("__del", lit(true))
    lake.upsert(del, Schemas.Nfp,
      Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    assert(lake.read(Schemas.Nfp).count() == 35L)
    // a violating UPDATE refuses and changes nothing
    val v0 = lake.latestCommitVersion(Schemas.Nfp)
    val bad = rows(10 until 12, amtOf = _ => "-7")
      .withColumn("__del", lit(false))
    val e = intercept[Exception] {
      lake.upsert(bad, Schemas.Nfp,
        Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
    }
    assert(rootCause(e).contains("nonneg_amount"))
    assert(lake.latestCommitVersion(Schemas.Nfp) == v0)
    assert(lake.read(Schemas.Nfp)
      .filter(col("amount0").cast("long") < 0).count() == 0L)
  }

  test("SQL UPDATE through the catalog hits the staged-file gate; a violation aborts unpublished") {
    val lake = fixture("ck-sql")
    val root = lake.root
    lake.append(rows(0 until 30).coalesce(1), Schemas.Nfp)
    lake.setTableProperties(Schemas.Nfp, Map(
      "constraint.check.nonneg_amount" -> "CAST(amount0 AS BIGINT) >= 0"))
    val cat = "ck_sql_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // a legal UPDATE passes the gate
    spark.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount0 = '1' " +
      "WHERE log_index = 2")
    assert(lake.read(Schemas.Nfp)
      .filter(col("log_index") === 2 && col("amount0") =!= "1")
      .count() == 0L)
    val v0 = lake.latestCommitVersion(Schemas.Nfp)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount0 = '-5' " +
        "WHERE log_index = 3")
    }
    assert(rootCause(e).contains("nonneg_amount"),
      s"staged gate must name the constraint:\n${rootCause(e)}")
    assert(lake.latestCommitVersion(Schemas.Nfp) == v0,
      "the violating UPDATE published a manifest version")
    assert(lake.read(Schemas.Nfp)
      .filter(col("amount0") === "-5").count() == 0L)
  }

  test("a CHECK over a column absent from the batch passes (evolution reads it as null); an absent NOT NULL column refuses") {
    val lake = fixture("ck-evolve")
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val withExtra = lake.effectiveSchema(Schemas.Nfp)
      .add("extra_score", org.apache.spark.sql.types.LongType,
        nullable = true)
    lake.evolveSchema(Schemas.Nfp, withExtra)
    lake.setTableProperties(Schemas.Nfp, Map(
      "constraint.check.score_range" ->
        "extra_score BETWEEN 0 AND 100"))
    // an old-shape batch (no extra_score) still appends: the column
    // reads back null, and NULL passes a CHECK
    lake.append(rows(10 until 20).coalesce(1), Schemas.Nfp)
    assert(lake.read(Schemas.Nfp).count() == 20L)
    // a new-shape violating batch refuses
    val e = intercept[Exception] {
      lake.append(rows(20 until 25)
        .withColumn("extra_score", lit(500L)).coalesce(1), Schemas.Nfp)
    }
    assert(rootCause(e).contains("score_range"))
    // NOT NULL on a column the batch omits refuses loudly up front
    intercept[Exception] {
      lake.setTableProperties(Schemas.Nfp, Map(
        "constraint.notnull" -> "extra_score"))
    } // (existing rows are null there - declaration itself refuses)
  }
}
