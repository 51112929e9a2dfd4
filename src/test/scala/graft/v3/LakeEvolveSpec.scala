package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Versioned schema evolution: additive / widening commits under
  * `_schema`, resolved by every read, rejected loudly for anything
  * that would strand already-written files. */
class LakeEvolveSpec extends SparkSpec {

  private def s(n: String) = StructField(n, StringType, nullable = true)

  private val docsV1 = StructType(Seq(
    s("chain_name"), s("doc_id"),
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("score", FloatType, nullable = true)))

  test("create, widen, add: old files read widened and null-filled; " +
      "upsert merges across schema generations") {
    import spark.implicits._
    val lake = new Lake(spark, Files.createTempDirectory("lake-ev").toString)
    assert(lake.createTable("docs", docsV1) == 1L)
    assert(lake.effectiveSchema("docs") == docsV1)
    // wave 1: physical int32 / float files
    lake.append(Seq(("ethereum", "d1", 10, 0.5f), ("ethereum", "d2", 20, 1.5f))
      .toDF("chain_name", "doc_id", "n_tokens", "score"), "docs")
    // evolve: widen n_tokens->long, score->double, add lang
    val docsV2 = StructType(Seq(
      s("chain_name"), s("doc_id"),
      StructField("n_tokens", LongType, nullable = true),
      StructField("score", DoubleType, nullable = true), s("lang")))
    assert(lake.evolveSchema("docs", docsV2) == 2L)
    assert(lake.effectiveSchema("docs") == docsV2)
    // wave 2: written under the evolved schema
    lake.append(Seq(("ethereum", "d3", 30L, 2.5d, "en"))
      .toDF("chain_name", "doc_id", "n_tokens", "score", "lang"), "docs")
    val all = lake.read("docs").orderBy("doc_id").collect()
    assert(all.length == 3)
    assert(lake.read("docs").schema == docsV2)
    assert(all(0).getLong(2) == 10L && all(0).isNullAt(4),
      s"v1 file must read widened + null-filled: ${all(0)}")
    assert(all(2).getString(4) == "en")
    // upsert from an OLD producer (batch without lang): updates a v1
    // row and inserts a new key; lang lands as a typed null
    val batch = Seq(("ethereum", "d2", 99L, 9.9d),
        ("ethereum", "d4", 40L, 4.0d))
      .toDF("chain_name", "doc_id", "n_tokens", "score")
    lake.upsert(batch, "docs", Seq("chain_name", "doc_id"))
    val after = lake.read("docs").orderBy("doc_id").collect()
    assert(after.length == 4)
    assert(after(1).getLong(2) == 99L && after(1).isNullAt(4))
    assert(after(3).getString(1) == "d4")
    // pruned reads work on the evolved table (string key)
    val (hit, st) = lake.readKeys("docs", "doc_id", Seq("d3"))
    assert(hit.count() == 1L && st.scanned <= st.files)
  }

  test("an evolution landing MID-upsert: both commit, no row lost, new column null-fills") {
    // the race the additive-only rule exists to make safe: an upsert
    // PLANS and STAGES under schema v1; before it takes the commit
    // lock, an evolution commits v2 (add a column). Pinned semantics:
    // BOTH win — the upsert's v1-shaped files are forever legal under
    // v2 (readers null-fill), so the merge publishes unchanged and
    // every row reads back under the evolved schema
    import spark.implicits._
    val lake = new Lake(spark,
      Files.createTempDirectory("lake-ev-race").toString)
    lake.createTable("docs", docsV1)
    lake.append(Seq(("ethereum", "d1", 10, 0.5f), ("ethereum", "d2", 20, 1.5f))
      .toDF("chain_name", "doc_id", "n_tokens", "score"), "docs")
    val docsV2 = StructType(docsV1.fields :+ s("lang"))
    lake.preCommitHook = () => {
      lake.preCommitHook = () => ()
      assert(lake.evolveSchema("docs", docsV2) == 2L)
    }
    // v1-shaped batch: updates d2, inserts d3 — staged before the
    // evolution, published after it
    lake.upsert(Seq(("ethereum", "d2", 99, 9.9f), ("ethereum", "d3", 30, 3.0f))
      .toDF("chain_name", "doc_id", "n_tokens", "score"), "docs",
      Seq("chain_name", "doc_id"))
    // the evolution won AND the upsert won
    assert(lake.effectiveSchema("docs") == docsV2)
    val after = lake.read("docs").orderBy("doc_id").collect()
    assert(after.length == 3, s"row lost in the race: ${after.toSeq}")
    assert(after.map(_.getString(1)).toSeq == Seq("d1", "d2", "d3"))
    assert(after(1).getInt(2) == 99, s"merge lost: ${after(1)}")
    assert(after.forall(_.isNullAt(4)),
      "v1-era rows must null-fill the raced-in column")
    assert(lake.read("docs").schema == docsV2)
    // the next producer writes v2-shaped rows into the same table
    lake.upsert(Seq(("ethereum", "d4", 40, 4.0f, "en"))
      .toDF("chain_name", "doc_id", "n_tokens", "score", "lang"), "docs",
      Seq("chain_name", "doc_id"))
    val d4 = lake.read("docs").filter(col("doc_id") === "d4").collect()(0)
    assert(d4.getString(4) == "en")
    assert(lake.fileInventory("docs") == lake.listInventory("docs"))
  }

  test("illegal evolutions fail loudly before committing anything") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-ev2").toString)
    lake.createTable("docs", docsV1)
    def rejected(next: StructType, why: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        lake.evolveSchema("docs", next)
      }
      assert(lake.effectiveSchema("docs") == docsV1,
        s"$why: failed evolution must not commit (${e.getMessage})")
    }
    rejected(StructType(docsV1.fields.filterNot(_.name == "score")),
      "drop")
    rejected(StructType(docsV1.fields.map(f =>
      if (f.name == "n_tokens") StructField("n_tokens", ByteType) else f)),
      "narrow")
    rejected(StructType(docsV1.fields.map(f =>
      if (f.name == "doc_id") StructField("doc_id", LongType) else f)),
      "retype")
    rejected(StructType(docsV1.fields.map(f =>
      if (f.name == "doc_id") s("document_id") else f)),
      "rename")
    rejected(StructType(docsV1.fields :+
      StructField("strict", StringType, nullable = false)),
      "non-nullable add")
    rejected(StructType(docsV1.fields.filterNot(_.name == "chain_name")),
      "drop partition column")
    rejected(docsV1, "no-op")
  }

  test("createTable guards; registry tables keep their static fallback") {
    val lake = new Lake(spark, Files.createTempDirectory("lake-ev3").toString)
    assert(lake.effectiveSchema(Schemas.Nfp) == Schemas.nfp)
    lake.createTable("docs", docsV1)
    intercept[IllegalArgumentException] { lake.createTable("docs", docsV1) }
    // a registry table can evolve too: one added column
    val nfpPlus = StructType(Schemas.nfp.fields :+ s("source"))
    assert(lake.evolveSchema(Schemas.Nfp, nfpPlus) == 1L)
    assert(lake.effectiveSchema(Schemas.Nfp) == nfpPlus)
  }

  test("time travel pins data, not schema: pre-evolution snapshots " +
      "replay under the current schema") {
    import spark.implicits._
    val lake = new Lake(spark, Files.createTempDirectory("lake-ev4").toString)
    lake.createTable("docs", docsV1)
    lake.append(Seq(("ethereum", "d1", 10, 0.5f))
      .toDF("chain_name", "doc_id", "n_tokens", "score"), "docs")
    val v1 = lake.snapshot("docs")
    val docsV2 = StructType(docsV1.fields :+ s("lang"))
    lake.evolveSchema("docs", docsV2)
    lake.append(Seq(("ethereum", "d2", 20, 1.5f, "en"))
      .toDF("chain_name", "doc_id", "n_tokens", "score", "lang"), "docs")
    val pinned = lake.readAt("docs", v1)
    assert(pinned.schema == docsV2, "pinned reads use the current schema")
    val rows = pinned.collect()
    assert(rows.length == 1 && rows(0).getString(1) == "d1" &&
      rows(0).isNullAt(4))
  }
}
