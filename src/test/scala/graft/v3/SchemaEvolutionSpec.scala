package graft.v3

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Schema evolution on the pinned-schema lake: files written before a
  * column existed must read as typed nulls under the widened schema,
  * old and new files must coexist in one scan, and the pinned read
  * must ignore stray columns a writer added that the contract doesn't
  * know. This is the property that lets a 100 TB lake add a column
  * without rewriting history — Spark's by-name parquet resolution
  * against an explicit schema provides it; the spec pins the
  * behavior so a read-path change can't silently regress it. */
class SchemaEvolutionSpec extends SparkSpec {

  test("files predating a column read as nulls; mixed files scan together") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake-evo").toString
    val lake = new Lake(spark, root)
    // wave 1: written WITHOUT amount1/tokenId (an older writer)
    Seq(("ethereum", "IncreaseLiquidity", "0xtx1", 1001L, 0L, "0xu1",
        "5", "50", 7L))
      .toDF("chain_name", "name", "transaction_hash", "block_number",
        "tx_index", "from_address", "amount", "amount0", "log_index")
      .write.mode("append").partitionBy("chain_name")
      .parquet(s"$root/${Schemas.Nfp}")
    // wave 2: the full current schema through the lake API
    Seq(("ethereum", "DecreaseLiquidity", "0xtx2", 1002L, 0L, "0xu2",
        "6", "60", "600", "42", 8L))
      .toDF("chain_name", "name", "transaction_hash", "block_number",
        "tx_index", "from_address", "amount", "amount0", "amount1",
        "tokenId", "log_index")
      .pipe(df => { lake.append(df, Schemas.Nfp); df })
    val got = lake.read(Schemas.Nfp)
      .select("transaction_hash", "amount1", "tokenId")
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(got == Set(("0xtx1", None, None),
      ("0xtx2", Some("600"), Some("42"))))
  }

  test("stray writer columns beyond the contract are ignored by the pinned read") {
    import spark.implicits._
    val root = Files.createTempDirectory("lake-evo2").toString
    val lake = new Lake(spark, root)
    Seq(("ethereum", "Collect", "0xtx9", 1009L, 0L, "0xu9",
        "9", "90", "900", "99", 9L, "EXTRA"))
      .toDF("chain_name", "name", "transaction_hash", "block_number",
        "tx_index", "from_address", "amount", "amount0", "amount1",
        "tokenId", "log_index", "not_in_contract")
      .write.mode("append").partitionBy("chain_name")
      .parquet(s"$root/${Schemas.Nfp}")
    val df = lake.read(Schemas.Nfp)
    assert(!df.columns.contains("not_in_contract"))
    assert(df.count() == 1L)
    assert(df.select("tokenId").head().getString(0) == "99")
  }

  implicit class Piped[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
