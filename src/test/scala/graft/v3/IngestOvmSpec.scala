package graft.v3

import graft.SparkSpec
import graft.v3.ingest.Ingest
import org.apache.spark.sql.functions._

/** OVM1→EVM rewrite semantics (reference data_update.py:236–280). */
class IngestOvmSpec extends SparkSpec {
  import spark.implicits._

  test("ovmRewrite pins block/timestamp/chain and remaps addresses") {
    val df = Seq(
      ("optimism_legacy_ovm1", 123456L, "0xaaa"),
      ("optimism_legacy_ovm1", 123457L, "0xccc")
    ).toDF("chain_name", "block_number", "address")
      .withColumn("block_timestamp", current_timestamp())
    val mapping = Seq(("0xaaa", "0xbbb")).toDF("oldaddress", "newaddress")

    val out = Ingest.ovmRewrite(df, Schemas.PoolSwapEvents, mapping)
      .orderBy(col("address").asc_nulls_last).collect()

    assert(out.forall(_.getAs[Long]("block_number") == 1L))
    assert(out.forall(_.getAs[String]("chain_name") == "optimism"))
    assert(out.forall(_.getAs[java.sql.Timestamp]("block_timestamp") == Ingest.OvmGenesis))
    assert(out.head.getAs[String]("address") == "0xbbb") // mapped
    assert(out.last.getAs[String]("address") == null)    // unmapped → null (map_dict default=None)
  }

  test("factory table remaps the pool column") {
    val df = Seq(("optimism_legacy_ovm1", 5L, "0xaaa"))
      .toDF("chain_name", "block_number", "pool")
      .withColumn("block_timestamp", current_timestamp())
    val mapping = Seq(("0xaaa", "0xbbb")).toDF("oldaddress", "newaddress")
    val out = Ingest.ovmRewrite(df, Schemas.FactoryPoolCreated, mapping).collect()
    assert(out.head.getAs[String]("pool") == "0xbbb")
  }
}
