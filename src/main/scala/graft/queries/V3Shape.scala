package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Ops

/** The reference's two signature relational pipelines, re-expressed over
  * the driver testdata so the DuckDB oracle can grade them:
  *
  *  - `v3_liquidity_distribution` — the exact shape of `createLiq`
  *    (reference v3/helpers/swap_math.py:25–71): two grouped-sum legs →
  *    full-outer join on tick → zero-fill → net → cumulative sum.
  *  - `v3_price_series_asof` — the exact shape of `getPriceSeries`
  *    (reference v3/helpers/pool_helpers.py:134–204): two independent
  *    resample legs → backward as-of join.
  *
  * The same code paths run against the real Uniswap event tables in
  * `graft.v3` (see Liquidity.scala / Series.scala); these testdata
  * doubles keep the *operators* under the correctness gate.
  */
object V3Shape {

  /** The orders→Nfp derivation shared by the lake-lifecycle rows s20
    * and s21 (one source of truth: both rows' DuckDB oracles encode
    * the same cents/modulo formulas — two copies would silently
    * desynchronize). s19 uses a deliberately different 1024-modulo
    * variant to fill the z-order plane. */
  private def nfpFromOrders(df: org.apache.spark.sql.DataFrame,
                            twoChains: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val k = col("o_orderkey")
    df.select(
      (if (twoChains)
        when(pmod(k, lit(2)) === 0, lit("ethereum")).otherwise(lit("base"))
      else lit("ethereum")).as("chain_name"),
      lit("IncreaseLiquidity").as("name"),
      concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
        .as("transaction_hash"),
      (lit(1000L) + pmod(k, lit(97))).as("block_number"),
      pmod(k, lit(13)).as("tx_index"),
      concat(lit("0xu"), col("o_custkey").cast("string"))
        .as("from_address"),
      col("o_custkey").cast("string").as("amount"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long")
        .cast("string").as("amount0"),
      pmod(k, lit(1000)).cast("string").as("amount1"),
      pmod(k, lit(997)).cast("string").as("tokenId"),
      pmod(k, lit(7)).as("log_index"))
  }
  import Relational.Q

  /** s13/s32 shared streaming fixture: three CDC change tranches over
    * orders (base load; updates + tombstones; later updates + late
    * inserts, including the re-insert of a tombstoned key), written
    * once per sf under the shared tranche cache. Returns the tranche
    * dir and the read schema (nfp + the `__del` tombstone flag). BOTH
    * rows drain the same tranche files and grade the same final
    * merged state against [[cdcMergedOracle]] — s13 through the Scala
    * `Streaming.upsertStream`, s32 through the pure-SQL
    * `writeStream.format("lake")` sink. */
  private def cdcChangeTranches(s: SparkSession, d: String)
      : (String, org.apache.spark.sql.types.StructType) = {
    import graft.v3.Schemas
    val orders = Tables.orders(s, d)
    def derive(df: org.apache.spark.sql.DataFrame,
               key: org.apache.spark.sql.Column, bump: Long,
               del: Boolean) = df.select(
      lit("ethereum").as("chain_name"),
      lit("IncreaseLiquidity").as("name"),
      concat(lit("0xtx"), key.cast("string")).as("transaction_hash"),
      (lit(1000L) + pmod(key, lit(97))).as("block_number"),
      pmod(key, lit(13)).as("tx_index"),
      concat(lit("0xu"), col("o_custkey").cast("string"))
        .as("from_address"),
      col("o_custkey").cast("string").as("amount"),
      (floor(col("o_totalprice") * 100 + 0.5).cast("long") + bump)
        .cast("string").as("amount0"),
      pmod(key, lit(1000)).cast("string").as("amount1"),
      pmod(key, lit(997)).cast("string").as("tokenId"),
      pmod(key, lit(7)).as("log_index"),
      lit(del).as("__del"))
    val k = col("o_orderkey")
    val srcDir = Llm.sharedTranchesFor(d, "cdc-changes-v1") { sd =>
      Llm.writeTranches(sd, Seq(
        derive(orders, k, 0L, del = false),
        derive(orders.filter(pmod(k, lit(10)) === 0 &&
            pmod(k, lit(97)) =!= 0), k, 100L, del = false)
          .unionByName(derive(orders.filter(pmod(k, lit(97)) === 0),
            k, 0L, del = true)),
        derive(orders.filter(pmod(k, lit(15)) === 0), k, 7L,
            del = false)
          .unionByName(derive(orders.filter(pmod(k, lit(90)) === 0),
            k + 10000000L, 0L, del = false))))
    }
    val schema = org.apache.spark.sql.types.StructType(
      Schemas.nfp.fields :+ org.apache.spark.sql.types.StructField(
        "__del", org.apache.spark.sql.types.BooleanType, nullable = true))
    (srcDir, schema)
  }

  /** The graded aggregate over the CDC-merged lake state — identical
    * for s13 and s32 so both sit under the SAME oracle recomputation. */
  private def cdcMergedAggregate(lake: graft.v3.Lake): DataFrame =
    lake.read(graft.v3.Schemas.Nfp)
      .groupBy(col("log_index"))
      .agg(count(lit(1)).as("n"),
        sum(col("amount0").cast("long")).as("sum_a0"),
        sum(when(length(col("transaction_hash")) >= 12, 1L)
          .otherwise(0L)).as("n_inserted"))

  private val cdcMergedOracle: String =
    """WITH base AS (SELECT o_orderkey AS kk, o_custkey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |fin0 AS (SELECT kk, CASE
      |    WHEN kk % 15 = 0 THEN cents + 7
      |    WHEN kk % 10 = 0 AND kk % 97 <> 0 THEN cents + 100
      |    ELSE cents END AS a0
      |  FROM base WHERE kk % 97 <> 0 OR kk % 15 = 0),
      |ins AS (SELECT kk + 10000000 AS kk, cents AS a0
      |  FROM base WHERE kk % 90 = 0),
      |fin AS (SELECT kk, a0, '0xtx' || CAST(kk AS VARCHAR) AS tx
      |  FROM fin0
      |  UNION ALL SELECT kk, a0, '0xtx' || CAST(kk AS VARCHAR) FROM ins)
      |SELECT CAST(kk % 7 AS BIGINT) AS log_index,
      |  count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0,
      |  CAST(sum(CASE WHEN length(tx) >= 12 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_inserted
      |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin

  /** s30/s33 shared fixture — a lake whose history forces the
    * row-grain enrichment to PROVE itself: two interleaved appends
    * (every file spans the whole key range, so the upsert rewrite
    * drags unchanged rows through the file-grain feed) followed by ONE
    * upsert commit updating +100 cents on k%10==0 below 2000, deleting
    * k%10==5 below 2000 and inserting fresh 0xnw keys from the k%17==0
    * world. Returns (lake, v0, v1) bracketing the rewrite. Both rows
    * grade against [[cdcEnrichedOracle]] — s30 through the 4-arg
    * `table_changes` TVF, s33 through the enriched `lake-changes`
    * stream. */
  private def cdcEnrichedFixture(s: SparkSession, d: String, root: String)
      : (graft.v3.Lake, Long, Long) = {
    import graft.v3.{Lake, Schemas}
    val orders = Tables.orders(s, d)
    val k = col("o_orderkey")
    def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
    val lake = new Lake(s, root)
    lake.dropTable(Schemas.Nfp)
    lake.append(derive(orders.filter(pmod(k, lit(2)) === 0))
      .coalesce(1), Schemas.Nfp)
    lake.append(derive(orders.filter(pmod(k, lit(2)) === 1))
      .coalesce(1), Schemas.Nfp)
    val v0 = lake.latestCommitVersion(Schemas.Nfp).get
    val upd = derive(orders.filter(k < 2000 && pmod(k, lit(10)) === 0))
      .withColumn("amount0",
        (col("amount0").cast("long") + 100).cast("string"))
      .withColumn("_del", lit(false))
    val del = derive(orders.filter(k < 2000 && pmod(k, lit(10)) === 5))
      .withColumn("_del", lit(true))
    val ins = derive(orders.filter(pmod(k, lit(17)) === 0))
      .withColumn("transaction_hash",
        regexp_replace(col("transaction_hash"), "^0xtx", "0xnw"))
      .withColumn("_del", lit(false))
    lake.upsert(upd.unionByName(del).unionByName(ins), Schemas.Nfp,
      Seq("chain_name", "transaction_hash"),
      deleteCol = Some("_del"), retain = true)
    val v1 = lake.latestCommitVersion(Schemas.Nfp).get
    (lake, v0, v1)
  }

  private val cdcEnrichedOracle: String =
    """WITH base AS (SELECT o_orderkey AS k,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |ch AS (
      |  SELECT 'update_preimage' AS ct, k % 7 AS li, cents AS a0
      |    FROM base WHERE k < 2000 AND k % 10 = 0
      |  UNION ALL
      |  SELECT 'update_postimage', k % 7, cents + 100
      |    FROM base WHERE k < 2000 AND k % 10 = 0
      |  UNION ALL
      |  SELECT 'delete', k % 7, cents
      |    FROM base WHERE k < 2000 AND k % 10 = 5
      |  UNION ALL
      |  SELECT 'insert', k % 7, cents FROM base WHERE k % 17 = 0)
      |SELECT ct AS _change_type, CAST(li AS BIGINT) AS log_index,
      |  count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
      |FROM ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("v3_liquidity_distribution",
      ((s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val lower = li.groupBy(col("l_partkey").as("tick"))
          .agg(sum(col("l_quantity")).as("liq_lower"))
        val upper = li.groupBy(col("l_suppkey").as("tick"))
          .agg((-sum(col("l_quantity"))).as("liq_upper"))
        val net = Ops.outerCombine(lower, upper, Seq("tick"))
          .withColumn("net_liq", col("liq_lower") + col("liq_upper"))
        Ops.cumSum(net, col("net_liq"), order = Seq(col("tick")),
            partition = Seq(), out = "liquidity")
          .select(col("tick"), col("net_liq"), col("liquidity"))
          .orderBy(col("tick"))
      }): Q,
      Some("""WITH lo AS (SELECT l_partkey AS tick, sum(l_quantity) AS liq_lower
        |  FROM lineitem GROUP BY 1),
        |hi AS (SELECT l_suppkey AS tick, -sum(l_quantity) AS liq_upper
        |  FROM lineitem GROUP BY 1),
        |net AS (SELECT coalesce(lo.tick, hi.tick) AS tick,
        |  coalesce(liq_lower, 0) + coalesce(liq_upper, 0) AS net_liq
        |  FROM lo FULL JOIN hi ON lo.tick = hi.tick)
        |SELECT tick, net_liq,
        |  sum(net_liq) OVER (ORDER BY tick
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS liquidity
        |FROM net ORDER BY tick""".stripMargin)),

    ("v3_price_series_asof",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val legA = ev
          .groupBy(Ops.bucketUs(col("ts_us"), 900).as("bucket_s"))
          .agg(max(col("ts_us")).as("last_event_us"))
        val legB = Ops.lastPerKey(
            ev.filter(col("event_type") === "purchase")
              .withColumn("bucket_s", Ops.bucketUs(col("ts_us"), 900)),
            keys = Seq(col("bucket_s")), order = Seq(col("ts_us"), col("event_id")))
          .select(col("bucket_s"), col("value").as("last_purchase"))
        Ops.asofJoin(legA, legB, on = "bucket_s", by = Seq(),
            valueCols = Seq("last_purchase"))
          .select(col("bucket_s"), col("last_event_us"), col("last_purchase"))
          .orderBy(col("bucket_s"))
      }): Q,
      Some("""WITH a AS (SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s,
        |  max(epoch_us(ts)) AS last_event_us FROM events GROUP BY 1),
        |b AS (SELECT bucket_s, value AS last_purchase FROM
        |  (SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s, value,
        |    row_number() OVER (PARTITION BY (epoch_us(ts) // 900000000) * 900
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |   FROM events WHERE event_type = 'purchase') WHERE rn = 1)
        |SELECT a.bucket_s, a.last_event_us, b.last_purchase
        |FROM a ASOF LEFT JOIN b ON a.bucket_s >= b.bucket_s
        |ORDER BY a.bucket_s""".stripMargin)),

    // the gas=true shape of getPriceSeries (pool_helpers.py:160–190):
    // dedup to one row per timestamp, then per bucket the last value by
    // time AND the Polars-parity nearest-interpolation median, as-of
    // joined onto the chain-wide bucket leg
    ("v3_price_series_gas",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val legA = ev
          .groupBy(Ops.bucketUs(col("ts_us"), 900).as("bucket_s"))
          .agg(max(col("ts_us")).as("last_event_us"))
        val perTs = Ops.lastPerKey(
            ev.filter(col("event_type") === "purchase")
              .select(col("ts_us"), col("event_id"),
                floor(col("value") * 100 + 0.5).cast("long").as("vc")),
            keys = Seq(col("ts_us")), order = Seq(col("event_id")))
          .withColumn("bucket_s", Ops.bucketUs(col("ts_us"), 900))
        val legB = perTs.groupBy(col("bucket_s"))
          .agg(max_by(col("vc"), col("ts_us")).as("last_value_c"),
            Ops.quantileNearestAgg(col("vc")).as("med_value_c"))
        Ops.asofJoin(legA, legB, on = "bucket_s", by = Seq(),
            valueCols = Seq("last_value_c", "med_value_c"))
          .select(col("bucket_s"), col("last_event_us"),
            col("last_value_c"), col("med_value_c"))
          .orderBy(col("bucket_s"))
      }): Q,
      Some("""WITH e AS (SELECT epoch_us(ts) AS ts_us, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT ts_us, value FROM (SELECT *, row_number() OVER
        |  (PARTITION BY ts_us ORDER BY event_id DESC) AS rn FROM e)
        |  WHERE rn = 1),
        |b AS (SELECT (ts_us // 900000000) * 900 AS bucket_s, ts_us,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM p),
        |g AS (SELECT bucket_s, max_by(vc, ts_us) AS last_value_c,
        |  list_sort(list(vc))[len(list(vc)) // 2 + 1] AS med_value_c
        |  FROM b GROUP BY bucket_s),
        |a AS (SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s,
        |  max(epoch_us(ts)) AS last_event_us FROM events GROUP BY 1)
        |SELECT a.bucket_s AS bucket_s, a.last_event_us,
        |  g.last_value_c, g.med_value_c
        |FROM a ASOF LEFT JOIN g ON a.bucket_s >= g.bucket_s
        |ORDER BY a.bucket_s""".stripMargin)),

    // the notebook workload (Crosschain_Liquidity_GIF.ipynb cell 12 →
    // Analytics.liquiditySurface): per-frame liquidity distributions in
    // ONE distributed plan — delta → first-visible-frame assignment
    // (the SearchSorted upper-bound expression; the oracle states the
    // same rule declaratively as min(frame_id) WHERE bound > as_of) →
    // frame×tick grid → the two cumulative windows. Every delta is an
    // integral double, so all sums are exact in any fold order
    ("v3_liquidity_surface",
      ((s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val mb = li.select(
          col("l_quantity").as("amount"),
          when(col("l_returnflag") === "R", lit(-1)).otherwise(lit(1))
            .as("type_of_event"),
          col("l_partkey").as("tick_lower"),
          col("l_suppkey").as("tick_upper"),
          col("l_orderkey").cast("double").as("as_of"))
        import s.implicits._
        val frames = Seq((0L, 1500.0), (1L, 15000.0), (2L, 150000.0),
            (3L, 1.5e9)).toDF("frame_id", "as_of")
        graft.v3.Analytics.liquiditySurface(mb, frames)
          .orderBy(col("frame_id"), col("tick"))
      }): Q,
      Some("""WITH mb AS (SELECT l_quantity AS amount,
        |    CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END AS type_of_event,
        |    l_partkey AS tick_lower, l_suppkey AS tick_upper,
        |    CAST(l_orderkey AS DOUBLE) AS as_of
        |  FROM lineitem),
        |deltas AS (
        |  SELECT as_of, tick_lower AS tick, amount * type_of_event AS delta
        |  FROM mb
        |  UNION ALL
        |  SELECT as_of, tick_upper AS tick, -(amount * type_of_event)
        |  FROM mb),
        |frames AS (SELECT CAST(frame_id AS BIGINT) AS frame_id, bound
        |  FROM (VALUES (0, 1500.0), (1, 15000.0), (2, 150000.0),
        |    (3, 1500000000.0)) AS t(frame_id, bound)),
        |fr AS (SELECT d.tick, d.delta,
        |    (SELECT min(f.frame_id) FROM frames f WHERE f.bound > d.as_of)
        |      AS frame_id
        |  FROM deltas d),
        |framed AS (SELECT frame_id, tick, sum(delta) AS delta FROM fr
        |  WHERE frame_id IS NOT NULL GROUP BY 1, 2),
        |ticks AS (SELECT DISTINCT tick FROM framed),
        |grid AS (SELECT f.frame_id, t.tick, coalesce(fd.delta, 0.0) AS delta
        |  FROM frames f CROSS JOIN ticks t
        |  LEFT JOIN framed fd ON fd.frame_id = f.frame_id AND fd.tick = t.tick),
        |g1 AS (SELECT frame_id, tick,
        |  sum(delta) OVER (PARTITION BY tick ORDER BY frame_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS net_at_frame
        |  FROM grid)
        |SELECT frame_id, tick,
        |  sum(net_at_frame) OVER (PARTITION BY frame_id ORDER BY tick
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS liquidity
        |FROM g1 ORDER BY frame_id, tick""".stripMargin)),

    // the reference's LAST data-flow family (allium.py:161–211): raw
    // NFT-position-manager logs land in the lake through the REAL
    // ingest loop (fixture connector → segment-capped pulls →
    // partitioned appends), then Nfp.attributePositions runs the
    // reference's warehouse-side join distributed: equi on
    // (tx, amount, amount0, amount1) + the strict log-index theta.
    // Planted defects: every 3rd core event has no manager log
    // (direct pool interaction), every 11th manager log echoes a
    // different amount1 (equi drop), every 13th shares the core's
    // log_index (theta drop). The oracle re-derives both sides from
    // orders and replays the join — the ingest path must be lossless
    // for the row to hash-match
    ("s10_nfp_ingest",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Nfp, Schemas}
        import graft.v3.ingest.{Ingest, ParquetFixtureConnector}
        val orders = Tables.orders(s, d)
        val txHash = concat(lit("0xtx"), col("o_orderkey").cast("string"))
        val amount = col("o_custkey").cast("string")
        val amount0 = floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .cast("string")
        val mb = orders.select(
          lit("ethereum").as("chain_name"),
          concat(lit("0xpool"), pmod(col("o_orderkey"), lit(5))
            .cast("string")).as("address"),
          txHash.as("transaction_hash"),
          (lit(1000L) + pmod(col("o_orderkey"), lit(97))).as("block_number"),
          pmod(col("o_orderkey"), lit(7)).as("log_index"),
          amount.as("amount"), amount0.as("amount0"),
          pmod(col("o_orderkey"), lit(1000)).cast("string").as("amount1"),
          (-pmod(col("o_orderkey"), lit(100))).cast("string").as("tick_lower"),
          (pmod(col("o_orderkey"), lit(100)) + 60).cast("string")
            .as("tick_upper"))
        val nfpFix = orders
          .filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
          .select(
            lit("ethereum").as("chain_name"),
            when(pmod(col("o_orderkey"), lit(2)) === 0,
              lit("IncreaseLiquidity")).otherwise(lit("DecreaseLiquidity"))
              .as("name"),
            txHash.as("transaction_hash"),
            (lit(1000L) + pmod(col("o_orderkey"), lit(97))).as("block_number"),
            pmod(col("o_orderkey"), lit(13)).as("tx_index"),
            concat(lit("0xu"), col("o_custkey").cast("string"))
              .as("from_address"),
            amount.as("amount"), amount0.as("amount0"),
            (pmod(col("o_orderkey"), lit(1000)) +
              when(pmod(col("o_orderkey"), lit(11)) === 0, 1L).otherwise(0L))
              .cast("string").as("amount1"),
            pmod(col("o_orderkey"), lit(997)).cast("string").as("tokenId"),
            (pmod(col("o_orderkey"), lit(7)) +
              when(pmod(col("o_orderkey"), lit(13)) === 0, 0L).otherwise(1L))
              .as("log_index"))
        // land the fixture as the "remote warehouse", then ingest it
        // through the real segment-capped loop into a fresh lake
        val sfName = Llm.sfCacheKey(d)
        val fixRoot = s"/tmp/graft-nfp-src/$sfName"
        nfpFix.write.mode("overwrite")
          .parquet(s"$fixRoot/${Schemas.Nfp}/example.parquet")
        val lake = new Lake(s, s"/tmp/graft-nfp-lake/$sfName")
        lake.dropTable(Schemas.Nfp)
        val connector = new ParquetFixtureConnector(s, fixRoot)
        val tgt = math.max(nfpFix.count() / 3, 1L)
        Ingest.updateTable(lake, connector, pool = "0xpool0",
          chain = "ethereum", table = Schemas.Nfp, tgtMaxRows = tgt,
          capBlock = None, ovmMapping = None)
        Nfp.attributePositions(
            lake.read(Schemas.Nfp).filter(col("chain_name") === "ethereum"),
            mb)
          .orderBy(col("transaction_hash"))
      }): Q,
      Some("""WITH mb AS (SELECT
        |    '0xtx' || CAST(o_orderkey AS VARCHAR) AS transaction_hash,
        |    '0xpool' || CAST(o_orderkey % 5 AS VARCHAR) AS address,
        |    CAST(o_custkey AS VARCHAR) AS amount,
        |    CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
        |      AS amount0,
        |    CAST(o_orderkey % 1000 AS VARCHAR) AS amount1,
        |    CAST(-(o_orderkey % 100) AS VARCHAR) AS tick_lower,
        |    CAST(o_orderkey % 100 + 60 AS VARCHAR) AS tick_upper,
        |    o_orderkey % 7 AS core_log_index
        |  FROM orders),
        |nfp AS (SELECT
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'IncreaseLiquidity'
        |         ELSE 'DecreaseLiquidity' END AS name,
        |    'ethereum' AS chain_name,
        |    '0xtx' || CAST(o_orderkey AS VARCHAR) AS transaction_hash,
        |    1000 + (o_orderkey % 97) AS block_number,
        |    o_orderkey % 13 AS tx_index,
        |    '0xu' || CAST(o_custkey AS VARCHAR) AS from_address,
        |    CAST(o_custkey AS VARCHAR) AS amount,
        |    CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
        |      AS amount0,
        |    CAST(o_orderkey % 1000 + CASE WHEN o_orderkey % 11 = 0
        |      THEN 1 ELSE 0 END AS VARCHAR) AS amount1,
        |    CAST(o_orderkey % 997 AS VARCHAR) AS "tokenId",
        |    (o_orderkey % 7) + CASE WHEN o_orderkey % 13 = 0
        |      THEN 0 ELSE 1 END AS log_index
        |  FROM orders WHERE o_orderkey % 3 <> 0)
        |SELECT n.name, n.chain_name, n.transaction_hash, n.block_number,
        |  n.tx_index, n.from_address, n.amount, n.amount0, n.amount1,
        |  n."tokenId", m.address, m.tick_lower, m.tick_upper
        |FROM nfp n JOIN mb m ON n.transaction_hash = m.transaction_hash
        |  AND n.amount = m.amount AND n.amount0 = m.amount0
        |  AND n.amount1 = m.amount1 AND n.log_index > m.core_log_index
        |ORDER BY n.transaction_hash""".stripMargin)),

    // manifest-based TIME TRAVEL (the exact-reproducibility need every
    // training-data lake hits): two ingest waves each commit a
    // snapshot; each pinned read must reproduce the table EXACTLY as
    // of its commit — wave 1's aggregate unchanged by wave 2's
    // appends. The oracle re-derives both waves from orders and
    // aggregates each prefix; the manifest machinery must name
    // precisely the committed files for the hashes to match
    ("s11_time_travel",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        def wave(pred: org.apache.spark.sql.Column) =
          orders.filter(pred).select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), col("o_orderkey").cast("string"))
            .as("transaction_hash"),
          (lit(1000L) + pmod(col("o_orderkey"), lit(97))).as("block_number"),
          pmod(col("o_orderkey"), lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string")
            .as("amount0"),
          pmod(col("o_orderkey"), lit(1000)).cast("string").as("amount1"),
          pmod(col("o_orderkey"), lit(997)).cast("string").as("tokenId"),
          pmod(col("o_orderkey"), lit(7)).as("log_index"))
        val sfName = Llm.sfCacheKey(d)
        val lake = new Lake(s, s"/tmp/graft-tt-lake/$sfName")
        lake.dropTable(Schemas.Nfp)
        lake.append(wave(pmod(col("o_orderkey"), lit(2)) === 0), Schemas.Nfp)
        val v1 = lake.snapshot(Schemas.Nfp)
        lake.append(wave(pmod(col("o_orderkey"), lit(2)) === 1), Schemas.Nfp)
        val v2 = lake.snapshot(Schemas.Nfp)
        def digest(df: org.apache.spark.sql.DataFrame, tag: Long) = df
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_price_c"),
            min(col("transaction_hash")).as("min_tx"),
            max(col("transaction_hash")).as("max_tx"))
          .withColumn("version", lit(tag))
        // tags are ORDINALS, not the snapshot ids: snapshot numbering
        // is monotone across dropTable+recreate (the never-reuse
        // high-water survives the drop), so absolute ids grow with
        // every rerun against this persistent /tmp lake
        digest(lake.readAt(Schemas.Nfp, v1), 1L)
          .unionByName(digest(lake.readAt(Schemas.Nfp, v2), 2L))
          // the INCREMENTAL leg (tagged 3): rows appended between the
          // two snapshots via manifest set-difference — must equal
          // wave 2 exactly for the oracle to hash-match
          .unionByName(digest(
            lake.readSince(Schemas.Nfp, v1, upTo = Some(v2)), 3L))
          .select(col("version"), col("n"), col("sum_price_c"),
            col("min_tx"), col("max_tx"))
          .orderBy(col("version"))
      }): Q,
      Some("""WITH w AS (SELECT o_orderkey,
        |    '0xtx' || CAST(o_orderkey AS VARCHAR) AS transaction_hash,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders),
        |a AS (SELECT 1 AS version, count(*) AS n,
        |    sum(price_c) AS sum_price_c,
        |    min(transaction_hash) AS min_tx, max(transaction_hash) AS max_tx
        |  FROM w WHERE o_orderkey % 2 = 0),
        |b AS (SELECT 2 AS version, count(*) AS n,
        |    sum(price_c) AS sum_price_c,
        |    min(transaction_hash) AS min_tx, max(transaction_hash) AS max_tx
        |  FROM w),
        |inc AS (SELECT 3 AS version, count(*) AS n,
        |    sum(price_c) AS sum_price_c,
        |    min(transaction_hash) AS min_tx, max(transaction_hash) AS max_tx
        |  FROM w WHERE o_orderkey % 2 = 1)
        |SELECT CAST(version AS BIGINT) AS version, n,
        |  CAST(sum_price_c AS BIGINT) AS sum_price_c, min_tx, max_tx
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM b
        |  UNION ALL SELECT * FROM inc)
        |ORDER BY version""".stripMargin)),

    // keyed UPSERT — the CDC-apply operator (MERGE INTO semantics):
    // one batch updates every 10th key, inserts shifted copies of
    // every 90th, deletes every 97th; the lake rewrite is one
    // anti-join over only the footer-range-touched files (file-grain
    // copy-on-write). The oracle derives the post-merge state directly
    // from orders — replace/insert/delete must all have landed
    // exactly for the grouped digest to hash-match
    ("s12_upsert_cdc",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        def derive(df: org.apache.spark.sql.DataFrame,
                   key: org.apache.spark.sql.Column,
                   bump: Long) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), key.cast("string")).as("transaction_hash"),
          (lit(1000L) + pmod(key, lit(97))).as("block_number"),
          pmod(key, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") + bump)
            .cast("string").as("amount0"),
          pmod(key, lit(1000)).cast("string").as("amount1"),
          pmod(key, lit(997)).cast("string").as("tokenId"),
          pmod(key, lit(7)).as("log_index"))
        val k = col("o_orderkey")
        val sfName = Llm.sfCacheKey(d)
        val lake = new Lake(s, s"/tmp/graft-up-lake/$sfName")
        lake.dropTable(Schemas.Nfp)
        lake.append(derive(orders, k, 0L), Schemas.Nfp)
        val batch = derive(orders.filter(pmod(k, lit(10)) === 0 &&
              pmod(k, lit(97)) =!= 0), k, 100L)
            .withColumn("__del", lit(false))
          .unionByName(derive(orders.filter(pmod(k, lit(97)) === 0), k, 0L)
            .withColumn("__del", lit(true)))
          .unionByName(derive(orders.filter(pmod(k, lit(90)) === 0),
              k + 10000000L, 0L)
            .withColumn("__del", lit(false)))
        lake.upsert(batch, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"), deleteCol = Some("__del"))
        lake.read(Schemas.Nfp)
          .groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"),
            sum(when(length(col("transaction_hash")) >= 12, 1L)
              .otherwise(0L)).as("n_inserted"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k, o_custkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |survivors AS (SELECT k, cents + CASE WHEN k % 10 = 0
        |    AND k % 97 <> 0 THEN 100 ELSE 0 END AS a0
        |  FROM base WHERE k % 97 <> 0),
        |ins AS (SELECT k + 10000000 AS k, cents AS a0
        |  FROM base WHERE k % 90 = 0),
        |fin AS (SELECT k, a0, '0xtx' || CAST(k AS VARCHAR) AS tx
        |  FROM survivors
        |  UNION ALL SELECT k, a0, '0xtx' || CAST(k AS VARCHAR) FROM ins)
        |SELECT CAST(k % 7 AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0,
        |  CAST(sum(CASE WHEN length(tx) >= 12 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_inserted
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAMING CDC apply — the standard streaming-lake workload:
    // three change micro-batches (base load; updates+tombstones;
    // later updates + late inserts, including the re-insert of a
    // tombstoned key) flow through Streaming.upsertStream into the
    // lake; replay safety is idempotency, not a sink (an upsert batch
    // is a fixpoint — UpsertStreamSpec applies one twice). The oracle
    // derives the final merged state directly: last-writer-wins
    // REPLACE semantics across the batch sequence must all land for
    // the grouped digest to hash-match
    ("s13_upsert_streamed",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val sfName = Llm.sfCacheKey(d)
        val lake = new Lake(s, s"/tmp/graft-upstream-lake/$sfName")
        lake.dropTable(Schemas.Nfp)
        val (srcDir, schema) = cdcChangeTranches(s, d)
        // checkpoint scoped to the run's temp tree (deleted on exit,
        // like every other streamed row); the lake dir persists per sf
        Llm.streamTempRunFor("graft-cdc-ck") { base =>
          val src = graft.streaming.Streaming.fileStream(s, srcDir, schema,
            maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.upsertStream(src, lake,
            Schemas.Nfp, keys = Seq("chain_name", "transaction_hash"),
            orderCols = Seq("block_number", "log_index"),
            deleteCol = "__del", checkpointDir = s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          cdcMergedAggregate(lake)
        }.orderBy(col("log_index"))
      }): Q,
      Some(cdcMergedOracle)),

    // RETENTION + VACUUM — time travel that SURVIVES rewrites: load,
    // snapshot v1, retain-mode upsert (replace/insert/delete), snapshot
    // v2, then read v1 back — its aggregate must equal the ORIGINAL
    // load even though the upsert rewrote the files (readAt resolves
    // the retired originals); v2 must equal the merged state. The row
    // then vacuums v1 away (manifest + its retired file — require'd
    // inside the row, so a misbehaving vacuum fails the gate) after
    // eagerly pinning the v1 aggregate. The oracle derives both
    // states straight from orders.
    ("s14_retention_vacuum",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        def derive(df: org.apache.spark.sql.DataFrame,
                   key: org.apache.spark.sql.Column,
                   bump: Long) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), key.cast("string")).as("transaction_hash"),
          (lit(1000L) + pmod(key, lit(97))).as("block_number"),
          pmod(key, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") + bump)
            .cast("string").as("amount0"),
          pmod(key, lit(1000)).cast("string").as("amount1"),
          pmod(key, lit(997)).cast("string").as("tokenId"),
          pmod(key, lit(7)).as("log_index"))
        val k = col("o_orderkey")
        val lake = new Lake(s, s"/tmp/graft-ret-lake/${Llm.sfCacheKey(d)}")
        lake.dropTable(Schemas.Nfp)
        lake.append(derive(orders, k, 0L), Schemas.Nfp)
        val v1 = lake.snapshot(Schemas.Nfp)
        val batch = derive(orders.filter(pmod(k, lit(10)) === 0 &&
              pmod(k, lit(97)) =!= 0), k, 100L)
            .withColumn("__del", lit(false))
          .unionByName(derive(orders.filter(pmod(k, lit(97)) === 0), k, 0L)
            .withColumn("__del", lit(true)))
          .unionByName(derive(orders.filter(pmod(k, lit(90)) === 0),
              k + 10000000L, 0L)
            .withColumn("__del", lit(false)))
        lake.upsert(batch, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"),
          deleteCol = Some("__del"), retain = true)
        val v2 = lake.snapshot(Schemas.Nfp)
        def digest(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.groupBy(col("log_index"))
            .agg(count(lit(1)).as("n"),
              sum(col("amount0").cast("long")).as("sum_a0"))
            .withColumn("version", lit(tag))
        // pin the v1 aggregate EAGERLY (localCheckpoint executes it)
        // before vacuum expires the version it reads from
        val pre = digest(lake.readAt(Schemas.Nfp, v1), "v1_pre")
          .localCheckpoint()
        val vs = lake.vacuum(Schemas.Nfp, keepLast = 1)
        // r16 lifecycle: the upsert is a DATA-CHANGING commit still
        // inside the retained CDC window, so its swapped-out files
        // stay pinned even after the v1 snapshot expires — an
        // in-window lake-changes consumer must never be starved by a
        // vacuum (the published formats' CDF-retention coupling)
        require(vs.manifestsDeleted == 1 && vs.filesDeleted == 0,
          s"vacuum must expire v1 but keep commit-log-pinned retired " +
            s"files (CDC replayable window): $vs")
        // roll the window (tiny metadata-only checkpoint commits under
        // a shrunk floor) - NOW the files free
        lake.setTableProperties(Schemas.Nfp,
          Map("manifest.minRetainedCommits" -> "1"))
        (0 until 3).foreach(_ => lake.refreshManifest(Schemas.Nfp))
        val vs2 = lake.vacuum(Schemas.Nfp, keepLast = 1)
        require(vs2.filesDeleted >= 1,
          s"retention expired the rewrite commit, vacuum must free " +
            s"its retired file(s): $vs2")
        pre.unionByName(digest(lake.readAt(Schemas.Nfp, v2), "v2_post"))
          .select(col("version"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("version"), col("log_index"))
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |pre AS (SELECT 'v1_pre' AS version, CAST(k % 7 AS BIGINT)
        |    AS log_index, count(*) AS n, CAST(sum(cents) AS BIGINT)
        |    AS sum_a0
        |  FROM base GROUP BY 2),
        |survivors AS (SELECT k, cents + CASE WHEN k % 10 = 0
        |    AND k % 97 <> 0 THEN 100 ELSE 0 END AS a0
        |  FROM base WHERE k % 97 <> 0),
        |ins AS (SELECT k + 10000000 AS k, cents AS a0
        |  FROM base WHERE k % 90 = 0),
        |fin AS (SELECT k, a0 FROM survivors
        |  UNION ALL SELECT k, a0 FROM ins),
        |post AS (SELECT 'v2_post' AS version, CAST(k % 7 AS BIGINT)
        |    AS log_index, count(*) AS n, CAST(sum(a0) AS BIGINT)
        |    AS sum_a0
        |  FROM fin GROUP BY 2)
        |SELECT version, log_index, n, sum_a0 FROM pre
        |UNION ALL SELECT version, log_index, n, sum_a0 FROM post
        |ORDER BY version, log_index""".stripMargin)),

    // KEY-CLUSTERED COMPACTION + pruned CDC — the composition that
    // makes file-grain upserts prune on real tables: four interleaved
    // appends give every file a full-width key range (random-hash
    // reality), clusterCompact rewrites the chain into tight disjoint
    // ranges, and the narrow update batch then touches a strict
    // subset of the files (require'd in-row — a non-pruning rewrite
    // fails the gate). The oracle derives the final merged state
    // straight from orders; the row hash-matches only if the
    // cluster rewrite preserved every row AND the pruned merge
    // applied exactly.
    ("s15_cluster_compact",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        def derive(df: org.apache.spark.sql.DataFrame, bump: Long) =
          df.select(
            lit("ethereum").as("chain_name"),
            lit("IncreaseLiquidity").as("name"),
            concat(lit("0xtx"), lpad(col("o_orderkey").cast("string"),
              12, "0")).as("transaction_hash"),
            (lit(1000L) + pmod(col("o_orderkey"), lit(97)))
              .as("block_number"),
            pmod(col("o_orderkey"), lit(13)).as("tx_index"),
            concat(lit("0xu"), col("o_custkey").cast("string"))
              .as("from_address"),
            col("o_custkey").cast("string").as("amount"),
            (floor(col("o_totalprice") * 100 + 0.5).cast("long") + bump)
              .cast("string").as("amount0"),
            pmod(col("o_orderkey"), lit(1000)).cast("string").as("amount1"),
            pmod(col("o_orderkey"), lit(997)).cast("string").as("tokenId"),
            pmod(col("o_orderkey"), lit(7)).as("log_index"))
        val k = col("o_orderkey")
        val lake = new Lake(s, s"/tmp/graft-cluster-lake/${Llm.sfCacheKey(d)}")
        lake.dropTable(Schemas.Nfp)
        // interleaved appends: every file spans the whole key range
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(pmod(k, lit(4)) === j), 0L)
            .coalesce(1), Schemas.Nfp))
        val bytes = lake.fileInventory(Schemas.Nfp).map(_._3).sum
        require(lake.clusterCompact(Schemas.Nfp,
          targetBytes = math.max(1L, bytes / 6),
          clusterBy = Seq("transaction_hash")) == 1,
          "cluster rewrite did not run")
        // narrow contiguous-key batch: must touch a strict file subset
        val batch = derive(orders.filter(k < 500 && pmod(k, lit(10)) === 0),
          100L)
        val st = lake.upsert(batch, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"))
        require(st.chainFiles >= 4 && st.touchedFiles < st.chainFiles,
          s"clustered pruning failed - narrow batch touched $st")
        lake.read(Schemas.Nfp)
          .groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (SELECT k, cents + CASE WHEN k < 500 AND k % 10 = 0
        |    THEN 100 ELSE 0 END AS a0
        |  FROM base)
        |SELECT CAST(k % 7 AS BIGINT) AS log_index, count(*) AS n,
        |  CAST(sum(a0) AS BIGINT) AS sum_a0
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin)),

    // QUERY-SIDE FILE SKIPPING — the data-skipping scan: four
    // key-disjoint waves give each file a tight footer range, then a
    // key-range read must SCHEDULE only the overlapping files
    // (require'd in-row — a non-pruning plan fails the gate) while
    // returning exactly read+filter. The oracle recomputes the range
    // aggregate straight from orders; zero-padded tx hashes make
    // string range = numeric range.
    ("s16_read_pruned",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        def derive(df: org.apache.spark.sql.DataFrame) =
          df.select(
            lit("ethereum").as("chain_name"),
            lit("IncreaseLiquidity").as("name"),
            concat(lit("0xtx"), lpad(col("o_orderkey").cast("string"),
              12, "0")).as("transaction_hash"),
            (lit(1000L) + pmod(col("o_orderkey"), lit(97)))
              .as("block_number"),
            pmod(col("o_orderkey"), lit(13)).as("tx_index"),
            concat(lit("0xu"), col("o_custkey").cast("string"))
              .as("from_address"),
            col("o_custkey").cast("string").as("amount"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .cast("string").as("amount0"),
            pmod(col("o_orderkey"), lit(1000)).cast("string").as("amount1"),
            pmod(col("o_orderkey"), lit(997)).cast("string").as("tokenId"),
            pmod(col("o_orderkey"), lit(7)).as("log_index"))
        val k = col("o_orderkey")
        val mx = orders.agg(max(k)).first().getLong(0)
        val q = mx / 4 + 1
        val lake = new Lake(s, s"/tmp/graft-prune-lake/${Llm.sfCacheKey(d)}")
        lake.dropTable(Schemas.Nfp)
        // key-disjoint waves: each file carries a tight disjoint range
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q && k < (j + 1) * q))
            .coalesce(1), Schemas.Nfp))
        def pad(v: Long) = f"0xtx$v%012d"
        // range inside wave 1: the planner must skip the other files
        val (df, st) = lake.readRange(Schemas.Nfp, "transaction_hash",
          pad(q), pad(2 * q - 1))
        require(st.files >= 4 && st.scanned < st.files,
          s"range read did not prune - $st")
        // point lookups: a live key schedules its file; a key beyond
        // every range schedules nothing
        val (_, stHit) = lake.readKeys(Schemas.Nfp, "transaction_hash",
          Seq(pad(1)))
        require(stHit.scanned <= 1, s"point hit over-scanned - $stHit")
        val (_, stGap) = lake.readKeys(Schemas.Nfp, "transaction_hash",
          Seq("0xtz" + "9" * 12))
        require(stGap.scanned == 0, s"out-of-range key scanned - $stGap")
        df.groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""WITH mxq AS (SELECT max(o_orderkey) // 4 + 1 AS q FROM orders)
        |SELECT CAST(o_orderkey % 7 AS BIGINT) AS log_index,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey >= q AND o_orderkey < 2 * q
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCHEMA EVOLUTION — create → write narrow (int32/float files) →
    // widen + add a column → write wide → upsert from an OLD producer
    // (no lang column) that updates v1 rows and inserts v3 rows. The
    // final aggregate only matches if v1 files read back WIDENED and
    // NULL-FILLED, the evolved schema governs every generation in one
    // scan, and the cross-generation merge applied exactly.
    ("s17_schema_evolution",
      ((s: SparkSession, d: String) => {
        import graft.v3.Lake
        import org.apache.spark.sql.types._
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val sf = StructField(_: String, StringType, nullable = true)
        val v1 = StructType(Seq(sf("chain_name"), sf("doc_id"),
          StructField("n_tokens", IntegerType, nullable = true),
          StructField("score", FloatType, nullable = true)))
        val v2 = StructType(Seq(sf("chain_name"), sf("doc_id"),
          StructField("n_tokens", LongType, nullable = true),
          StructField("score", DoubleType, nullable = true), sf("lang")))
        val lake = new Lake(s, s"/tmp/graft-evo-lake/${Llm.sfCacheKey(d)}")
        val t = "docs_evo"
        lake.dropTable(t)
        require(lake.createTable(t, v1) == 1L, "createTable must commit v1")
        def base(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          concat(lit("0xd"), lpad(k.cast("string"), 12, "0")).as("doc_id"),
          pmod(k, lit(1000)).as("nt"),
          pmod(col("o_custkey"), lit(7)).as("sc"),
          pmod(col("o_custkey"), lit(2)).as("cs2"),
          pmod(k, lit(3)).as("m3"))
        // wave 1 under v1: physical int32 / float parquet
        lake.append(base(orders.filter(pmod(k, lit(3)) === 0))
          .select(col("chain_name"), col("doc_id"),
            col("nt").cast("int").as("n_tokens"),
            col("sc").cast("float").as("score")), t)
        require(lake.evolveSchema(t, v2) == 2L, "evolution must commit v2")
        require(lake.effectiveSchema(t)("n_tokens").dataType == LongType,
          "effective schema must carry the widened type")
        // wave 2 under v2: long / double / lang
        lake.append(base(orders.filter(pmod(k, lit(3)) === 1))
          .select(col("chain_name"), col("doc_id"),
            col("nt").cast("long").as("n_tokens"),
            col("sc").cast("double").as("score"),
            when(col("cs2") === 0, "en")
              .otherwise("de").as("lang")), t)
        // old-producer CDC batch (NO lang column): update the v1 rows
        // divisible by 5, insert the k%3==2 world
        val batch = base(orders.filter(
            (pmod(k, lit(3)) === 0 && pmod(k, lit(5)) === 0) ||
              pmod(k, lit(3)) === 2))
          .select(col("chain_name"), col("doc_id"),
            (col("nt") + when(col("m3") === 0, 1000000L)
              .otherwise(2000000L)).as("n_tokens"),
            col("sc").cast("double").as("score"))
        lake.upsert(batch, t, Seq("chain_name", "doc_id"))
        lake.read(t)
          .groupBy(coalesce(col("lang"), lit("??")).as("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_tokens")).as("sum_tokens"),
            sum(col("score").cast("long")).as("sum_score"))
          .orderBy(col("lang"))
      }): Q,
      Some("""WITH docs AS (SELECT o_orderkey AS k,
        |    CASE WHEN k % 3 = 0 AND k % 5 = 0 THEN k % 1000 + 1000000
        |         WHEN k % 3 = 2 THEN k % 1000 + 2000000
        |         ELSE k % 1000 END AS n_tokens,
        |    o_custkey % 7 AS score,
        |    CASE WHEN k % 3 = 1 THEN
        |      (CASE WHEN o_custkey % 2 = 0 THEN 'en' ELSE 'de' END)
        |    END AS lang
        |  FROM orders)
        |SELECT coalesce(lang, '??') AS lang, count(*) AS n,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM docs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BLOOM-FILTER FILE SKIPPING — the point-lookup path where range
    // pruning is structurally useless: INTERLEAVED appends give every
    // file a full-width key range (the random-hash reality before any
    // clustering), and the table's `write.bloom.columns` property puts
    // parquet bloom filters on the key. An absent-but-in-range key
    // must schedule ZERO files (require'd — blooms prove absence), and
    // the graded aggregate runs over a present-key point-set lookup
    // whose values the oracle re-derives (driver-keyed by definition:
    // the key list is the lookup's INPUT, bounded by the readKeys cap).
    ("s18_bloom_skip",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) =
          df.select(
            lit("ethereum").as("chain_name"),
            lit("IncreaseLiquidity").as("name"),
            concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
              .as("transaction_hash"),
            (lit(1000L) + pmod(k, lit(97))).as("block_number"),
            pmod(k, lit(13)).as("tx_index"),
            concat(lit("0xu"), col("o_custkey").cast("string"))
              .as("from_address"),
            col("o_custkey").cast("string").as("amount"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .cast("string").as("amount0"),
            pmod(k, lit(1000)).cast("string").as("amount1"),
            pmod(k, lit(997)).cast("string").as("tokenId"),
            pmod(k, lit(7)).as("log_index"))
        val lake = new Lake(s, s"/tmp/graft-bloom-lake/${Llm.sfCacheKey(d)}")
        lake.dropTable(Schemas.Nfp)
        lake.setTableProperties(Schemas.Nfp,
          Map("write.bloom.columns" -> "transaction_hash",
              "write.bloom.ndv" -> "2000000"))
        // interleaved waves: every file spans the whole keyspace
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(pmod(k, lit(4)) === j))
            .coalesce(1), Schemas.Nfp))
        def pad(v: Long) = f"0xtx$v%012d"
        val mx = orders.agg(max(k)).first().getLong(0)
        // absent key inside every file's range: blooms must prove it
        // absent everywhere — a non-skipping plan fails the gate
        val (_, stMiss) = lake.readKeys(Schemas.Nfp, "transaction_hash",
          Seq(pad(mx / 2) + "x"))
        require(stMiss.files >= 4 && stMiss.scanned == 0,
          s"bloom skip failed - in-range absent key scanned $stMiss")
        // present point-set: every 1000th orderkey (driver-keyed input,
        // bounded far under the readKeys cap)
        val keys = orders.filter(pmod(k, lit(1000)) === 0)
          .select(k).collect().map(r => pad(r.getLong(0))).toSeq
        val (df, _) = lake.readKeys(Schemas.Nfp, "transaction_hash", keys)
        df.groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""SELECT CAST(o_orderkey % 7 AS BIGINT) AS log_index,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_a0
        |FROM orders
        |WHERE o_orderkey % 1000 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 2-D Z-ORDER LAKE LAYOUT — the declared `write.layout =
    // zorder(x,y)` table property drives clusterCompact: each output
    // file becomes a Morton tile whose footer [min,max] is tight on
    // BOTH dimensions, so a range read on EITHER column schedules a
    // strict file subset (require'd in-row for x, for y, and for the
    // 2-D box being at least as sharp as each single dimension — a
    // layout that privileged one sort column would fail the gate).
    // The two dimensions come from different source columns
    // (orderkey-derived block_number, custkey-derived tx_index) so
    // the data fills the plane rather than a diagonal.
    ("s19_zorder_lake",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) =
          df.select(
            lit("ethereum").as("chain_name"),
            lit("IncreaseLiquidity").as("name"),
            concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
              .as("transaction_hash"),
            (lit(1000L) + pmod(k, lit(1024))).as("block_number"),
            pmod(col("o_custkey") * 7, lit(1024)).as("tx_index"),
            concat(lit("0xu"), col("o_custkey").cast("string"))
              .as("from_address"),
            col("o_custkey").cast("string").as("amount"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long")
              .cast("string").as("amount0"),
            pmod(k, lit(1000)).cast("string").as("amount1"),
            pmod(k, lit(997)).cast("string").as("tokenId"),
            pmod(k, lit(7)).as("log_index"))
        val lake = new Lake(s, s"/tmp/graft-zorder-lake/${Llm.sfCacheKey(d)}")
        lake.dropTable(Schemas.Nfp)
        lake.setTableProperties(Schemas.Nfp,
          Map("write.layout" -> "zorder(block_number,tx_index)"))
        // interleaved waves: neither dimension prunes before layout
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(pmod(k, lit(4)) === j))
            .coalesce(1), Schemas.Nfp))
        val bytes = lake.fileInventory(Schemas.Nfp).map(_._3).sum
        require(lake.clusterCompact(Schemas.Nfp,
          targetBytes = math.max(1L, bytes / 32)) == 1,
          "zorder layout rewrite did not run")
        // x-dimension: a quarter-range bound covers ~1/4 of the tiles
        // plus z-range boundary straddlers — must skip at least 40%
        val (_, stx) = lake.readRanges(Schemas.Nfp,
          Seq(("block_number", 1000L, 1255L)))
        require(stx.files >= 24 && stx.scanned * 5 <= stx.files * 3,
          s"x-dim bound did not prune the tiled layout - $stx")
        // y-dimension: the one a single-column sort would abandon
        val (_, sty) = lake.readRanges(Schemas.Nfp,
          Seq(("tx_index", 0L, 255L)))
        require(sty.scanned * 5 <= sty.files * 3,
          s"y-dim bound did not prune the tiled layout - $sty")
        // the 2-D box is at least as sharp as either dimension alone
        val (dfb, stb) = lake.readRanges(Schemas.Nfp, Seq(
          ("block_number", 1000L, 1255L), ("tx_index", 0L, 255L)))
        require(stb.scanned <= stx.scanned && stb.scanned <= sty.scanned,
          s"2-D box scanned more than a single dimension - $stb vs $stx / $sty")
        dfb.groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""SELECT CAST(o_orderkey % 7 AS BIGINT) AS log_index,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_a0
        |FROM orders
        |WHERE o_orderkey % 1024 <= 255 AND (o_custkey * 7) % 1024 <= 255
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MANIFEST-BACKED METADATA LIFECYCLE — the round-11 commit log
    // under the oracle: three appends + a cross-file upsert (updates +
    // inserts) all land as manifest commits; a crashed commit is
    // simulated by a POISON data file placed in the live chain dir
    // that no manifest names (log_index 999 — if any reader lists the
    // directory instead of serving the manifest, the extra group
    // breaks the oracle hash); reads and planning are require'd to
    // perform ZERO recursive-listing fallbacks; vacuum's opt-in
    // orphan sweep must delete exactly the poison file, and the
    // graded aggregate is computed from a fresh read AFTER vacuum, so
    // manifest expiry keeping the live version readable is graded too.
    ("s20_manifest_lifecycle",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
        val root = s"/tmp/graft-manifest-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val q = mx / 3 + 1
        val baseline = lake.listCalls.get()
        // three manifest-committed appends (key-range waves)
        (0 until 3).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q && k < (j + 1) * q))
            .coalesce(1), Schemas.Nfp))
        // one upsert batch: +100-cent updates on existing keys plus
        // brand-new keys shifted past the table's max
        val upd = derive(orders.filter(k < 500 && pmod(k, lit(10)) === 0))
          .withColumn("amount0",
            (col("amount0").cast("long") + 100).cast("string"))
        val ins = derive(orders.filter(k <= 37)
          .withColumn("o_orderkey", k + mx + 1))
        lake.upsert(upd.unionAll(ins), Schemas.Nfp,
          Seq("chain_name", "transaction_hash"))
        // crashed commit: a landed-but-never-published poison file in
        // the live chain dir (rows the oracle does NOT contain)
        val poison = derive(orders.limit(50))
          .withColumn("log_index", lit(999L)).drop("chain_name")
        poison.coalesce(1).write.mode("overwrite")
          .parquet(s"$root/_tmp/s20-orphan-src")
        val part = new java.io.File(s"$root/_tmp/s20-orphan-src")
          .listFiles().find(_.getName.endsWith(".parquet")).get
        val orphan = new java.io.File(
          s"$root/${Schemas.Nfp}/chain_name=ethereum/orphan-s20.parquet")
        require(part.renameTo(orphan), "fixture orphan landing failed")
        // manifest-served read: the poison rows must be invisible
        require(lake.read(Schemas.Nfp)
          .filter(col("log_index") === 999L).limit(1).count() == 0L,
          "a reader saw a file the manifest never named")
        // sweep the orphan (age gate disarmed: nothing is in flight)
        val vs = lake.vacuum(Schemas.Nfp, keepLast = 1,
          staleCommitMs = 0L, sweepOrphans = true)
        require(!orphan.exists(), s"orphan survived the sweep - $vs")
        require(lake.listCalls.get() == baseline,
          s"metadata planning fell back to ${lake.listCalls.get() - baseline} " +
            "recursive listing(s) on a manifest-backed lifecycle")
        lake.read(Schemas.Nfp)
          .groupBy(col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("log_index"))
      }): Q,
      Some("""WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT k, cents + CASE WHEN k < 500 AND k % 10 = 0
        |      THEN 100 ELSE 0 END AS a0
        |    FROM base
        |  UNION ALL
        |  SELECT b.k + mx.m + 1 AS k, b.cents AS a0
        |    FROM base b, mx WHERE b.k <= 37)
        |SELECT CAST(k % 7 AS BIGINT) AS log_index, count(*) AS n,
        |  CAST(sum(a0) AS BIGINT) AS sum_a0
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SQL CATALOG SURFACE — the round-13 DataSourceV2 TableCatalog
    // under the oracle: the SAME lake state is read twice through
    // pure SQL — current (`SELECT … FROM graft_sql.nfp`, after a
    // retained upsert and a SQL `INSERT INTO` that routes through the
    // manifest transaction) and pinned (`VERSION AS OF` the
    // pre-upsert snapshot) — and the catalog's own Lake instance is
    // require'd to perform ZERO recursive listings: every SQL plan is
    // manifest-served (the DSv2 ManifestPartitioningIndex). The
    // graded frame unions both states, so time travel correctness,
    // the SQL write path, and current-state reads all hash against
    // DuckDB.
    ("s21_sql_catalog",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
        val root = s"/tmp/graft-sqlcat-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        (0 until 2).foreach(j =>
          lake.append(derive(orders.filter(k >= j * h && k < (j + 1) * h))
            .coalesce(1), Schemas.Nfp))
        val v0 = lake.snapshot(Schemas.Nfp)
        // retained upsert: +100 cents on a key slice; the pinned
        // snapshot must keep reading the PRE-upsert values
        val upd = derive(orders.filter(k < 500 && pmod(k, lit(10)) === 0))
          .withColumn("amount0",
            (col("amount0").cast("long") + 100).cast("string"))
        lake.upsert(upd, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"), retain = true)
        // ONE stable catalog name per (row, sf): the session's
        // CatalogManager caches the instance for the session's life,
        // and that is now SAFE across this row's dropTable+rebuild —
        // every lake cache (relations, inventories, scan indexes,
        // commit headers) is salted by the manifest INCARNATION id, so
        // a recreate serves fresh state through the same instance
        // (LakeCatalogSpec "dropTable+recreate through ONE catalog").
        // The r13 nanoTime-suffixed workaround accumulated session
        // conf across bench reps; retired round 15.
        val cat = "graft_sql_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        // the SQL write path: one row through the manifest transaction
        s.sql(s"""INSERT INTO $cat.nfp VALUES
          | ('ethereum', 'IncreaseLiquidity', '0xsql000000000001', 2000,
          |  0, '0xsql', '1', '424242', '0', '0', 3)""".stripMargin)
        def agg(from: String) = s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY log_index""".stripMargin)
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(s"$cat.nfp VERSION AS OF $v0")
            .withColumn("src", lit("pin")))
          .select(col("src"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("src"), col("log_index"))
          .localCheckpoint() // materialize before the listing gate
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the SQL catalog fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        out
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |cur AS (
        |  SELECT k % 7 AS log_index,
        |      cents + CASE WHEN k < 500 AND k % 10 = 0
        |        THEN 100 ELSE 0 END AS a0
        |    FROM base
        |  UNION ALL SELECT 3, 424242),
        |pin AS (SELECT k % 7 AS log_index, cents AS a0 FROM base)
        |SELECT 'cur' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM cur GROUP BY 2
        |UNION ALL
        |SELECT 'pin' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pin GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // SQL DDL SURFACE — round-14's CREATE TABLE / CTAS through the
    // DSv2 catalog ([[graft.sources.LakeCatalog.createTable]] →
    // Lake.createTable: registry schema + EMPTY manifest v1): a table
    // is created by DDL, loaded by `INSERT INTO … SELECT` (the
    // manifest transaction), a second table is created by CTAS over
    // the first, and the graded frame reads the CTAS result — all
    // with ZERO recursive listings (created tables are manifest-served
    // from birth).
    ("s22_sql_ddl",
      ((s: SparkSession, d: String) => {
        import graft.v3.Lake
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-sqlddl-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable("ddl_orders")
        lake.dropTable("ddl_agg")
        val cat = "graft_ddl_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(s"""CREATE TABLE $cat.ddl_orders (
          | chain_name STRING, k BIGINT, cents BIGINT, bucket BIGINT
          |) USING parquet PARTITIONED BY (chain_name)""".stripMargin)
        orders.select(
            when(pmod(k, lit(3)) === 0, lit("ethereum"))
              .when(pmod(k, lit(3)) === 1, lit("base"))
              .otherwise(lit("arbitrum")).as("chain_name"),
            k.as("k"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
            pmod(k, lit(7)).as("bucket"))
          .createOrReplaceTempView("s22_src")
        s.sql(s"""INSERT INTO $cat.ddl_orders
          | SELECT chain_name, k, cents, bucket FROM s22_src""".stripMargin)
        s.sql(s"""CREATE TABLE $cat.ddl_agg AS
          | SELECT chain_name, bucket, count(*) AS n,
          |   CAST(sum(cents) AS BIGINT) AS sum_c
          | FROM $cat.ddl_orders WHERE bucket <> 3
          | GROUP BY chain_name, bucket""".stripMargin)
        val out = s.sql(
          s"""SELECT chain_name, bucket, n, sum_c FROM $cat.ddl_agg
             | ORDER BY chain_name, bucket""".stripMargin)
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the DDL lifecycle fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - created tables must be manifest-served")
        out
      }): Q,
      Some("""WITH src AS (SELECT
        |    CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'ethereum'
        |      WHEN 1 THEN 'base' ELSE 'arbitrum' END AS chain_name,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(o_orderkey % 7 AS BIGINT) AS bucket
        |  FROM orders)
        |SELECT chain_name, bucket, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_c
        |FROM src WHERE bucket <> 3
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SQL DELETE SURFACE — round-14's `DELETE FROM` through the DSv2
    // catalog: a predicate delete (copy-on-write rewrite of exactly
    // the touched files) and a whole-chain delete (downgraded to the
    // metadata-only dropChain), both RETAINED so the pre-delete
    // pinned snapshot (`VERSION AS OF`) still replays bit-for-bit.
    // The graded frame unions current and pinned state; the catalog's
    // Lake is require'd to plan with zero listings throughout.
    ("s23_sql_delete",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-sqldel-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        (0 until 2).foreach(j =>
          lake.append(nfpFromOrders(
            orders.filter(k >= j * h && k < (j + 1) * h), twoChains = true)
            .coalesce(1), Schemas.Nfp))
        val v0 = lake.snapshot(Schemas.Nfp)
        val cat = "graft_del_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        // predicate delete: the general copy-on-write path
        s.sql(s"""DELETE FROM $cat.nfp
          | WHERE log_index = 2 AND chain_name = 'ethereum'""".stripMargin)
        // whole-chain delete: the metadata-only dropChain downgrade
        s.sql(s"DELETE FROM $cat.nfp WHERE chain_name = 'base'")
        def agg(from: String) = s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY log_index""".stripMargin)
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(s"$cat.nfp VERSION AS OF $v0")
            .withColumn("src", lit("pin")))
          .select(col("src"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("src"), col("log_index"))
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the DELETE lifecycle fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        out
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |cur AS (SELECT k % 7 AS log_index, cents AS a0 FROM base
        |  WHERE k % 2 = 0 AND k % 7 <> 2),
        |pin AS (SELECT k % 7 AS log_index, cents AS a0 FROM base)
        |SELECT 'cur' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM cur GROUP BY 2
        |UNION ALL
        |SELECT 'pin' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pin GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // TIMESTAMP TIME TRAVEL — round-14's `TIMESTAMP AS OF` through
    // the commit log's `#ts` headers: two appends with a strictly
    // separated wall-clock between them; the pinned read resolves to
    // the FIRST commit (latest version ≤ t1) and the current read
    // sees both. The in-row clock guard (busy-wait past t1 before the
    // second append) makes the resolution deterministic at any SF.
    ("s24_sql_timestamp",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-sqlts-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        lake.append(nfpFromOrders(orders.filter(k < h)).coalesce(1),
          Schemas.Nfp)
        val t1 = System.currentTimeMillis()
        while (System.currentTimeMillis() <= t1) Thread.sleep(1)
        lake.append(nfpFromOrders(orders.filter(k >= h)).coalesce(1),
          Schemas.Nfp)
        val cat = "graft_ts_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        def agg(from: String) = s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY log_index""".stripMargin)
        val pinned = s"$cat.nfp TIMESTAMP AS OF " +
          s"'${java.time.Instant.ofEpochMilli(t1)}'"
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(pinned).withColumn("src", lit("pin")))
          .select(col("src"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("src"), col("log_index"))
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"time travel fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s)")
        out
      }): Q,
      Some("""WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |cur AS (SELECT k % 7 AS log_index, cents AS a0 FROM base),
        |pin AS (SELECT b.k % 7 AS log_index, b.cents AS a0
        |  FROM base b, mx WHERE 2 * b.k <= mx.m)
        |SELECT 'cur' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM cur GROUP BY 2
        |UNION ALL
        |SELECT 'pin' AS src, CAST(log_index AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pin GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // SQL ROW-LEVEL WRITES — round-14's `UPDATE` and `MERGE INTO`
    // through the DSv2 SupportsRowLevelOperations surface
    // (group-based copy-on-write: Spark rewrites the command into a
    // ReplaceData plan over the operation's shared manifest-served
    // scan; runtime group filtering confines the rewrite to matched
    // partitions; the commit is one retained manifest transaction).
    // An UPDATE mutates a key slice, then a MERGE applies matched
    // updates AND not-matched inserts in one statement; the graded
    // frame unions the final state with the pre-write pinned
    // snapshot, zero listings require'd throughout.
    ("s26_sql_update_merge",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-sqlupd-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        (0 until 2).foreach(j =>
          lake.append(nfpFromOrders(
            orders.filter(k >= j * h && k < (j + 1) * h), twoChains = true)
            .coalesce(1), Schemas.Nfp))
        val v0 = lake.snapshot(Schemas.Nfp)
        val cat = "graft_upd_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        s.sql(s"""UPDATE $cat.nfp
          | SET amount0 = CAST(CAST(amount0 AS BIGINT) + 100 AS STRING)
          | WHERE log_index = 2 AND chain_name = 'ethereum'""".stripMargin)
        // merge source: matched updates (existing keys re-priced) +
        // not-matched inserts (keys shifted past the table max)
        nfpFromOrders(orders.filter(k < 100 && pmod(k, lit(10)) === 0),
            twoChains = true)
          .withColumn("amount0", lit("999999"))
          .unionAll(nfpFromOrders(orders.filter(k <= 37)
            .withColumn("o_orderkey", k + mx + 1), twoChains = true))
          .createOrReplaceTempView("s26_src")
        s.sql(s"""MERGE INTO $cat.nfp t USING s26_src s
          | ON t.chain_name = s.chain_name
          |   AND t.transaction_hash = s.transaction_hash
          | WHEN MATCHED THEN UPDATE SET amount0 = s.amount0
          | WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // round-16 BY SOURCE leg: a second MERGE whose source names
        // only the repriced keys — target-only rows (EVERY other row,
        // across all partitions; runtime group filtering must not
        // wrongly narrow this full-outer rewrite) delete on one
        // (log_index, tx_index) slice and re-price on another
        nfpFromOrders(orders.filter(k < 100 && pmod(k, lit(10)) === 0),
            twoChains = true)
          .createOrReplaceTempView("s26_src2")
        s.sql(s"""MERGE INTO $cat.nfp t USING s26_src2 s
          | ON t.chain_name = s.chain_name
          |   AND t.transaction_hash = s.transaction_hash
          | WHEN MATCHED THEN UPDATE SET amount0 = '888888'
          | WHEN NOT MATCHED BY SOURCE AND t.log_index = 6
          |   AND t.tx_index = 0 THEN DELETE
          | WHEN NOT MATCHED BY SOURCE AND t.log_index = 5 THEN UPDATE
          |   SET amount0 = CAST(CAST(t.amount0 AS BIGINT) + 7 AS STRING)
          |""".stripMargin)
        def agg(from: String) = s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY log_index""".stripMargin)
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(s"$cat.nfp VERSION AS OF $v0")
            .withColumn("src", lit("pin")))
          .select(col("src"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("src"), col("log_index"))
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"row-level SQL fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        out
      }): Q,
      Some("""WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |upd AS (SELECT k, CASE WHEN k % 7 = 2 AND k % 2 = 0
        |    THEN cents + 100 ELSE cents END AS a0 FROM base),
        |mrg AS (SELECT k, CASE WHEN k < 100 AND k % 10 = 0
        |    THEN 999999 ELSE a0 END AS a0 FROM upd),
        |fin AS (SELECT k, a0 FROM mrg
        |  UNION ALL
        |  SELECT b.k + mx.m + 1 AS k, b.cents AS a0
        |    FROM base b, mx WHERE b.k <= 37),
        |fin2 AS (SELECT k,
        |    CASE WHEN k < 100 AND k % 10 = 0 THEN 888888
        |         WHEN k % 7 = 5 THEN a0 + 7
        |         ELSE a0 END AS a0
        |  FROM fin
        |  WHERE NOT (NOT (k < 100 AND k % 10 = 0)
        |    AND k % 7 = 6 AND k % 13 = 0)),
        |pin AS (SELECT k, cents AS a0 FROM base)
        |SELECT 'cur' AS src, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM fin2 GROUP BY 2
        |UNION ALL
        |SELECT 'pin' AS src, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pin GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // CDC READ SURFACE — round-14's `table_changes(v1, v2)`: three
    // appends pin snapshot v1; a retained upsert (updates + inserts)
    // rewrites every file (the batch's key envelope spans all three
    // waves, so the file-grain planner deterministically touches all
    // of them); snapshot v2 pins the result. The diff surfaces every
    // pre-upsert row as a delete and every post-upsert row as an
    // insert (file-granularity CDC — an update is its delete+insert
    // pair, exactly how the published formats reconstruct changes
    // without a per-row change log), graded against the DuckDB
    // recomputation of both sides.
    ("s25_table_changes",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
        val root = s"/tmp/graft-cdc-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val q = mx / 3 + 1
        (0 until 3).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q && k < (j + 1) * q))
            .coalesce(1), Schemas.Nfp))
        val v1 = lake.snapshot(Schemas.Nfp)
        val upd = derive(orders.filter(k < 500 && pmod(k, lit(10)) === 0))
          .withColumn("amount0",
            (col("amount0").cast("long") + 100).cast("string"))
        val ins = derive(orders.filter(k <= 37)
          .withColumn("o_orderkey", k + mx + 1))
        lake.upsert(upd.unionAll(ins), Schemas.Nfp,
          Seq("chain_name", "transaction_hash"), retain = true)
        val v2 = lake.snapshot(Schemas.Nfp)
        lake.tableChanges(Schemas.Nfp, v1, v2)
          .groupBy(col("_change_type"), col("log_index"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount0").cast("long")).as("sum_a0"))
          .orderBy(col("_change_type"), col("log_index"))
      }): Q,
      Some("""WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |pre AS (SELECT k, cents AS a0 FROM base),
        |post AS (
        |  SELECT k, cents + CASE WHEN k < 500 AND k % 10 = 0
        |      THEN 100 ELSE 0 END AS a0
        |    FROM base
        |  UNION ALL
        |  SELECT b.k + mx.m + 1 AS k, b.cents AS a0
        |    FROM base b, mx WHERE b.k <= 37)
        |SELECT 'delete' AS _change_type, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pre GROUP BY 2
        |UNION ALL
        |SELECT 'insert' AS _change_type, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM post GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // STREAMING CDC READ — round-15's `lake-changes` source: the
    // commit log itself streamed as micro-batches (offsets ARE
    // manifest commit versions; `maxVersionsPerBatch = 1` forces one
    // commit per batch, so the AvailableNow drain replays SIX commits
    // — three ethereum waves, two never-touched base pads, one
    // retained upsert whose key envelope spans every ethereum file —
    // as six ordered batches). The accumulated sink must equal the
    // batch change feed: inserts = every appended row plus every
    // post-upsert row of the touched files, deletes = the touched
    // files' pre-upsert rows, and the untouched base chain surfaces
    // ONLY its append inserts. All planning is manifest-served (zero
    // listings require'd on the row's lake).
    ("s27_cdc_streamed",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
        val root = s"/tmp/graft-cdcstream-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val q3 = mx / 3 + 1
        (0 until 3).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q3 && k < (j + 1) * q3))
            .coalesce(1), Schemas.Nfp))
        // a second, never-updated chain: the feed must carry its
        // append inserts and nothing else
        (0 until 2).foreach(j =>
          lake.append(derive(orders.filter(pmod(k, lit(22)) === j * 11))
            .withColumn("chain_name", lit("base")).coalesce(1),
            Schemas.Nfp))
        val upd = derive(orders.filter(k < 500 && pmod(k, lit(10)) === 0))
          .withColumn("amount0",
            (col("amount0").cast("long") + 100).cast("string"))
        val ins = derive(orders.filter(k <= 37)
          .withColumn("o_orderkey", k + mx + 1))
        lake.upsert(upd.unionAll(ins), Schemas.Nfp,
          Seq("chain_name", "transaction_hash"), retain = true)
        val out = Llm.streamTempRunFor("graft-cdcstream") { base =>
          val sink = s"$base/accum"
          val q = graft.streaming.Streaming.changeStream(s, root,
              Schemas.Nfp, startingVersion = Some(0L),
              maxVersionsPerBatch = Some(1L))
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.mode("append").parquet(sink); ()
            }
            .option("checkpointLocation", s"$base/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          s.read.parquet(sink)
            .groupBy(col("_change_type"), col("chain_name"),
              col("log_index"))
            .agg(count(lit(1)).as("n"),
              sum(col("amount0").cast("long")).as("sum_a0"))
            .orderBy(col("_change_type"), col("chain_name"),
              col("log_index"))
        }
        require(lake.listCalls.get() == 0L,
          s"the CDC-stream lifecycle fell back to ${lake.listCalls.get()} " +
            "recursive listing(s) - the producer path must be manifest-served")
        // the CONSUMER's own planning instance (listCalls is per-Lake;
        // checking the producer's alone would be vacuous for the stream)
        val consumerLists = graft.streaming.LakeChangeStream
          .listCallsOf(root, Schemas.Nfp)
          .getOrElse(throw new IllegalStateException(
            "no lake-changes stream was constructed for this row's lake"))
        require(consumerLists == 0L,
          s"stream planning performed $consumerLists listing(s)")
        out
      }): Q,
      Some("""WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
        |base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |pre AS (SELECT k % 7 AS li, cents AS a0 FROM base),
        |post AS (
        |  SELECT k % 7 AS li,
        |      cents + CASE WHEN k < 500 AND k % 10 = 0
        |        THEN 100 ELSE 0 END AS a0
        |    FROM base
        |  UNION ALL
        |  SELECT (b.k + mx.m + 1) % 7 AS li, b.cents AS a0
        |    FROM base b, mx WHERE b.k <= 37),
        |pads AS (SELECT k % 7 AS li, cents AS a0 FROM base WHERE k % 11 = 0),
        |evts AS (
        |  SELECT 'insert' AS ct, 'ethereum' AS ch, li, a0 FROM pre
        |  UNION ALL SELECT 'insert', 'ethereum', li, a0 FROM post
        |  UNION ALL SELECT 'delete', 'ethereum', li, a0 FROM pre
        |  UNION ALL SELECT 'insert', 'base', li, a0 FROM pads)
        |SELECT ct AS _change_type, ch AS chain_name,
        |  CAST(li AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |FROM evts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // SQL MAINTENANCE + HISTORY SURFACE — round-15's table-valued
    // functions: a pure-SQL operator runs the full table lifecycle —
    // CREATE, three INSERTs, `graft_compact` (bin-pack, retained),
    // `graft_snapshot` (pin), DELETE of one chain (metadata-only,
    // retained), `graft_vacuum` (GC of the compaction-retired
    // originals; the kept pin's files survive) — then reads
    // `table_history` back. The graded frame unions the history's
    // deterministic (version, operation, is_delta) sequence with the
    // post-delete current state AND the pinned `VERSION AS OF` read
    // taken AFTER the vacuum (proving the GC kept exactly what the
    // pin needs). Commit wall-clocks are require'd monotone non-null;
    // vacuum counters are require'd (originals GC'd) but not hashed
    // (file counts depend on write parallelism).
    ("s28_sql_maintenance",
      ((s: SparkSession, d: String) => {
        import graft.v3.Lake
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-sqlmnt-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable("mnt_t")
        val cat = "graft_mnt_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        graft.sources.LakeMaintenance.register(s)
        s.sql(s"""CREATE TABLE $cat.mnt_t (
          | chain_name STRING, k BIGINT, bucket BIGINT, cents BIGINT
          |) PARTITIONED BY (chain_name)""".stripMargin)
        orders.select(
            when(pmod(k, lit(2)) === 0, lit("ethereum"))
              .otherwise(lit("base")).as("chain_name"),
            k.as("k"), pmod(k, lit(7)).as("bucket"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
          .createOrReplaceTempView("s28_src")
        (0 until 3).foreach(j => s.sql(
          s"""INSERT INTO $cat.mnt_t
             | SELECT * FROM s28_src WHERE k % 3 = $j""".stripMargin))
        def history(tag: String) = {
          val h = s.sql(s"SELECT * FROM table_history('$cat.mnt_t')")
            .collect()
          require(h.forall(!_.isNullAt(1)) &&
            h.map(_.getTimestamp(1).getTime).sliding(2)
              .forall(w => w.length < 2 || w(0) <= w(1)),
            s"$tag commit wall-clocks missing or non-monotone")
          h.map(r => (tag, r.getLong(0), r.getString(2) +
            (if (r.getBoolean(3)) ":d" else ":c")))
        }
        // the EARLY log, while everything is retained: create + appends
        val hist1 = history("hist1")
        val preFiles = lake.fileInventory("mnt_t").size
        val rewritten = s.sql(
          s"SELECT * FROM graft_compact('$cat.mnt_t', ${1L << 30})")
          .first().getLong(0)
        require(rewritten == 2L,
          s"expected both chains bin-packed, got $rewritten")
        val pin = s.sql(s"SELECT * FROM graft_snapshot('$cat.mnt_t')")
          .first().getLong(0)
        s.sql(s"DELETE FROM $cat.mnt_t WHERE chain_name = 'base'")
        val vac = s.sql(s"SELECT * FROM graft_vacuum('$cat.mnt_t', 1)")
          .first()
        // r16 lifecycle: every commit is still inside the retained
        // CDC window, so the compaction-swapped originals (replayed
        // by a from-0 consumer, to whom the rewrite is invisible) and
        // the DELETE-retired chain stay pinned - an in-window
        // consumer must never be starved by a vacuum
        require(vac.getLong(1) == 0L,
          s"in-window vacuum must keep commit-log-pinned files: $vac")
        // the FINAL log: every commit is still retained — the
        // compaction/dropChain checkpoints would have truncated the
        // log to a handful of commits before r15's
        // manifest.minRetainedCommits floor (default 48), which
        // guarantees CDC consumers and history readers a bounded
        // minimum window regardless of checkpoint placement
        val hist2 = history("hist2")
        // roll the CDC window (shrunk floor + metadata-only refresh
        // checkpoints force a retention cut) - NOW the vacuum frees
        // the compaction originals; the pinned snapshot keeps exactly
        // what VERSION AS OF needs
        s.sql(s"""ALTER TABLE $cat.mnt_t SET TBLPROPERTIES
          | ('manifest.minRetainedCommits'='1')""".stripMargin)
        (0 until 3).foreach(_ => lake.refreshManifest("mnt_t"))
        val vac2 = s.sql(s"SELECT * FROM graft_vacuum('$cat.mnt_t', 1)")
          .first()
        require(vac2.getLong(1) >= (preFiles - 2).toLong,
          s"window rolled: vacuum must free the compaction-retired " +
            s"originals (had $preFiles files): $vac2")
        def agg(src: String, from: String, where: String) = s.sql(
          s"""SELECT '$src' AS src, bucket AS ord, chain_name AS tag,
             |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_c
             |FROM $from $where GROUP BY bucket, chain_name""".stripMargin)
        val histDf = s.createDataFrame(
          java.util.Arrays.asList((hist1 ++ hist2).map(h =>
            org.apache.spark.sql.Row(h._1, h._2, h._3, 0L, 0L)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("src",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("ord",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("tag",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("sum_c",
              org.apache.spark.sql.types.LongType))))
        val out = histDf
          .unionAll(agg("cur", s"$cat.mnt_t", ""))
          .unionAll(agg("pin", s"$cat.mnt_t VERSION AS OF $pin", ""))
          .orderBy(col("src"), col("ord"), col("tag"))
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the maintenance lifecycle fell back to " +
            s"${catLake.listCalls.get()} recursive listing(s)")
        out
      }): Q,
      Some("""WITH src AS (SELECT
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'ethereum' ELSE 'base'
        |      END AS chain_name,
        |    CAST(o_orderkey % 7 AS BIGINT) AS bucket,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |hist(src, ord, tag) AS (VALUES
        |  ('hist1', 1, 'create:c'), ('hist1', 2, 'append:c'),
        |  ('hist1', 3, 'append:d'), ('hist1', 4, 'append:d'),
        |  ('hist2', 1, 'create:c'), ('hist2', 2, 'append:c'),
        |  ('hist2', 3, 'append:d'), ('hist2', 4, 'append:d'),
        |  ('hist2', 5, 'compaction:c'), ('hist2', 6, 'compaction:c'),
        |  ('hist2', 7, 'dropChain:c'))
        |SELECT src, CAST(ord AS BIGINT) AS ord, tag,
        |    CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS sum_c
        |  FROM hist
        |UNION ALL
        |SELECT 'cur', bucket, chain_name, count(*),
        |    CAST(sum(cents) AS BIGINT)
        |  FROM src WHERE chain_name = 'ethereum' GROUP BY 2, 3
        |UNION ALL
        |SELECT 'pin', bucket, chain_name, count(*),
        |    CAST(sum(cents) AS BIGINT)
        |  FROM src GROUP BY 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)),

    // PLAN-TIME DATA SKIPPING — round-16's per-file column stats:
    // every commit persists [min, max] for the prunable data columns
    // (the `_filestats` sidecar, O(commit) per commit), and an
    // arbitrary pushed SQL predicate on a NON-KEY column
    // (`block_number BETWEEN …`) prunes FILES at plan time through
    // the manifest-served DSv2 index — Delta/Iceberg's data-skipping
    // feature. Four appends carry disjoint block_number ranges; the
    // range query must schedule exactly the one overlapping file of
    // four (require'd via the DataSkipping seam — a non-pruning plan
    // fails the gate), with zero plan-time footer reads and zero
    // listings; the oracle recomputes the aggregate straight from
    // orders.
    ("s29_data_skipping",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        // block_number = 1000 + k: monotone in the wave key, so each
        // single-file wave carries a TIGHT disjoint range on a column
        // that is NOT an upsert key
        def derive(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
            .as("transaction_hash"),
          (lit(1000L) + k).as("block_number"),
          pmod(k, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .cast("string").as("amount0"),
          pmod(k, lit(1000)).cast("string").as("amount1"),
          pmod(k, lit(997)).cast("string").as("tokenId"),
          pmod(k, lit(7)).as("log_index"))
        val mx = orders.agg(max(k)).first().getLong(0)
        val q = mx / 4 + 1
        val root = s"/tmp/graft-dskip-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q && k < (j + 1) * q))
            .coalesce(1), Schemas.Nfp))
        val cat = "graft_dskip_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        val dirStr = s"$root/${Schemas.Nfp}"
        def seam = graft.plans.DataSkipping.skipStats(dirStr)
          .getOrElse((0L, 0L))
        val s0 = seam
        // the range covers wave 1 exactly: [1000+q, 1000+2q-1]
        val out = s.sql(
          s"""SELECT 'bn' AS src, log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $cat.nfp
             |WHERE block_number BETWEEN ${1000 + q} AND ${1000 + 2 * q - 1}
             |GROUP BY log_index""".stripMargin)
          .localCheckpoint()
        val s1 = seam
        val (cand, kept) = (s1._1 - s0._1, s1._2 - s0._2)
        require(cand > 0 && cand % 4 == 0 && kept == cand / 4,
          s"data skipping did not prune - kept $kept of $cand " +
            "candidate files (expected exactly the 1 of 4 overlapping)")
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        // the CATALOG's lake planned the query: it must have pruned
        // from the sidecar fold alone - zero plan-time footer opens,
        // zero recursive listings
        require(catLake.footerReads.get() == 0L,
          "plan-time skipping opened a parquet footer - stats must " +
            "serve from the commit-time sidecar")
        require(catLake.listCalls.get() == 0L,
          s"the SQL catalog fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        // ── DOUBLE-bound + NULL-count legs (r17): px = k + 0.25 as a
        // double, NULL on k%10==0 in the FIRST wave only. The px
        // range query must skip 3 of 4 files on the widened-double
        // stats; the IS NULL query must skip every file but the
        // null-bearing one via the persisted per-file null counts —
        // both graded against the oracle's recomputation.
        val t2 = "nfp_px"
        lake.dropTable(t2)
        locally {
          import org.apache.spark.sql.types._
          lake.createTable(t2, StructType(Seq(
            StructField("chain_name", StringType, nullable = true),
            StructField("k", LongType, nullable = true),
            StructField("px", DoubleType, nullable = true),
            StructField("pd", DecimalType(18, 2), nullable = true),
            StructField("pw", DecimalType(38, 2), nullable = true))))
        }
        (0 until 4).foreach { j =>
          val w = orders.filter(k >= j * q && k < (j + 1) * q)
          lake.append(w.select(
            lit("ethereum").as("chain_name"),
            k.as("k"),
            when(pmod(k, lit(10)) === 0 && k < q, lit(null))
              .otherwise(k.cast("double") + 0.25).as("px"),
            // exact decimal from a string literal (never through a
            // double): k.25 at scale 2, INT64-backed in parquet
            concat(k.cast("string"), lit(".25"))
              .cast("decimal(18,2)").as("pd"),
            // WIDE decimal (38,2): FIXED_LEN_BYTE_ARRAY in parquet,
            // SIGNED big-endian stats — pw = k - 2q + 0.25 makes the
            // first two waves entirely NEGATIVE (exact decimal
            // arithmetic, never through a double)
            (k.cast("decimal(38,2)") -
              lit(java.math.BigDecimal.valueOf(2 * q))
                .cast("decimal(38,2)") +
              lit(new java.math.BigDecimal("0.25")).cast("decimal(38,2)"))
              .cast("decimal(38,2)").as("pw")).coalesce(1), t2)
        }
        val dir2 = s"$root/$t2"
        def seam2 = graft.plans.DataSkipping.skipStats(dir2)
          .getOrElse((0L, 0L))
        val p0 = seam2
        val pxRange = lake.read(t2)
          .filter(col("px") >= q + 0.25 && col("px") < 2 * q + 0.25)
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_a0"))
          .select(lit("px").as("src"), lit(-1L).as("log_index"),
            col("n"), col("sum_a0").cast("long").as("sum_a0"))
          .localCheckpoint()
        val p1 = seam2
        require(p1._1 - p0._1 == 4 && p1._2 - p0._2 == 1,
          s"double-bound skipping kept ${p1._2 - p0._2} of " +
            s"${p1._1 - p0._1} (expected 1 of 4)")
        val pxNull = lake.read(t2).filter(col("px").isNull)
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_a0"))
          .select(lit("pxnull").as("src"), lit(-2L).as("log_index"),
            col("n"), col("sum_a0").cast("long").as("sum_a0"))
          .localCheckpoint()
        val p2 = seam2
        require(p2._1 - p1._1 == 4 && p2._2 - p1._2 == 1,
          s"null-count skipping kept ${p2._2 - p1._2} of " +
            s"${p2._1 - p1._1} (expected the 1 null-bearing file of 4)")
        // DECIMAL-bound leg (r17): unscaled-integer stats from the
        // INT64-backed decimal(18,2) column must prune the same 3 of
        // 4 files; the literals carry the column's exact type (a
        // mismatched scale would cast the column and keep everything)
        val pdRange = lake.read(t2)
          .filter(col("pd") >= lit(java.math.BigDecimal.valueOf(q))
              .cast("decimal(18,2)") &&
            col("pd") < lit(java.math.BigDecimal.valueOf(2 * q))
              .cast("decimal(18,2)"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_a0"))
          .select(lit("pd").as("src"), lit(-3L).as("log_index"),
            col("n"), col("sum_a0").cast("long").as("sum_a0"))
          .localCheckpoint()
        val p3 = seam2
        require(p3._1 - p2._1 == 4 && p3._2 - p2._2 == 1,
          s"decimal-bound skipping kept ${p3._2 - p2._2} of " +
            s"${p3._1 - p2._1} (expected 1 of 4)")
        // WIDE-DECIMAL leg (r18): decimal(38,2) stats are SIGNED
        // big-endian FLBA bounds — an entirely-negative range
        // [-q, 0) selects wave 1 exactly (the sign boundary an
        // unsigned byte comparison inverts); kept-file require'd.
        val pwRange = lake.read(t2)
          .filter(col("pw") >= lit(java.math.BigDecimal.valueOf(-q))
              .cast("decimal(38,2)") &&
            col("pw") < lit(java.math.BigDecimal.ZERO)
              .cast("decimal(38,2)"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_a0"))
          .select(lit("pw").as("src"), lit(-4L).as("log_index"),
            col("n"), col("sum_a0").cast("long").as("sum_a0"))
          .localCheckpoint()
        val p4 = seam2
        require(p4._1 - p3._1 == 4 && p4._2 - p3._2 == 1,
          s"wide-decimal (FLBA) skipping kept ${p4._2 - p3._2} of " +
            s"${p4._1 - p3._1} (expected 1 of 4)")
        out.unionByName(pxRange).unionByName(pxNull).unionByName(pdRange)
          .unionByName(pwRange)
          .orderBy(col("src"), col("log_index"))
      }): Q,
      Some("""WITH mxq AS (SELECT max(o_orderkey) // 4 + 1 AS q FROM orders)
        |SELECT 'bn' AS src, CAST(o_orderkey % 7 AS BIGINT) AS log_index,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey >= q AND o_orderkey < 2 * q
        |GROUP BY 1, 2
        |UNION ALL
        |SELECT 'px' AS src, CAST(-1 AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey >= q AND o_orderkey < 2 * q
        |  AND NOT (o_orderkey % 10 = 0 AND o_orderkey < q)
        |UNION ALL
        |SELECT 'pxnull' AS src, CAST(-2 AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey % 10 = 0 AND o_orderkey < q
        |UNION ALL
        |SELECT 'pd' AS src, CAST(-3 AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey >= q AND o_orderkey < 2 * q
        |UNION ALL
        |SELECT 'pw' AS src, CAST(-4 AS BIGINT) AS log_index,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_a0
        |FROM orders, mxq
        |WHERE o_orderkey >= q AND o_orderkey < 2 * q
        |ORDER BY 1, 2""".stripMargin)),

    // ROW-GRAIN CDC ENRICHMENT — round-16's enriched change feed
    // (Delta CDF's update_preimage/postimage mode): one upsert commit
    // rewrites whole files (file grain would churn EVERY row of the
    // touched files through delete+insert), and the enriched feed —
    // removed×added joined on the table's keys — must emit exactly
    // the update pairs, deletes and inserts the batch actually made,
    // with the unchanged rewritten rows emitting NOTHING. The oracle
    // recomputes all four change classes straight from orders; any
    // leaked unchanged row breaks the counts. The SQL shape is the
    // 4-arg table_changes TVF (keys as the fourth argument).
    ("s30_cdc_enriched",
      ((s: SparkSession, d: String) => {
        val root = s"/tmp/graft-cdcenr-lake/${Llm.sfCacheKey(d)}"
        val (_, v0, v1) = cdcEnrichedFixture(s, d, root)
        val cat = "graft_cdcenr_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        graft.sources.LakeMaintenance.register(s)
        s.sql(
          s"""SELECT _change_type, log_index,
             |  count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM table_changes('$cat.nfp', $v0, $v1,
             |  'chain_name,transaction_hash')
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      }): Q,
      Some(cdcEnrichedOracle)),

    // STREAMED row-grain CDC — the same enrichment delivered through
    // `readStream.format("lake-changes")` with the `keys=` option:
    // the per-rewrite-commit keyed join now runs inside the micro-
    // batch lifecycle (churn-sized staging under the checkpoint, GC'd
    // on engine acknowledgment), and the accumulated stream output is
    // graded against s30's oracle VERBATIM — the established
    // streamed-vs-batch pattern proving both surfaces compute the one
    // enrichment. Producer AND consumer planning are require'd
    // manifest-served (zero recursive listings).
    ("s33_cdc_enriched_streamed",
      ((s: SparkSession, d: String) => {
        import graft.v3.Schemas
        val root = s"/tmp/graft-cdcenrstream-lake/${Llm.sfCacheKey(d)}"
        val (lake, v0, _) = cdcEnrichedFixture(s, d, root)
        val out = Llm.streamTempRunFor("graft-cdcenrstream") { base =>
          val sink = s"$base/accum"
          val q = graft.streaming.Streaming.changeStream(s, root,
              Schemas.Nfp, startingVersion = Some(v0),
              keys = Some(Seq("chain_name", "transaction_hash")))
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              b.write.mode("append").parquet(sink); ()
            }
            .option("checkpointLocation", s"$base/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          s.read.parquet(sink)
            .groupBy(col("_change_type"), col("log_index"))
            .agg(count(lit(1)).as("n"),
              sum(col("amount0").cast("long")).as("sum_a0"))
            .orderBy(col("_change_type"), col("log_index"))
            .localCheckpoint()
        }
        require(lake.listCalls.get() == 0L,
          s"the enriched-CDC producer fell back to ${lake.listCalls.get()} " +
            "recursive listing(s)")
        val consumerLists = graft.streaming.LakeChangeStream
          .listCallsOf(root, Schemas.Nfp)
          .getOrElse(throw new IllegalStateException(
            "no lake-changes stream was constructed for this row's lake"))
        require(consumerLists == 0L,
          s"enriched stream planning performed $consumerLists listing(s)")
        out
      }): Q,
      Some(cdcEnrichedOracle)),

    // SQL RESTORE — round-16's `graft_restore` TVF (the published
    // formats' RESTORE TABLE ... VERSION AS OF): pin a snapshot, make
    // retained CHANGES (upsert re-pricing a slice + a fresh append),
    // restore to the pin through SQL, and the graded aggregate must
    // equal the PRE-mutation state recomputed straight from orders —
    // rewritten-away files moved back from the retention area,
    // post-restore reads manifest-served with zero listings. The
    // 'post' leg re-reads the POST-mutation pin AFTER the restore
    // (its files retired by the restore — retention keeps it exact).
    ("s31_sql_restore",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = nfpFromOrders(df)
        val root = s"/tmp/graft-restore-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        (0 until 2).foreach(j =>
          lake.append(derive(orders.filter(pmod(k, lit(2)) === j))
            .coalesce(1), Schemas.Nfp))
        val pin = lake.snapshot(Schemas.Nfp)
        // retained mutations: +100 cents on k%10==0 under 2000, plus
        // inserted 0xnw keys
        val upd = derive(orders.filter(k < 2000 && pmod(k, lit(10)) === 0))
          .withColumn("amount0",
            (col("amount0").cast("long") + 100).cast("string"))
          .unionByName(derive(orders.filter(pmod(k, lit(23)) === 0))
            .withColumn("transaction_hash",
              regexp_replace(col("transaction_hash"), "^0xtx", "0xnw")))
        lake.upsert(upd, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"), retain = true)
        val pinAfter = lake.snapshot(Schemas.Nfp)
        val cat = "graft_rst_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        graft.sources.LakeMaintenance.register(s)
        val st = s.sql(s"SELECT * FROM graft_restore('$cat.nfp', $pin)")
          .first()
        require(st.getLong(0) >= 1L && st.getLong(1) >= 1L,
          s"restore moved nothing: +${st.getLong(0)} / -${st.getLong(1)}")
        def agg(from: String) = s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY log_index""".stripMargin)
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(s"$cat.nfp VERSION AS OF $pinAfter")
            .withColumn("src", lit("post")))
          .select(col("src"), col("log_index"), col("n"), col("sum_a0"))
          .orderBy(col("src"), col("log_index"))
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"restore lifecycle fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s)")
        out
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |post AS (SELECT k, cents + CASE WHEN k < 2000 AND k % 10 = 0
        |      THEN 100 ELSE 0 END AS a0
        |    FROM base
        |  UNION ALL SELECT k, cents FROM base WHERE k % 23 = 0)
        |SELECT 'cur' AS src, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_a0
        |  FROM base GROUP BY 2
        |UNION ALL
        |SELECT 'post' AS src, CAST(k % 7 AS BIGINT) AS log_index,
        |    count(*) AS n, CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM post GROUP BY 2
        |ORDER BY 1, 2""".stripMargin)),

    // PURE-SQL STREAMING SINK — `writeStream.format("lake")` in upsert
    // mode drains the SAME three CDC tranches s13 drives through the
    // Scala upsertStream, so the same oracle recomputation grades the
    // same final merged state through the SQL surface. The row then
    // FORCES the hard crash window: the `_streamtxn/` progress marker
    // is deleted outright and the last batch replayed through a fresh
    // sink with the same identity — the `#txn=appId:batchId` header
    // (atomic with each upsert's manifest publish) must carry the
    // high-water alone, skip the replay wholesale, and leave the
    // commit log WITHOUT a duplicate data-changing commit. Reads stay
    // manifest-served (zero recursive listings).
    ("s32_sql_sink",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val root = s"/tmp/graft-sqlsink-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val (srcDir, schema) = cdcChangeTranches(s, d)
        val appId = "s32-sink"
        Llm.streamTempRunFor("graft-sqlsink-ck") { base =>
          val src = graft.streaming.Streaming.fileStream(s, srcDir, schema,
            maxFilesPerTrigger = 1)
          val q = src.writeStream.format("lake")
            .option("root", root).option("table", Schemas.Nfp)
            .option("mode", "upsert")
            .option("keys", "chain_name,transaction_hash")
            .option("orderBy", "block_number,log_index")
            .option("deleteCol", "__del")
            .option("txnAppId", appId)
            .option("checkpointLocation", s"$base/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          // forced MARKER-LESS replay (the LakeSinkSpec crash seam):
          // with the marker gone, only the commit headers know batch 2
          // was applied
          val fsys = new org.apache.hadoop.fs.Path(root).getFileSystem(
            s.sparkContext.hadoopConfiguration)
          fsys.delete(new org.apache.hadoop.fs.Path(
            s"$root/_streamtxn/${Schemas.Nfp}"), true)
          val hw = lake.lastSinkBatch(Schemas.Nfp, appId)
          require(hw == 2L,
            s"upsert commit #txn headers must carry high-water 2, got $hw")
          val commits = lake.commitHistory(Schemas.Nfp).size
          val lastTranche = new java.io.File(srcDir).listFiles()
            .filter(f => f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("."))
            .maxBy(_.lastModified).getPath
          val sink = new graft.streaming.LakeSink(s, root, Schemas.Nfp,
            "upsert", Seq("chain_name", "transaction_hash"),
            Seq("block_number", "log_index"), Some("__del"),
            retain = false, appId = appId)
          sink.addBatch(2L, s.read.schema(schema).parquet(lastTranche))
          require(sink.skips.get() == 1L,
            "marker-less replay of batch 2 was not skipped")
          require(lake.commitHistory(Schemas.Nfp).size == commits,
            "marker-less replay landed a duplicate data-changing commit")
          val out = cdcMergedAggregate(lake).localCheckpoint()
          require(lake.listCalls.get() == 0L,
            s"sink lifecycle fell back to ${lake.listCalls.get()} " +
              "recursive listing(s) - reads must be manifest-served")
          out
        }.orderBy(col("log_index"))
      }): Q,
      Some(cdcMergedOracle)),

    // DELETION VECTORS — round-18's merge-on-read row-level deletes
    // (Delta DVs / Iceberg position deletes): with `dv.maxFraction`
    // set, a small SQL DELETE writes per-file position sidecars
    // instead of copy-on-write rewrites — the in-row require pins the
    // headline contract (the data file set is UNCHANGED across it) —
    // while a large delete still CoWs, an upsert's small churn
    // vector-deletes its pre-images in place, compaction MATERIALIZES
    // one chain's vectors, and a final small delete leaves a live
    // vector in the graded state. The 'pin' leg re-reads a snapshot
    // taken mid-history (its PINNED vectors applied, later growth
    // invisible). Every read is manifest-served (zero listings), and
    // the whole mixed CoW/vector history must hash-match the oracle's
    // straight recomputation from orders.
    ("s34_deletion_vectors",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-dv-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        (0 until 2).foreach(j =>
          lake.append(nfpFromOrders(
            orders.filter(k >= j * h && k < (j + 1) * h), twoChains = true)
            .coalesce(1), Schemas.Nfp))
        lake.setTableProperties(Schemas.Nfp,
          Map("dv.maxFraction" -> "0.3"))
        val cat = "graft_dv_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        // 1. SMALL SQL DELETE (~1/7 of each ethereum file): must take
        //    vectors — ZERO data files rewritten
        val before = lake.fileInventory(Schemas.Nfp).map(_._2).toSet
        s.sql(s"""DELETE FROM $cat.nfp
          | WHERE log_index = 3 AND chain_name = 'ethereum'""".stripMargin)
        require(lake.fileInventory(Schemas.Nfp).map(_._2).toSet == before,
          "the small DELETE rewrote data files - merge-on-read must " +
            "write vectors only")
        require(lake.dvMapOf(Schemas.Nfp).nonEmpty,
          "the small DELETE left no deletion vectors")
        // 2. snapshot pin WITH vectors (the 'pin' leg's state)
        val pin = lake.snapshot(Schemas.Nfp)
        // 3. LARGE delete (3/7 of the base chain): falls back to CoW
        val stBig = lake.deleteWhereRetrying(Schemas.Nfp,
          col("log_index").isin(0L, 1L, 2L) &&
            col("chain_name") === "base", retain = true)
        require(stBig.landedFiles >= 1 && stBig.rewrittenBytes > 0L,
          s"a 43% delete must copy-on-write, got $stBig")
        // 4. small-churn upsert: updates vector-delete their
        //    pre-images in place, tombstones vector-delete outright
        val upd = nfpFromOrders(orders.filter(
            pmod(k, lit(10)) === 0 && pmod(k, lit(90)) =!= 0),
            twoChains = true)
          .withColumn("amount0",
            (col("amount0").cast("long") + 5).cast("string"))
          .withColumn("__del", lit(false))
          .unionByName(nfpFromOrders(orders.filter(pmod(k, lit(90)) === 0),
            twoChains = true).withColumn("__del", lit(true)))
        val stUp = lake.upsertRetrying(upd, Schemas.Nfp,
          Seq("chain_name", "transaction_hash"),
          deleteCol = Some("__del"), retain = true)
        require(stUp.rewrittenBytes == 0L,
          s"the small-churn upsert must be vector-only, got $stUp")
        // 5. compaction MATERIALIZES the ethereum chain's vectors
        require(lake.compact(Schemas.Nfp, targetBytes = 1L << 30,
          retain = true, onlyChains = Seq("ethereum")) >= 1)
        require(!lake.dvMapOf(Schemas.Nfp).keys
            .exists(_.contains("chain_name=ethereum")),
          "compaction must materialize the chain's vectors")
        // 6. a final small vector delete on base stays LIVE in the
        //    graded state (base now holds log_index 3..6 - 1/4 fits)
        val stFin = lake.deleteWhereRetrying(Schemas.Nfp,
          col("log_index") === 6L && col("chain_name") === "base",
          retain = true)
        require(stFin.rewrittenBytes == 0L && stFin.landedFiles == 0,
          s"the final small delete must be vector-only, got $stFin")
        require(lake.dvMapOf(Schemas.Nfp).nonEmpty,
          "the graded state must carry a live vector")
        def agg(from: String) = s.sql(
          s"""SELECT chain_name, log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $from GROUP BY chain_name, log_index""".stripMargin)
        val out = agg(s"$cat.nfp").withColumn("src", lit("cur"))
          .unionAll(agg(s"$cat.nfp VERSION AS OF $pin")
            .withColumn("src", lit("pin")))
          .select(col("src"), col("chain_name"), col("log_index"),
            col("n"), col("sum_a0"))
          .orderBy(col("src"), col("chain_name"), col("log_index"))
          .localCheckpoint()
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the DV lifecycle fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        require(lake.listCalls.get() == 0L,
          s"the Scala-side DV ops performed ${lake.listCalls.get()} " +
            "recursive listing(s)")
        out
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT k, cents,
        |    CASE WHEN k % 2 = 0 THEN 'ethereum' ELSE 'base' END AS chain,
        |    k % 7 AS li FROM base),
        |pin AS (SELECT chain, li, cents AS a0 FROM r
        |  WHERE NOT (chain = 'ethereum' AND li = 3)),
        |cur AS (SELECT chain, li,
        |    CASE WHEN chain = 'ethereum' AND k % 10 = 0 AND k % 90 <> 0
        |      THEN cents + 5 ELSE cents END AS a0
        |  FROM r
        |  WHERE CASE WHEN chain = 'ethereum'
        |    THEN (li <> 3 OR (k % 10 = 0 AND k % 90 <> 0)) AND k % 90 <> 0
        |    ELSE li NOT IN (0, 1, 2, 6) END)
        |SELECT 'cur' AS src, chain AS chain_name,
        |    CAST(li AS BIGINT) AS log_index, count(*) AS n,
        |    CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM cur GROUP BY 2, 3
        |UNION ALL
        |SELECT 'pin' AS src, chain AS chain_name,
        |    CAST(li AS BIGINT) AS log_index, count(*) AS n,
        |    CAST(sum(a0) AS BIGINT) AS sum_a0
        |  FROM pin GROUP BY 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)),

    // METADATA-ONLY AGGREGATES — round-18's answer-from-metadata fast
    // path (Delta/Iceberg's COUNT/MIN/MAX without a scan): a bare
    // aggregate over a stats-complete lake table plans as a
    // LocalTableScan — literally ZERO scan tasks, require'd in-row —
    // served from the manifest's file list + the stats sidecar's row
    // counts and bounds. The 'scan' leg proves the FALLBACK on a
    // stats-disabled twin (same data, ordinary scan, same values);
    // the 'dv' leg deletes merge-on-read and cross-checks the
    // vector-adjusted metadata count against the scan's answer.
    ("s35_metadata_aggs",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        val root = s"/tmp/graft-metaagg-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        lake.dropTable("nfp_nostats")
        val mx = orders.agg(max(k)).first().getLong(0)
        val h = mx / 2 + 1
        (0 until 2).foreach { j =>
          val wave = nfpFromOrders(
            orders.filter(k >= j * h && k < (j + 1) * h), twoChains = true)
          lake.append(wave.coalesce(1), Schemas.Nfp)
        }
        // the fallback twin: same rows, stats collection disabled
        lake.createTable("nfp_nostats", lake.effectiveSchema(Schemas.Nfp))
        lake.setTableProperties("nfp_nostats",
          Map("stats.collect" -> "false"))
        lake.append(nfpFromOrders(orders, twoChains = true).coalesce(1),
          "nfp_nostats")
        val cat = "graft_ma_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        def aggDf(from: String) = s.sql(
          s"""SELECT count(*) AS n, min(block_number) AS mn,
             |  max(block_number) AS mx, min(transaction_hash) AS smn,
             |  max(transaction_hash) AS smx FROM $from""".stripMargin)
        def metadataServed(df: org.apache.spark.sql.DataFrame): Boolean = {
          val plan = df.queryExecution.executedPlan.toString
          plan.contains("LocalTableScan") && !plan.contains("BatchScan") &&
            !plan.contains("FileScan")
        }
        val meta = aggDf(s"$cat.nfp")
        require(metadataServed(meta),
          "the bare aggregate scheduled scan tasks - it must serve " +
            "from manifest + sidecar metadata alone:\n" +
            meta.queryExecution.executedPlan)
        val scan = aggDf(s"$cat.nfp_nostats")
        require(!metadataServed(scan),
          "the stats-disabled twin must fall back to an ordinary scan")
        // merge-on-read delete, then the vector-adjusted count must
        // match the scanned truth exactly
        lake.setTableProperties(Schemas.Nfp,
          Map("dv.maxFraction" -> "0.3"))
        s.sql(s"""DELETE FROM $cat.nfp
          | WHERE log_index = 3 AND chain_name = 'ethereum'""".stripMargin)
        require(lake.dvMapOf(Schemas.Nfp).nonEmpty,
          "the small DELETE must take vectors")
        val dv = aggDf(s"$cat.nfp")
        val dvN = dv.first().getLong(0)
        require(lake.metadataRowCount(Schemas.Nfp).contains(dvN),
          s"vector-adjusted metadata count diverged from the scan: " +
            s"${lake.metadataRowCount(Schemas.Nfp)} vs $dvN")
        def tag(df: org.apache.spark.sql.DataFrame, src: String) =
          df.withColumn("src", lit(src)).select(col("src"), col("n"),
            col("mn"), col("mx"), col("smn"), col("smx"))
        tag(dv, "dv").unionAll(tag(meta, "meta"))
          .unionAll(tag(scan, "scan"))
          .orderBy(col("src")).localCheckpoint()
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k FROM orders),
        |full_v AS (SELECT count(*) AS n,
        |    min(1000 + k % 97) AS mn, max(1000 + k % 97) AS mx,
        |    min(concat('0xtx', lpad(CAST(k AS VARCHAR), 12, '0'))) AS smn,
        |    max(concat('0xtx', lpad(CAST(k AS VARCHAR), 12, '0'))) AS smx
        |  FROM base),
        |dv_v AS (SELECT count(*) AS n,
        |    min(1000 + k % 97) AS mn, max(1000 + k % 97) AS mx,
        |    min(concat('0xtx', lpad(CAST(k AS VARCHAR), 12, '0'))) AS smn,
        |    max(concat('0xtx', lpad(CAST(k AS VARCHAR), 12, '0'))) AS smx
        |  FROM base WHERE NOT (k % 2 = 0 AND k % 7 = 3))
        |SELECT 'dv' AS src, * FROM dv_v
        |UNION ALL SELECT 'meta' AS src, * FROM full_v
        |UNION ALL SELECT 'scan' AS src, * FROM full_v
        |ORDER BY 1""".stripMargin)),

    // DYNAMIC FILE PRUNING — round-18's star-join lever (Delta DFP /
    // Iceberg runtime filtering, via Spark's SupportsRuntimeFiltering
    // seam): the dim side's surviving join-key values reach the fact
    // scan at EXECUTION time and whole fact files drop through the
    // stats sidecar's [min, max] envelopes before any task schedules.
    // Graded requires: at least one runtime walk kept exactly 1 of 4
    // fact files (seam-counted, never timing), the plan carries a
    // dynamic-pruning subquery, and planning stayed zero-listing.
    ("s36_dynamic_file_pruning",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        // block_number = 1000 + k: monotone in the wave key, so each
        // single-file wave carries a TIGHT disjoint range on the JOIN
        // key — the layout a clustered/append-ordered fact table has
        def derive(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
            .as("transaction_hash"),
          (lit(1000L) + k).as("block_number"),
          pmod(k, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .cast("string").as("amount0"),
          pmod(k, lit(1000)).cast("string").as("amount1"),
          pmod(k, lit(997)).cast("string").as("tokenId"),
          pmod(k, lit(7)).as("log_index"))
        val mx = orders.agg(max(k)).first().getLong(0)
        val q = mx / 4 + 1
        val root = s"/tmp/graft-dfp-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        lake.dropTable("dfp_dim")
        (0 until 4).foreach(j =>
          lake.append(derive(orders.filter(k >= j * q && k < (j + 1) * q))
            .coalesce(1), Schemas.Nfp))
        // the dim: every 29th key, 'hit' ONLY in wave 1 — the static
        // dim filter is what makes runtime pruning possible. A lake
        // table so the filter survives as a Filter node (a
        // LocalRelation dim constant-folds it away).
        locally {
          import org.apache.spark.sql.types._
          lake.createTable("dfp_dim", StructType(Seq(
            StructField("chain_name", StringType, nullable = true),
            StructField("bn", LongType, nullable = true),
            StructField("grp", StringType, nullable = true))))
        }
        lake.append(orders.filter(pmod(k, lit(29)) === 0).select(
          lit("ethereum").as("chain_name"),
          (lit(1000L) + k).as("bn"),
          when(k >= q && k < 2 * q, lit("hit")).otherwise(lit("miss"))
            .as("grp")).coalesce(1), "dfp_dim")
        val cat = "graft_dfp_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        val dirStr = s"$root/${Schemas.Nfp}"
        def seam = graft.plans.DataSkipping.skipStats(dirStr)
          .getOrElse((0L, 0L))
        val s0 = seam
        val joined = s.sql(
          s"""SELECT f.log_index, count(*) AS n,
             |  CAST(sum(CAST(f.amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $cat.${Schemas.Nfp} f JOIN $cat.dfp_dim d
             |  ON f.block_number = d.bn
             |WHERE d.grp = 'hit'
             |GROUP BY f.log_index
             |ORDER BY f.log_index""".stripMargin)
        // checkpoint AFTER capturing the join's own plan — the
        // checkpointed frame is a LogicalRDD with the original plan
        // (and its runtime-filter evidence) gone
        val out = joined.localCheckpoint()
        val s1 = seam
        val (cand, kept) = (s1._1 - s0._1, s1._2 - s0._2)
        // every data-filtered walk covers the 4 fact files: static
        // pushdown (isnotnull) keeps 4/4, the RUNTIME walk keeps 1/4
        // — each runtime-pruned walk is a deficit of exactly 3
        require(cand > 0 && cand % 4 == 0 && (cand - kept) % 3 == 0 &&
          (cand - kept) / 3 >= 1,
          s"dynamic file pruning kept $kept of $cand candidate files " +
            "- expected at least one runtime walk keeping 1 of 4")
        require(joined.queryExecution.executedPlan.toString
            .contains("dynamicpruning"),
          "no dynamic-pruning subquery was planted on the fact scan")
        val catLake = graft.sources.LakeCatalog.instance(cat)
          .flatMap(_.currentLake).getOrElse(
            throw new IllegalStateException("catalog served no query"))
        require(catLake.listCalls.get() == 0L,
          s"the SQL catalog fell back to ${catLake.listCalls.get()} " +
            "recursive listing(s) - plans must be manifest-served")
        out
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |qq AS (SELECT (max(k) // 4) + 1 AS q FROM base),
        |hit AS (SELECT k FROM base, qq
        |  WHERE k % 29 = 0 AND k >= q AND k < 2 * q)
        |SELECT CAST(b.k % 7 AS BIGINT) AS log_index, count(*) AS n,
        |  CAST(sum(b.cents) AS BIGINT) AS sum_a0
        |FROM base b JOIN hit h ON b.k = h.k
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // WRITE CONSTRAINTS — round-18's Delta-style invariants: CHECK
    // expressions + NOT NULL columns declared through SQL DDL
    // (ALTER TABLE SET TBLPROPERTIES), validated against existing
    // rows at declaration and enforced on every data-adding path.
    // Graded legs, all in-row: a violating SQL INSERT refuses naming
    // the constraint with the table untouched; a violating SQL UPDATE
    // dies at the staged-file gate unpublished; tombstones stay
    // exempt; declaring a constraint existing data violates refuses;
    // and the surviving lifecycle's final state hash-matches the
    // oracle's recomputation.
    ("s37_write_constraints",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
            .as("transaction_hash"),
          (lit(1000L) + k).as("block_number"),
          pmod(k, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .cast("string").as("amount0"),
          pmod(k, lit(1000)).cast("string").as("amount1"),
          pmod(k, lit(997)).cast("string").as("tokenId"),
          pmod(k, lit(7)).as("log_index"))
        val root = s"/tmp/graft-ck-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        lake.append(derive(orders.filter(pmod(k, lit(17)) =!= 0))
          .coalesce(2), Schemas.Nfp)
        val cat = "graft_ck_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        // declare through the SQL DDL surface
        s.sql(s"""ALTER TABLE $cat.${Schemas.Nfp} SET TBLPROPERTIES(
          |  'constraint.check.nonneg_amount' =
          |    'CAST(amount0 AS BIGINT) >= 0',
          |  'constraint.notnull' = 'transaction_hash')""".stripMargin)
        // legal SQL INSERT passes the inline guard
        derive(orders.filter(pmod(k, lit(17)) === 0))
          .createOrReplaceTempView("ck_tranche")
        s.sql(s"INSERT INTO $cat.${Schemas.Nfp} " +
          "SELECT * FROM ck_tranche")
        def version = lake.latestCommitVersion(Schemas.Nfp)
        // 1. violating INSERT refuses naming the constraint; nothing
        //    lands
        val v1 = version
        val e1 = try {
          s.sql(s"INSERT INTO $cat.${Schemas.Nfp} SELECT chain_name, " +
            "name, transaction_hash, block_number, tx_index, " +
            "from_address, amount, '-1' AS amount0, amount1, tokenId, " +
            "log_index FROM ck_tranche")
          null: Throwable
        } catch { case t: Throwable => t }
        require(e1 != null, "a violating INSERT must refuse")
        def causes(t: Throwable): String = {
          var c = t; val sb = new StringBuilder
          while (c != null) { sb.append(c.getMessage).append('\n')
            c = c.getCause }
          sb.toString
        }
        require(causes(e1).contains("nonneg_amount"),
          s"violation must name the constraint:\n${causes(e1)}")
        require(version == v1, "the violating INSERT landed a commit")
        // 2. tombstones are EXEMPT: delete k%101==0 with a payload
        //    that would violate the CHECK
        lake.upsert(derive(orders.filter(pmod(k, lit(101)) === 0))
          .withColumn("amount0", lit("-999"))
          .withColumn("__del", lit(true)),
          Schemas.Nfp, Seq("chain_name", "transaction_hash"),
          deleteCol = Some("__del"))
        // 3. legal SQL UPDATE passes the staged-file gate
        s.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount0 = '0' " +
          "WHERE log_index = 5")
        // 4. violating SQL UPDATE dies AT THE GATE, unpublished
        val v4 = version
        val e4 = try {
          s.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount0 = '-5' " +
            "WHERE log_index = 3")
          null: Throwable
        } catch { case t: Throwable => t }
        require(e4 != null && causes(e4).contains("nonneg_amount"),
          "a violating UPDATE must refuse naming the constraint")
        require(version == v4, "the violating UPDATE published")
        // 5. declaring a constraint existing rows violate refuses and
        //    commits nothing
        val e5 = try {
          lake.setTableProperties(Schemas.Nfp, Map(
            "constraint.check.impossible" ->
              "CAST(amount1 AS BIGINT) < 0"))
          null: Throwable
        } catch { case t: Throwable => t }
        require(e5 != null && !lake.tableProperties(Schemas.Nfp)
            .contains("constraint.check.impossible"),
          "ADD CONSTRAINT over violating data must refuse uncommitted")
        s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $cat.${Schemas.Nfp}
             |GROUP BY log_index ORDER BY log_index""".stripMargin)
          .localCheckpoint()
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (SELECT k,
        |    CASE WHEN k % 7 = 5 THEN 0 ELSE cents END AS a0
        |  FROM base WHERE k % 101 <> 0)
        |SELECT CAST(k % 7 AS BIGINT) AS log_index, count(*) AS n,
        |  CAST(sum(a0) AS BIGINT) AS sum_a0
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin)),

    // GENERATED COLUMNS — Delta's GENERATED ALWAYS AS, as
    // `generated.col.<name>` table properties: a write omitting the
    // column gets it COMPUTED from the expression; one supplying it
    // gets every row VALIDATED null-safely (divergence refuses
    // naming the column, nothing lands); declaring an expression the
    // existing rows diverge from refuses uncommitted. The graded
    // state mixes computed and validated waves and hash-matches the
    // oracle's recomputation of the expression.
    ("s38_generated_columns",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
            .as("transaction_hash"),
          (lit(1000L) + k).as("block_number"),
          pmod(k, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .cast("string").as("amount0"),
          pmod(k, lit(1000)).cast("string").as("amount1"),
          pmod(k, lit(997)).cast("string").as("tokenId"),
          pmod(k, lit(7)).as("log_index"))
        val root = s"/tmp/graft-gen-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        lake.append(derive(orders.filter(pmod(k, lit(3)) === 0))
          .coalesce(1), Schemas.Nfp)
        val cat = "graft_gen_" +
          Llm.sfCacheKey(d).replaceAll("[^A-Za-z0-9]", "_")
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LakeCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        // 1. declaring an expression the existing rows diverge from
        //    refuses and commits nothing
        val eDecl = try {
          lake.setTableProperties(Schemas.Nfp, Map(
            "generated.col.log_index" -> "pmod(block_number, 5)"))
          null: Throwable
        } catch { case t: Throwable => t }
        require(eDecl != null && !lake.tableProperties(Schemas.Nfp)
            .contains("generated.col.log_index"),
          "a diverging generation expression must refuse uncommitted")
        // 2. the matching expression declares through SQL DDL, plus a
        //    DEFAULT on `name` (filled when omitted, never validated)
        s.sql(s"""ALTER TABLE $cat.${Schemas.Nfp} SET TBLPROPERTIES(
          |  'generated.col.log_index' =
          |    'pmod(block_number - 1000, 7)',
          |  'default.col.name' = '''IncreaseLiquidity''')""".stripMargin)
        // 3. COMPUTED: a batch omitting BOTH the generated column and
        //    the defaulted one
        lake.append(derive(orders.filter(pmod(k, lit(3)) === 1))
          .drop("log_index").drop("name").coalesce(1), Schemas.Nfp)
        require(lake.read(Schemas.Nfp)
            .filter(col("name").isNull ||
              col("name") =!= "IncreaseLiquidity").count() == 0L,
          "the omitted defaulted column must read back as its default")
        // 4. VALIDATED: a correct supplied batch through SQL INSERT
        derive(orders.filter(pmod(k, lit(3)) === 2))
          .createOrReplaceTempView("gen_tranche")
        s.sql(s"INSERT INTO $cat.${Schemas.Nfp} " +
          "SELECT * FROM gen_tranche")
        // 5. a divergent supplied batch refuses naming the column
        def version = lake.latestCommitVersion(Schemas.Nfp)
        val v0 = version
        val eBad = try {
          s.sql(s"INSERT INTO $cat.${Schemas.Nfp} SELECT chain_name, " +
            "name, concat(transaction_hash, 'x'), block_number, " +
            "tx_index, from_address, amount, amount0, amount1, " +
            "tokenId, 99 AS log_index FROM gen_tranche")
          null: Throwable
        } catch { case t: Throwable => t }
        def causes(t: Throwable): String = {
          var c = t; val sb = new StringBuilder
          while (c != null) { sb.append(c.getMessage).append('\n')
            c = c.getCause }
          sb.toString
        }
        require(eBad != null &&
          causes(eBad).contains("generated column log_index"),
          "a divergent supplied batch must refuse naming the column")
        require(version == v0, "the divergent INSERT landed a commit")
        s.sql(
          s"""SELECT log_index, count(*) AS n,
             |  CAST(sum(CAST(amount0 AS BIGINT)) AS BIGINT) AS sum_a0
             |FROM $cat.${Schemas.Nfp}
             |GROUP BY log_index ORDER BY log_index""".stripMargin)
          .localCheckpoint()
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(k % 7 AS BIGINT) AS log_index, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_a0
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INCREMENTAL MATERIALIZED VIEW — SUM/COUNT aggregates stored as
    // a lake table and refreshed in O(changed files) from the commit
    // log's change feed (inserts add, deletes subtract, rewrite-only
    // commits contribute nothing), with exactly-once bookkeeping on
    // the #txn sink-transaction machinery. Graded legs, in-row: the
    // initial refresh is a FULL load, the post-churn refresh is
    // INCREMENTAL, the no-change refresh is a NOOP, and the final
    // view equals a from-scratch recomputation (exceptAll both ways)
    // before hash-matching the oracle.
    ("s39_materialized_view",
      ((s: SparkSession, d: String) => {
        import graft.v3.{Lake, Schemas}
        val orders = Tables.orders(s, d)
        val k = col("o_orderkey")
        def derive(df: org.apache.spark.sql.DataFrame) = df.select(
          lit("ethereum").as("chain_name"),
          lit("IncreaseLiquidity").as("name"),
          concat(lit("0xtx"), lpad(k.cast("string"), 12, "0"))
            .as("transaction_hash"),
          (lit(1000L) + k).as("block_number"),
          pmod(k, lit(13)).as("tx_index"),
          concat(lit("0xu"), col("o_custkey").cast("string"))
            .as("from_address"),
          col("o_custkey").cast("string").as("amount"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .cast("string").as("amount0"),
          pmod(k, lit(1000)).cast("string").as("amount1"),
          pmod(k, lit(997)).cast("string").as("tokenId"),
          pmod(k, lit(7)).as("log_index"))
        val root = s"/tmp/graft-mv-lake/${Llm.sfCacheKey(d)}"
        val lake = new Lake(s, root)
        lake.dropTable(Schemas.Nfp)
        lake.dropTable("nfp_mv")
        lake.append(derive(orders.filter(pmod(k, lit(3)) =!= 2))
          .coalesce(1), Schemas.Nfp)
        lake.createMaterializedView("nfp_mv", Schemas.Nfp,
          Seq("chain_name", "log_index"),
          Map("cents" -> "CAST(amount0 AS BIGINT)"))
        val r1 = lake.refreshMaterializedView("nfp_mv")
        require(r1.mode == "full",
          s"the initial refresh must be a full load, got $r1")
        // churn: an insert wave, +5 updates on k%10==0 (k%90!=0),
        // deletes of k%90==0
        lake.append(derive(orders.filter(pmod(k, lit(3)) === 2))
          .coalesce(1), Schemas.Nfp)
        lake.upsertRetrying(
          derive(orders.filter(pmod(k, lit(10)) === 0 &&
              pmod(k, lit(90)) =!= 0))
            .withColumn("amount0",
              (col("amount0").cast("long") + 5).cast("string"))
            .withColumn("__del", lit(false))
            .unionByName(derive(orders.filter(pmod(k, lit(90)) === 0))
              .withColumn("__del", lit(true))),
          Schemas.Nfp, Seq("chain_name", "transaction_hash"),
          deleteCol = Some("__del"), retain = true)
        val r2 = lake.refreshMaterializedView("nfp_mv")
        require(r2.mode == "incremental",
          s"the post-churn refresh must be incremental, got $r2")
        val r3 = lake.refreshMaterializedView("nfp_mv")
        require(r3.mode == "noop",
          s"an up-to-date view must refresh as a noop, got $r3")
        // the view must equal a from-scratch recomputation EXACTLY
        val mv = lake.read("nfp_mv")
          .select(col("chain_name"), col("log_index"), col("cents"),
            col("mv_count"))
        val exp = lake.read(Schemas.Nfp)
          .groupBy(col("chain_name"), col("log_index"))
          .agg(sum(col("amount0").cast("long")).cast("long")
            .as("cents"), count(lit(1)).as("mv_count"))
        // multiset equality in ONE action (guide §2.4): signed-count
        // union — any row whose +1/−1 tallies don't cancel is a
        // divergence. Same strength as the two-sided exceptAll (robust
        // to duplicate keys on either side) at half the passes: the
        // old form ran TWO count() actions, each re-evaluating both
        // aggregates.
        require(mv.withColumn("__sgn", lit(1L))
            .unionByName(exp.withColumn("__sgn", lit(-1L)))
            .groupBy(col("chain_name"), col("log_index"), col("cents"),
              col("mv_count"))
            .agg(sum(col("__sgn")).as("__d"))
            .filter(col("__d") =!= 0L)
            .isEmpty,
          "the refreshed view diverged from a from-scratch recompute")
        require(lake.listCalls.get() == 0L,
          s"the MV lifecycle performed ${lake.listCalls.get()} " +
            "recursive listing(s) - refresh must be manifest-served")
        mv.orderBy(col("chain_name"), col("log_index"))
          .localCheckpoint()
      }): Q,
      Some("""WITH base AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |after AS (SELECT k,
        |    CASE WHEN k % 10 = 0 AND k % 90 <> 0 THEN cents + 5
        |      ELSE cents END AS c
        |  FROM base WHERE k % 90 <> 0)
        |SELECT 'ethereum' AS chain_name, CAST(k % 7 AS BIGINT)
        |    AS log_index, CAST(sum(c) AS BIGINT) AS cents,
        |  count(*) AS mv_count
        |FROM after GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
