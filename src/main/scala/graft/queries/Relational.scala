package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Ops

/** Oracle-checked queries covering SURVEY.md §2's relational inventory
  * (S1, P1–P12, J1–J4, A1–A9, W1–W4, O1–O4) over the driver testdata.
  * Each entry name carries the operator ids it exercises; the DuckDB SQL
  * in `oracle` is the semantic contract.
  *
  * Determinism rules (SURVEY.md §7.4 risk #1/#3):
  *  - every result has a total ORDER BY on a unique key in both engines;
  *  - double aggregates whose addition order is engine-dependent are
  *    `round`-ed identically on both sides;
  *  - `events.ts` is generation-dependent (ns-epoch LongType or
  *    TIMESTAMP — see [[graft.Tables]]); queries use the derived
  *    `ts_us` epoch-microseconds key (`epoch_us(ts)` in DuckDB) —
  *    exact integer event-time, never truncated.
  *  - int64-range assumption, every `CAST(sum(…) AS BIGINT)`: DuckDB
  *    sums into HUGEINT and the cast ERRORS LOUDLY past int64, where
  *    Spark's non-ANSI sum would silently wrap — unreachable at any
  *    test scale, and a loud oracle error beats a silent divergence.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame
  /** 2024-02-01T00:00:00Z as epoch-ns — W4 point-in-time bound. */
  private val Cutoff = 1706745600000000L

  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("s1_p2_scan_filter_project",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R" &&
            col("l_shipdate") >= lit("1995-07-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))): Q,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-07-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("p4_p5_computed_cast",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")) * 100 + 0.5).cast("long").as("charge_c"),
            col("l_quantity").cast("long").as("qty_int"),
            upper(col("l_returnflag")).as("flag_uc"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))): Q,
      Some("""SELECT l_orderkey, l_linenumber,
        |CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS charge_c,
        |CAST(l_quantity AS BIGINT) AS qty_int,
        |upper(l_returnflag) AS flag_uc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("a1_groupby_sum",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            count(lit(1)).as("n_rows"),
            round(avg(col("l_quantity")), 4).as("avg_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))): Q,
      Some("""SELECT l_returnflag, l_linestatus,
        |sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |count(*) AS n_rows,
        |round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // the same aggregation as a1 through the salted two-phase plan
    // (Ops.saltedAgg): the hot-key scale lever, proven equivalent under
    // the oracle gate, not just in a spec. Money is integerized to
    // cents PER ROW (not round-after-sum) because the salted plan's
    // partial fold order differs from the oracle's single sum — integer
    // sums are exact under any fold order; avg is derived from the two
    // exact sums so it is a single deterministic division
    ("a1_groupby_sum_salted",
      ((s: SparkSession, d: String) =>
        Ops.saltedAgg(Tables.lineitem(s, d),
            keys = Seq(col("l_returnflag"), col("l_linestatus")),
            saltBy = col("l_orderkey"), salts = 8,
            partialAggs = Seq(
              sum(col("l_quantity")).as("s_qty"),
              sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
                * 100 + 0.5).cast("long")).as("s_dp_c"),
              count(lit(1)).as("s_n")),
            finalAggs = Seq(
              sum(col("s_qty")).as("sum_qty"),
              sum(col("s_dp_c")).as("sum_disc_price_c"),
              sum(col("s_n")).as("n_rows"),
              floor(sum(col("s_qty")) / sum(col("s_n")) * 10000 + 0.5)
                .cast("long").as("avg_qty_e4")))
          .orderBy(col("l_returnflag"), col("l_linestatus"))): Q,
      Some("""SELECT l_returnflag, l_linestatus,
        |sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |  AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
        |count(*) AS n_rows,
        |CAST(floor(sum(l_quantity) / count(*) * 10000 + 0.5) AS BIGINT)
        |  AS avg_qty_e4
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    ("a10_rollup",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)): Q,
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |count(*) AS n_rows,
        |GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)),

    // CUBE (the rollup's sibling): all 2^k grouping sets in one
    // partial-aggregated pass, gid disambiguating the null-as-total
    // levels exactly as in a10
    ("a19_cube",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)): Q,
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |count(*) AS n_rows,
        |GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)),

    ("a2_last_per_key",
      ((s: SparkSession, d: String) =>
        Ops.lastPerKey(Tables.events(s, d),
            keys = Seq(col("user_id")), order = Seq(col("ts_us"), col("event_id")))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"), col("value"))
          .orderBy(col("user_id"))): Q,
      Some("""SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin)),

    ("a3_global_minmax",
      ((s: SparkSession, d: String) =>
        Tables.orders(s, d)
          .agg(max(col("o_totalprice")).as("max_price"),
            min(col("o_totalprice")).as("min_price"),
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_custs"),
            min(col("o_orderdate")).cast("timestamp").cast("long").as("min_date_s"))): Q,
      Some("""SELECT max(o_totalprice) AS max_price, min(o_totalprice) AS min_price,
        |count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs,
        |CAST(epoch(min(o_orderdate)) AS BIGINT) AS min_date_s
        |FROM orders""".stripMargin)),

    ("a5_median_quantile",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
            round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99_price"))
          .orderBy(col("l_returnflag"))): Q,
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
        |round(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    ("a6_distinct_sorted",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d).select(col("event_type")).distinct()
          .orderBy(col("event_type"))): Q,
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")),

    ("a7_resample_15m",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(Ops.bucketUs(col("ts_us"), 900).as("bucket_s"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("sum_value"),
            min(col("event_id")).as("first_event"))
          .orderBy(col("bucket_s"))): Q,
      Some("""SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s,
        |count(*) AS n_events, round(sum(value), 2) AS sum_value,
        |min(event_id) AS first_event
        |FROM events GROUP BY 1 ORDER BY bucket_s""".stripMargin)),

    ("a8_w1_cumsum",
      ((s: SparkSession, d: String) =>
        Ops.cumSum(Tables.events(s, d), col("value"),
            order = Seq(col("ts_us"), col("event_id")),
            partition = Seq(col("user_id")), out = "running")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            round(col("running"), 2).as("running"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))): Q,
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin)),

    ("w2_p9_lead",
      ((s: SparkSession, d: String) =>
        Ops.leadCol(Tables.events(s, d), col("ts_us"),
            order = Seq(col("ts_us"), col("event_id")),
            partition = Seq(col("user_id")), out = "next_ts_us")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("next_ts_us"),
            (col("next_ts_us") - col("ts_us")).as("gap_us"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))): Q,
      Some("""SELECT user_id, event_id, ts_us, next_ts_us,
        |next_ts_us - ts_us AS gap_us
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS next_ts_us
        |  FROM events)
        |ORDER BY user_id, ts_us, event_id""".stripMargin)),

    ("w3_p8_forward_fill",
      ((s: SparkSession, d: String) =>
        Ops.forwardFill(
            Tables.events(s, d).withColumn("last_purchase_value",
              when(col("event_type") === "purchase", col("value"))),
            cols = Seq("last_purchase_value"),
            order = Seq(col("ts_us"), col("event_id")),
            partition = Seq(col("user_id")))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("last_purchase_value"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))): Q,
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS last_purchase_value
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin)),

    ("w4_latest_before",
      ((s: SparkSession, d: String) =>
        Ops.latestBefore(Tables.events(s, d), col("ts_us"), lit(Cutoff),
            order = Seq(col("ts_us"), col("event_id")),
            partition = Seq(col("user_id")))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("value"))
          .orderBy(col("user_id"))): Q,
      Some(s"""SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE epoch_us(ts) < $Cutoff)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    ("j1_p7_full_outer_coalesce",
      ((s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_spent"))
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("custkey"), col("c_name"), col("c_acctbal"))
        Ops.outerCombine(c, o, Seq("custkey")).orderBy(col("custkey"))
      }): Q,
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |c.c_name, coalesce(c.c_acctbal, 0) AS c_acctbal,
        |coalesce(o.n_orders, 0) AS n_orders,
        |coalesce(o.total_spent, 0) AS total_spent
        |FROM customer c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spent
        |  FROM orders GROUP BY o_custkey) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin)),

    ("j2_asof_join",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us"), col("event_id"))
        val logins = Ops.lastPerKey(
            ev.filter(col("event_type") === "login"),
            keys = Seq(col("user_id"), col("ts_us")), order = Seq(col("event_id")))
          .select(col("user_id"), col("ts_us"), col("value"))
        Ops.asofJoin(purchases, logins, on = "ts_us", by = Seq("user_id"),
            valueCols = Seq("value"))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("value").as("login_value"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      }): Q,
      Some("""SELECT l.user_id, epoch_us(l.ts) AS ts_us, l.event_id,
        |r.value AS login_value
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM
        |  (SELECT user_id, ts, value, row_number() OVER
        |    (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |   FROM events WHERE event_type = 'login') WHERE rn = 1) r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, ts_us, l.event_id""".stripMargin)),

    ("j3_equi_theta_join",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d).join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "inner")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"),
            round(sum(col("l_extendedprice")), 2).as("revenue"))
          .orderBy(col("o_orderpriority"))): Q,
      Some("""SELECT o_orderpriority, count(*) AS n_rows,
        |round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders
        |ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    ("j5_broadcast_dim_join",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d).join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"), "inner")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("p_retailprice")), 2).as("sum_retail"))
          .orderBy(col("p_brand"))): Q,
      Some("""SELECT p_brand, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        |round(sum(p_retailprice), 2) AS sum_retail
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // interval (range) join by bucketization: error events open 5-min
    // incident windows; click events land in them via an EQUI-join on
    // the time bucket + exact refine — no nested-loop, one bounded
    // shuffle (Ops.intervalJoin; IntervalJoinSpec asserts the plan)
    ("j6_interval_bucket_join",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val intervals = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("incident_id"),
            col("ts_us").as("lo"),
            (col("ts_us") + 300000000L).as("hi"))
        val points = ev.filter(col("event_type") === "click")
          .select(col("ts_us").as("p_ts"),
            floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
        Ops.intervalJoin(points, intervals, "p_ts", "lo", "hi",
            bucketWidth = 300000000L)
          .groupBy(col("incident_id"))
          .agg(count(lit(1)).as("n_clicks"), sum(col("v_c")).as("sum_v_c"),
            min(col("p_ts")).as("first_click_us"))
          .orderBy(col("incident_id"))
      }): Q,
      Some("""WITH i AS (SELECT event_id AS incident_id, epoch_us(ts) AS lo,
        |  epoch_us(ts) + 300000000 AS hi FROM events
        |  WHERE event_type = 'error'),
        |p AS (SELECT epoch_us(ts) AS p_ts,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c FROM events
        |  WHERE event_type = 'click')
        |SELECT incident_id, count(*) AS n_clicks,
        |  CAST(sum(v_c) AS BIGINT) AS sum_v_c,
        |  min(p_ts) AS first_click_us
        |FROM i JOIN p ON p_ts >= lo AND p_ts < hi
        |GROUP BY incident_id ORDER BY incident_id""".stripMargin)),

    // salted skew join: event_type has 5 values over the whole corpus
    // (the canonical hot-key shape) — each left row salts into 8 lanes
    // and the 5-row dim replicates 8x, spreading every hot key over 8
    // tasks; result is row-identical to the plain join (the oracle IS
    // the plain join)
    ("j7_salted_skew_join",
      ((s: SparkSession, d: String) => {
        import s.implicits._
        val dim = Seq(("click", 5L), ("view", 1L), ("purchase", 20L),
          ("signup", 10L), ("error", 0L)).toDF("event_type", "weight_c")
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
        Ops.saltedJoin(ev, dim, Seq("event_type"),
            saltBy = col("event_id"), salts = 8)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("v_c") * col("weight_c")).as("wsum_c"))
          .orderBy(col("event_type"))
      }): Q,
      Some("""WITH dim(event_type, weight_c) AS (VALUES
        |  ('click', 5), ('view', 1), ('purchase', 20),
        |  ('signup', 10), ('error', 0))
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)
        |    * d.weight_c) AS BIGINT) AS wsum_c
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    ("p10_remap_broadcast",
      ((s: SparkSession, d: String) => {
        val mapping = s.createDataFrame(Seq(
          ("FRANCE", "FR"), ("GERMANY", "DE"), ("CHINA", "CN")))
          .toDF("from", "to")
        Ops.remap(Tables.nation(s, d), "n_name", mapping)
          .select(col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      }): Q,
      Some("""SELECT n_nationkey,
        |CASE n_name WHEN 'FRANCE' THEN 'FR' WHEN 'GERMANY' THEN 'DE'
        |  WHEN 'CHINA' THEN 'CN' ELSE n_name END AS n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin)),

    ("j4_union_all",
      ((s: SparkSession, d: String) => {
        val a = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), lit("purchase").as("src"))
        val b = Tables.orders(s, d)
          .select(col("o_orderkey").as("event_id"), lit("order").as("src"))
        a.unionByName(b).groupBy(col("src"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy(col("src"))
      }): Q,
      Some("""SELECT src, count(*) AS n, min(event_id) AS min_id,
        |max(event_id) AS max_id
        |FROM (SELECT event_id, 'purchase' AS src FROM events
        |      WHERE event_type = 'purchase'
        |      UNION ALL
        |      SELECT o_orderkey AS event_id, 'order' AS src FROM orders)
        |GROUP BY src ORDER BY src""".stripMargin)),

    ("o1_o3_topk",
      ((s: SparkSession, d: String) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(25)
          .select(col("o_orderkey"), col("o_totalprice"))): Q,
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    ("o5_slice",
      ((s: SparkSession, d: String) =>
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("o_orderkey"))))
          .filter(col("rn").between(101, 110))
          .select(col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("rn"))): Q,
      Some("""SELECT rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderkey, o_totalprice,
        |  row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |WHERE rn BETWEEN 101 AND 110 ORDER BY rn""".stripMargin)),

    // Z-order (Morton) layout assignment: quantize (l_partkey,
    // l_suppkey) to 16-bit ranks against exact data bounds, interleave
    // bits, bin by the top-6-bit z-prefix — per-"file" min/max ranges
    // are the parquet footer stats a 2-D-filtering scan prunes against
    // (Ops are all integer shifts/divs; LayoutSpec measures skipping)
    ("o6_zorder_layout",
      ((s: SparkSession, d: String) =>
        graft.ops.Layout.zOrderStats(Tables.lineitem(s, d),
            col("l_partkey"), col("l_suppkey"), bits = 16, fileBits = 6)
          .orderBy(col("file_id"))): Q,
      Some(s"""WITH b AS (SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
        |  min(l_suppkey) AS ymin, max(l_suppkey) AS ymax FROM lineitem),
        |q AS (SELECT l_partkey AS x, l_suppkey AS y,
        |  (l_partkey - xmin) * 65536 // (xmax - xmin + 1) AS xq,
        |  (l_suppkey - ymin) * 65536 // (ymax - ymin + 1) AS yq
        |  FROM lineitem, b),
        |z AS (SELECT x, y, ${graft.ops.Layout.zValueSql(16)} AS z FROM q)
        |SELECT z >> 26 AS file_id, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // hopping (sliding) window aggregate: Spark's native window(ts,
    // 10min, 5min) — each event lands in length/hop windows via an
    // internal explode + ONE hash aggregate (no self-join); the oracle
    // replays the 2-window expansion explicitly
    ("a14_sliding_window",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(window(timestamp_micros(col("ts_us")),
            "10 minutes", "5 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_c"))
          .select(unix_micros(col("w.start")).as("w_start_us"),
            col("event_type"), col("n"), col("sum_c"))
          .orderBy(col("w_start_us"), col("event_type"))): Q,
      Some("""WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
        |x AS (SELECT ts_us, event_type, vc,
        |  (ts_us // 300000000 - k) * 300000000 AS w_start_us
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k)
        |  WHERE ts_us >= (ts_us // 300000000 - k) * 300000000
        |    AND ts_us < (ts_us // 300000000 - k) * 300000000 + 600000000)
        |SELECT w_start_us, event_type, count(*) AS n,
        |  CAST(sum(vc) AS BIGINT) AS sum_c
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // equi-depth range-shard assignment from the histogram sketch: the
    // deterministic repartitionByRange (sampled boundaries change run
    // to run; sketch bounds are exact integers) — shard = #bounds <= v
    // via the codegen'd binary search, populations equal up to one bin
    ("o7_range_shards",
      ((s: SparkSession, d: String) =>
        graft.ops.Layout.rangeShards(
            Tables.events(s, d)
              .select(floor(col("value") * 100 + 0.5).cast("long").as("vc")),
            col("vc"), loC = 0L, hiC = 50000L, nBins = 100, shards = 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("vc")).as("min_vc"), max(col("vc")).as("max_vc"))
          .orderBy(col("shard"))): Q,
      Some("""WITH v AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |hist AS (SELECT least(greatest((vc - 0) * 100 // 50000, 0), 99) AS bin,
        |  CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |c AS (SELECT bin, n,
        |  CAST(sum(n) OVER (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(sum(n) OVER () AS BIGINT) AS total FROM hist),
        |ks AS (SELECT unnest(generate_series(1, 7)) AS k),
        |bounds AS (SELECT k,
        |  0 + min(CASE WHEN cum >= (total * k + 7) // 8 THEN bin END) * 500
        |    AS bound
        |  FROM c CROSS JOIN ks GROUP BY k),
        |s AS (SELECT vc,
        |  (SELECT CAST(count(*) AS INT) FROM bounds WHERE bound <= vc)
        |    AS shard FROM v)
        |SELECT shard, count(*) AS n_rows, min(vc) AS min_vc,
        |  max(vc) AS max_vc
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin)),

    ("f1_f3_scalar_math",
      ((s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            sqrt(col("l_extendedprice")).as("sqrt_price"),
            floor(col("l_quantity") / 7).cast("long").as("qty_div7"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            greatest(col("l_tax"), col("l_discount")).as("max_rate"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))): Q,
      Some("""SELECT l_orderkey, l_linenumber,
        |sqrt(l_extendedprice) AS sqrt_price,
        |CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
        |abs(l_discount - 0.05) AS disc_dev,
        |greatest(l_tax, l_discount) AS max_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("o3_first_where_cum_ge",
      ((s: SparkSession, d: String) =>
        Ops.firstWhereCumGE(
            Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
            value = col("o_totalprice"), threshold = lit(1000000.0),
            order = Seq(col("o_totalprice").desc, col("o_orderkey")),
            partition = Seq())
          .select(col("o_orderkey"), col("o_totalprice"),
            round(col("cum"), 2).as("cum"))): Q,
      Some("""SELECT o_orderkey, o_totalprice, round(cum, 2) AS cum
        |FROM (SELECT o_orderkey, o_totalprice,
        |  sum(o_totalprice) OVER (ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM orders)
        |WHERE cum >= 1000000
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""".stripMargin)),

    // cohort retention: first-activity day buckets × day offsets,
    // exact integer bucketing so both engines agree bit-for-bit
    // mergeable histogram sketch + quantile estimates (the scale
    // answer to A5's exact percentile): (group, bin)-keyed counts,
    // one window over <= nBins rows per group, chained conditional
    // mins — sketch and estimates replayed exactly
    ("a13_histogram_quantiles",
      ((s: SparkSession, d: String) =>
        Ops.histogramQuantiles(Tables.events(s, d),
            keys = Seq(col("event_type")),
            valueCents = floor(col("value") * 100 + 0.5).cast("long"),
            loC = 0L, hiC = 50000L, nBins = 100,
            quantiles = Seq(("p50", 1L, 2L), ("p90", 9L, 10L),
              ("p99", 99L, 100L)))
          .orderBy(col("event_type"))): Q,
      Some("""WITH vc AS (SELECT event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
        |b AS (SELECT event_type,
        |  least(greatest((vc - 0) * 100 // 50000, 0), 99) AS bin FROM vc),
        |hist AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY event_type, bin),
        |c AS (SELECT event_type, bin, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM hist)
        |SELECT event_type, max(total) AS n_total,
        |  0 + min(CASE WHEN cum >= (total * 1 + 1) // 2 THEN bin END)
        |    * 500 AS q_p50_c,
        |  0 + min(CASE WHEN cum >= (total * 9 + 9) // 10 THEN bin END)
        |    * 500 AS q_p90_c,
        |  0 + min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN bin END)
        |    * 500 AS q_p99_c
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    ("a12_retention_cohorts",
      ((s: SparkSession, d: String) =>
        Ops.retentionCohorts(Tables.events(s, d), "user_id", "ts_us",
            periodUs = 86400000000L)
          .orderBy(col("cohort_period"), col("period_offset"))): Q,
      Some("""WITH e AS (SELECT user_id,
        |  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS p FROM events),
        |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort, e.p - f.cohort AS off
        |  FROM e JOIN f USING (user_id))
        |SELECT cohort AS cohort_period, off AS period_offset,
        |  count(*) AS n_active
        |FROM a GROUP BY cohort, off
        |ORDER BY cohort_period, period_offset""".stripMargin)),

    // sequential pattern matching (conversion funnel): per-stage
    // conditional mins chained on the entity key — stage i+1 must
    // strictly follow the entity's earliest stage-i completion
    ("a11_funnel_stages",
      ((s: SparkSession, d: String) =>
        Ops.funnelStages(Tables.events(s, d), "user_id", "ts_us",
            "event_type", stages = Seq("view", "click", "purchase"))
          .orderBy(col("user_id"))): Q,
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS s1_ts FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts_us) AS s2_ts FROM e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts_us > s1_ts GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts_us) AS s3_ts FROM e
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us > s2_ts GROUP BY e.user_id)
        |SELECT s1.user_id, s1_ts, s2_ts, s3_ts,
        |  CAST(CASE WHEN s1_ts IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN s2_ts IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN s3_ts IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS stages_reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin)),

    // NATIVE session-window aggregation: Spark's session_window(ts,
    // gap) — the built-in merging-interval aggregate, graded against
    // the same lag/cumsum SQL that grades the custom sessionizers
    // (native merge semantics: a gap >= 30min starts a new session)
    ("a17_session_window_native",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(session_window(timestamp_micros(col("ts_us")),
            "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long"))
              .as("sum_value_c"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("session_start_us"),
            col("n_events"), col("sum_value_c"))
          .orderBy(col("user_id"), col("session_start_us"))): Q,
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us) AS prev FROM e),
        |s AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL
        |    OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS sid FROM l)
        |SELECT user_id, min(ts_us) AS session_start_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_c
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin)),

    // pivot (reshape family): per-user event-type counts as columns —
    // Spark's pivot with an EXPLICIT value list (no discovery pass);
    // the oracle is plain conditional aggregation
    ("a18_pivot_event_types",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .select(col("user_id"),
            coalesce(col("click"), lit(0L)).as("n_click"),
            coalesce(col("error"), lit(0L)).as("n_error"),
            coalesce(col("purchase"), lit(0L)).as("n_purchase"),
            coalesce(col("signup"), lit(0L)).as("n_signup"),
            coalesce(col("view"), lit(0L)).as("n_view"))
          .orderBy(col("user_id"))): Q,
      Some("""SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // row-level snapshot diff (§2.8 at table scale): snapshot B bumps
    // every 100th order's price, drops every 97th row, adds shifted
    // copies of every 90th — one full-outer key join classifying every
    // row, "changed" decided on 16-byte digests
    ("p13_snapshot_diff",
      ((s: SparkSession, d: String) => {
        // price integerized to cents BEFORE the digest: double→string
        // rendering is shortest-roundtrip in both engines today, but
        // integer keys remove the formatting coupling outright
        val a = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_c"))
        val b = a.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
          .select(col("o_orderkey"), col("o_custkey"),
            when(pmod(col("o_orderkey"), lit(100)) === 0,
              col("price_c") + 100L).otherwise(col("price_c"))
              .as("price_c"))
          .unionByName(a.filter(pmod(col("o_orderkey"), lit(90)) === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("o_custkey"), col("price_c")))
        Ops.snapshotDiff(a, b, Seq("o_orderkey"),
            Seq("o_custkey", "price_c"))
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      }): Q,
      Some("""WITH a0 AS (SELECT o_orderkey, o_custkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM orders),
        |a AS (SELECT o_orderkey, md5(CAST(o_custkey AS VARCHAR)
        |  || chr(1) || CAST(price_c AS VARCHAR)) AS h FROM a0),
        |b0 AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 100 = 0 THEN price_c + 100
        |    ELSE price_c END AS price_c
        |  FROM a0 WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, price_c
        |  FROM a0 WHERE o_orderkey % 90 = 0),
        |b AS (SELECT o_orderkey, md5(CAST(o_custkey AS VARCHAR)
        |  || chr(1) || CAST(price_c AS VARCHAR)) AS h FROM b0),
        |s AS (SELECT CASE WHEN a.h IS NULL THEN 'added'
        |    WHEN b.h IS NULL THEN 'removed'
        |    WHEN a.h <> b.h THEN 'changed'
        |    ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b USING (o_orderkey))
        |SELECT status, count(*) AS n FROM s
        |GROUP BY status ORDER BY status""".stripMargin)),

    // referential-integrity / data-quality audit (the dbt-style table
    // contract): orphan facts, duplicate natural keys, null rates —
    // one aggregate per check over planted defects (shifted orphan
    // copies; the synthetic lineitem's real duplicate keys)
    ("s9_integrity_audit",
      ((s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val orders = Tables.orders(s, d)
        val dirty = li.select(col("l_orderkey"), col("l_linenumber"))
          .unionByName(
            li.filter(pmod(col("l_orderkey"), lit(500)) === 0)
              .select((col("l_orderkey") + 50000000L).as("l_orderkey"),
                col("l_linenumber")))
        val orphans = dirty.join(
          orders.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("orphan_lines").as("check"),
            col("n"))
        val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n"))
          .select(lit("dup_line_keys").as("check"), col("n"))
        val nulls = li.agg(
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("n"))
          .select(lit("null_shipdates").as("check"), col("n"))
        orphans.unionByName(dupKeys).unionByName(nulls)
          .orderBy(col("check"))
      }): Q,
      Some("""WITH dirty AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 50000000, l_linenumber FROM lineitem
        |  WHERE l_orderkey % 500 = 0),
        |orphans AS (SELECT 'orphan_lines' AS chk, count(*) AS n
        |  FROM dirty d LEFT JOIN orders o ON d.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderkey IS NULL),
        |dup AS (SELECT 'dup_line_keys' AS chk,
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber) WHERE c > 1),
        |nl AS (SELECT 'null_shipdates' AS chk,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n FROM lineitem)
        |SELECT chk AS "check", n FROM
        |  (SELECT * FROM orphans UNION ALL SELECT * FROM dup
        |   UNION ALL SELECT * FROM nl)
        |ORDER BY "check"""".stripMargin)),

    // rolling-frame window (W5): trailing 5-row sum/mean per user in
    // event-time order — the rowsBetween frame family the resample/
    // cumsum rows don't exercise; mean derived from the two exact
    // integer sums (single deterministic divide)
    ("w5_rolling_frame",
      ((s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(-4, org.apache.spark.sql.expressions.Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            floor(col("value") * 100 + 0.5).cast("long").as("vc"))
          .withColumn("roll_n", count(lit(1)).over(w))
          .withColumn("roll_sum_c", sum(col("vc")).over(w))
          .withColumn("roll_mean_c", call_function("div",
            sum(col("vc")).over(w), count(lit(1)).over(w)))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      }): Q,
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events)
        |SELECT user_id, ts_us, event_id, vc,
        |  count(*) OVER w AS roll_n,
        |  CAST(sum(vc) OVER w AS BIGINT) AS roll_sum_c,
        |  CAST(sum(vc) OVER w // count(*) OVER w AS BIGINT) AS roll_mean_c
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin)),

    // exact group moments (A16): per-group n, Σx, Σx² as integers —
    // the numerically-stable sufficient statistics mean/variance
    // derive from, exact under any partial-aggregation order
    ("a16_group_moments",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("vc"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_c"),
            sum(col("vc") * col("vc")).as("sum_sq_c"),
            call_function("div", sum(col("vc")), count(lit(1)))
              .as("mean_c"))
          .orderBy(col("event_type"))): Q,
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(vc) AS BIGINT) AS sum_c,
        |  CAST(sum(vc * vc) AS BIGINT) AS sum_sq_c,
        |  CAST(sum(vc) // count(*) AS BIGINT) AS mean_c
        |FROM (SELECT event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // fuzzy record linkage (entity resolution): every 10th customer
    // gains a dirty copy (last name char corrupted); blocking on the
    // 8-digit name core bounds candidates like an LSH band, and
    // levenshtein (exact DP integers in both engines) + field
    // agreement recovers the planted duplicates — a fully
    // oracle-graded fuzzy join
    ("j8_record_linkage",
      ((s: SparkSession, d: String) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_mktsegment"))
        val dirty = cust.unionByName(
          cust.filter(pmod(col("c_custkey"), lit(10)) === 0)
            .select((col("c_custkey") + 100000L).as("c_custkey"),
              concat(substring(col("c_name"), 1,
                17), lit("X")).as("c_name"),
              col("c_nationkey"), col("c_mktsegment")))
        val pairs = Ops.fuzzyLinkPairs(dirty, "c_custkey",
          block = substring(col("c_name"), 10, 8),
          name = col("c_name"), maxEdit = 1)
        val attrs = dirty.select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"))
        pairs
          .join(attrs.toDF("a", "na_nation", "na_seg"), Seq("a"))
          .join(attrs.toDF("b", "nb_nation", "nb_seg"), Seq("b"))
          .filter(col("na_nation") === col("nb_nation") &&
            col("na_seg") === col("nb_seg"))
          .select(col("a"), col("b"), col("lev"))
          .orderBy(col("a"), col("b"))
      }): Q,
      Some("""WITH dirty AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000, substr(c_name, 1, 17) || 'X',
        |    c_nationkey, c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT a.c_custkey AS a, b.c_custkey AS b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
        |FROM dirty a JOIN dirty b
        |  ON substr(a.c_name, 10, 8) = substr(b.c_name, 10, 8)
        |  AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |  AND a.c_nationkey = b.c_nationkey
        |  AND a.c_mktsegment = b.c_mktsegment
        |ORDER BY a, b""".stripMargin)),

    // CMS inner-product join-size estimation: the planner bound for a
    // suspected-quadratic equi-join (here the l_partkey self-join),
    // graded WITH the exact size so the overestimate guarantee
    // (est >= exact, equality iff collision-free) is oracle-checked
    ("a15_join_size_sketch",
      ((s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        val exact = li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * col("c")).as("exact"))
        Ops.joinSizeSketch(li, col("l_partkey"), li, col("l_partkey"),
            width = 256)
          .crossJoin(broadcast(exact))
      }): Q,
      Some("""WITH lanes AS (SELECT unnest(generate_series(0, 3)) AS lane),
        |ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
        |ha AS (SELECT l.lane,
        |  ('0x' || substr(md5(k), 8 * l.lane + 1, 8))::BIGINT % 256
        |    AS bucket
        |  FROM ka CROSS JOIN lanes l),
        |ra AS (SELECT lane, bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ha GROUP BY 1, 2),
        |ip AS (SELECT a.lane, CAST(SUM(a.cnt * b2.cnt) AS BIGINT) AS ip
        |  FROM ra a JOIN ra b2 USING (lane, bucket) GROUP BY 1),
        |ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact
        |  FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
        |SELECT (SELECT min(ip) FROM ip) AS est,
        |  (SELECT CAST(sum(cnt) // 4 AS BIGINT) FROM ra) AS n_a,
        |  (SELECT CAST(sum(cnt) // 4 AS BIGINT) FROM ra) AS n_b,
        |  ex.exact AS exact
        |FROM ex""".stripMargin)),

    // JSONL source (S-family): documents round-trip through sharded
    // JSON-lines plus a planted corrupt shard; the audited PERMISSIVE
    // read surfaces each bad line as a counted all-null row — DuckDB's
    // read_json(ignore_errors) yields the identical null row, so the
    // whole source (parse, corruption accounting, aggregates) is
    // oracle-graded
    ("s8_jsonl_source",
      ((s: SparkSession, d: String) => {
        // path scoped by SF: a concurrent bench at another SF writes
        // its own subtree (Verify resolves __GRAFT_SF__ identically)
        val base = s"/tmp/graft-jsonl-src/${new java.io.File(d).getName}"
        val docs = Tables.documents(s, d)
        graft.sources.Jsonl.write(docs, base, shards = 4)
        // a shard with two malformed lines and one valid object
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        val out = fs.create(
          new org.apache.hadoop.fs.Path(s"$base/part-corrupt.json"), true)
        out.write(("{ broken line\n" +
          "also not json at all\n" +
          """{"doc_id": 999999, "text": "tail doc", "lang": "en",""" +
          """ "source": "srcX", "n_chars": 8}""" + "\n").getBytes("UTF-8"))
        out.close()
        graft.sources.Jsonl.readAudited(s, base, docs.schema, "doc_id")
          .groupBy(when(col("__corrupt"), lit("__corrupt"))
            .otherwise(col("source")).as("src"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
            coalesce(min(col("doc_id")), lit(-1L)).as("min_id"),
            coalesce(max(col("doc_id")), lit(-1L)).as("max_id"))
          .orderBy(col("src"))
      }): Q,
      Some("""SELECT CASE WHEN doc_id IS NULL THEN '__corrupt'
        |    ELSE source END AS src,
        |  count(*) AS n,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars,
        |  coalesce(min(doc_id), -1) AS min_id,
        |  coalesce(max(doc_id), -1) AS max_id
        |FROM read_json('/tmp/graft-jsonl-src/__GRAFT_SF__/*.json',
        |  format='newline_delimited', ignore_errors=true,
        |  columns={'doc_id': 'BIGINT', 'text': 'VARCHAR',
        |    'lang': 'VARCHAR', 'source': 'VARCHAR', 'n_chars': 'BIGINT'})
        |GROUP BY 1 ORDER BY src""".stripMargin)),

    // Unicode NFC normalization (native codegen'd expression wrapping
    // java.text.Normalizer; DuckDB nfc_normalize implements the same
    // TR15 canonical composition): decomposed sequences planted on
    // every 7th doc compose to fewer codepoints and a different md5 —
    // the pre-hash normalization every dedup pipeline needs
    ("f13_nfc_normalize",
      ((s: SparkSession, d: String) => {
        graft.functions.NfcNormalizeExpr.register(s)
        Tables.documents(s, d)
          .withColumn("raw", when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" cafe\u0301 u\u0308ber")))
            .otherwise(col("text")))
          .select(col("doc_id"),
            length(col("raw")).cast("long").as("len_raw"),
            length(graft.functions.NfcNormalizeExpr.of(col("raw")))
              .cast("long").as("len_nfc"),
            md5(graft.functions.NfcNormalizeExpr.of(col("raw"))
              .cast("binary")).as("nfc_md5"))
          .orderBy(col("doc_id"))
      }): Q,
      Some("""WITH r AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |    THEN text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber'
        |    ELSE text END AS raw FROM documents)
        |SELECT doc_id, length(raw) AS len_raw,
        |  length(nfc_normalize(raw)) AS len_nfc,
        |  md5(nfc_normalize(raw)) AS nfc_md5
        |FROM r ORDER BY doc_id""".stripMargin)),

    // semi-structured extraction: JSON path into a string column (the
    // universal event-payload shape), then a keyed aggregate over the
    // extracted value — get_json_object is codegen'd, so extraction
    // runs at scan speed and only the 5-row aggregate shuffles
    ("f12_json_extract",
      ((s: SparkSession, d: String) =>
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))): Q,
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
