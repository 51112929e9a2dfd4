package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** The SQL maintenance + history TVF surface: a pure-SQL operator can
  * list the commit history, pin a snapshot, compact and vacuum a lake
  * table — with side effects at EXECUTION time only (EXPLAIN is
  * free). */
class LakeMaintenanceSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("lake-maint").toString
    spark.conf.set("spark.sql.catalog.graft_maint",
      classOf[LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_maint.root", r)
    LakeMaintenance.register(spark)
    r
  }
  private lazy val lake = new graft.v3.Lake(spark, root)

  private def seed(): Unit = {
    if (!lake.hasManifest("mt")) {
      spark.sql(
        "CREATE TABLE graft_maint.mt (chain_name STRING, k BIGINT, v STRING)")
      (1 to 3).foreach(i => spark.sql(
        s"INSERT INTO graft_maint.mt VALUES ('ethereum', $i, 'v$i')"))
    }
  }

  test("table_history lists (version, commit_ts, operation, is_delta) for the retained log") {
    seed()
    val hist = spark.sql("SELECT * FROM table_history('graft_maint.mt')")
      .collect().map(r => (r.getLong(0), r.get(1), r.getString(2),
        r.getBoolean(3))).toSeq
    assert(hist.size >= 4, s"expected create + 3 appends, got $hist")
    assert(hist.map(_._1) == hist.map(_._1).sorted, "versions not ascending")
    // every commit this lifecycle wrote carries a wall-clock + op header
    assert(hist.forall(_._2 != null), s"missing commit_ts in $hist")
    assert(hist.count(_._3 == "append") >= 3, s"ops diverged: $hist")
    // matches the Scala API row for row
    val api = lake.commitHistory("mt")
    assert(hist.map(h => (h._1, h._3, h._4)) ==
      api.map(a => (a._1, a._3, a._4)), "TVF diverged from commitHistory")
  }

  test("graft_snapshot pins a version VERSION AS OF can replay after later writes") {
    seed()
    val v = spark.sql("SELECT * FROM graft_snapshot('graft_maint.mt')")
      .collect()(0).getLong(0)
    spark.sql("INSERT INTO graft_maint.mt VALUES ('ethereum', 99, 'late')")
    assert(spark.sql(
      s"SELECT count(*) FROM graft_maint.mt VERSION AS OF $v")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM graft_maint.mt")
      .collect()(0).getLong(0) == 4L)
  }

  test("graft_compact bin-packs the small appends; rows preserved; graft_vacuum GCs") {
    seed()
    spark.sql("SELECT * FROM graft_snapshot('graft_maint.mt')").collect()
    val before = lake.fileInventory("mt").size
    assert(before >= 4, s"expected fragmented table, got $before files")
    val rewritten = spark.sql(
      "SELECT * FROM graft_compact('graft_maint.mt', 134217728)")
      .collect()(0).getLong(0)
    assert(rewritten >= 1L, "compaction rewrote nothing")
    assert(lake.fileInventory("mt").size < before, "no files merged")
    val rows = spark.sql(
      "SELECT k, v FROM graft_maint.mt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.map(_._1).size >= 4 && rows.map(_._1).distinct == rows.map(_._1),
      s"compaction changed rows: $rows")
    // EXPLAIN must NOT vacuum (side effects at execution only)
    val snapsBefore = lake.snapshotVersions("mt").size
    spark.sql("EXPLAIN SELECT * FROM graft_vacuum('graft_maint.mt', 0)")
      .collect()
    assert(lake.snapshotVersions("mt").size == snapsBefore,
      "EXPLAIN executed the vacuum")
    val st = spark.sql("SELECT * FROM graft_vacuum('graft_maint.mt', 0)")
      .collect()(0)
    assert(st.getLong(0) >= 1L, "vacuum expired no snapshots")
    // r16 lifecycle: the appends that ADDED the compaction-swapped
    // originals are still inside the retained CDC window (a from-0
    // consumer replays them from the retention area), so an
    // in-window vacuum keeps the retired files
    assert(st.getLong(1) == 0L,
      s"in-window vacuum must keep commit-log-pinned files: $st")
    // roll the window: shrunk floor + metadata-only refresh
    // checkpoints force a retention cut - NOW the GC frees them
    lake.setTableProperties("mt",
      Map("manifest.minRetainedCommits" -> "1"))
    (0 until 3).foreach(_ => lake.refreshManifest("mt"))
    val st2 = spark.sql("SELECT * FROM graft_vacuum('graft_maint.mt', 0)")
      .collect()(0)
    assert(st2.getLong(1) >= 1L, s"window rolled: vacuum GC'd nothing: $st2")
    assert(st2.getLong(2) > 0L, "vacuum freed no bytes")
    // the table still reads fine after the GC
    assert(spark.sql("SELECT count(*) FROM graft_maint.mt")
      .collect()(0).getLong(0) >= 4L)
  }

  test("graft_cluster_compact key-clusters a chain through SQL; rows preserved") {
    seed()
    spark.sql(
      "CREATE TABLE graft_maint.cl_t (chain_name STRING, k BIGINT, v STRING)")
    // two appends with INTERLEAVED key ranges: every file spans the
    // keyspace, the cluster rewrite restores disjoint ranges
    (0 to 1).foreach(j => spark.sql(
      s"""INSERT INTO graft_maint.cl_t
         | SELECT 'ethereum', id * 2 + $j, concat('v', id * 2 + $j)
         | FROM range(50)""".stripMargin))
    val before = spark.sql("SELECT k, v FROM graft_maint.cl_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val rewritten = spark.sql(
      s"SELECT * FROM graft_cluster_compact('graft_maint.cl_t', ${1L << 30}, 'k')")
      .collect()(0).getLong(0)
    assert(rewritten == 1L, s"expected the one chain rewritten, got $rewritten")
    val after = spark.sql("SELECT k, v FROM graft_maint.cl_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before, "cluster compaction changed rows")
    // an empty column list without a write.layout property refuses
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft_cluster_compact('graft_maint.cl_t', ${1L << 30}, '')")
        .collect()
    }
    assert(e.getMessage.contains("cluster columns"), e.getMessage)
  }

  test("the full z-order flow runs in pure SQL: SET TBLPROPERTIES + cluster compact") {
    seed()
    spark.sql(
      """CREATE TABLE graft_maint.zq_t (
        | chain_name STRING, x BIGINT, y BIGINT, v STRING)""".stripMargin)
    (0 to 1).foreach(j => spark.sql(
      s"""INSERT INTO graft_maint.zq_t
         | SELECT 'ethereum', id % 50, (id * 7) % 50, concat('v', id + $j * 1000)
         | FROM range(${j * 100}, ${j * 100 + 100})""".stripMargin))
    val total = spark.sql("SELECT count(*) FROM graft_maint.zq_t")
      .collect()(0).getLong(0)
    spark.sql(
      """ALTER TABLE graft_maint.zq_t
        | SET TBLPROPERTIES ('write.layout' = 'zorder(x,y)')""".stripMargin)
    // empty column list -> the property just set drives the rewrite
    val rewritten = spark.sql(
      s"SELECT * FROM graft_cluster_compact('graft_maint.zq_t', ${1L << 30}, '')")
      .collect()(0).getLong(0)
    assert(rewritten == 1L, s"z-order rewrite rewrote $rewritten chains")
    assert(spark.sql("SELECT count(*) FROM graft_maint.zq_t")
      .collect()(0).getLong(0) == total, "z-order rewrite changed rows")
  }

  test("table_changes TVF equals the Scala commit-grain CDC feed") {
    seed()
    import spark.implicits._
    val cdcLake = new graft.v3.Lake(spark, root)
    cdcLake.dropTable("cdc_t")
    spark.sql(
      "CREATE TABLE graft_maint.cdc_t (chain_name STRING, k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO graft_maint.cdc_t VALUES ('ethereum', 1, 'a'), ('ethereum', 2, 'b')")
    // feed start: the then-current version, as a real consumer would
    // pin it (the first append to an empty table is a CHECKPOINT whose
    // diff base the retention rule may expire)
    val v0 = cdcLake.latestCommitVersion("cdc_t").get
    cdcLake.upsert(Seq(("ethereum", 2L, "u")).toDF("chain_name", "k", "v"),
      "cdc_t", Seq("chain_name", "k"), retain = true)
    val v2 = cdcLake.latestCommitVersion("cdc_t").get
    val viaTvf = spark.sql(
      s"SELECT * FROM table_changes('graft_maint.cdc_t', $v0, $v2)")
    val viaApi = cdcLake.changesBetweenCommits("cdc_t", v0, v2)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("_change_type", "_commit_version", "chain_name", "k", "v")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val got = canon(viaTvf)
    assert(got.nonEmpty && got == canon(viaApi),
      s"TVF diverged from changesBetweenCommits: $got")
    // the feed carries the upsert as delete+insert of the touched file
    assert(got.exists(_.head == "delete") && got.exists(_.head == "insert"))
  }

  test("graft_detail reports (version, files, bytes, partitions, snapshots) from the manifest") {
    seed()
    spark.sql(
      "CREATE TABLE graft_maint.dt_t (chain_name STRING, k BIGINT)")
    spark.sql(
      """INSERT INTO graft_maint.dt_t VALUES
        | ('ethereum', 1), ('base', 2)""".stripMargin)
    spark.sql("SELECT * FROM graft_snapshot('graft_maint.dt_t')").collect()
    val dtLake = new graft.v3.Lake(spark, root)
    val d = spark.sql("SELECT * FROM graft_detail('graft_maint.dt_t')")
      .collect()(0)
    val inv = dtLake.fileInventory("dt_t")
    assert(d.getLong(0) == dtLake.latestCommitVersion("dt_t").get)
    assert(d.getLong(1) == inv.size.toLong, "num_files diverged")
    assert(d.getLong(2) == inv.map(_._3).sum, "size_bytes diverged")
    assert(d.getLong(3) == 2L, s"expected 2 partitions, got ${d.getLong(3)}")
    assert(d.getLong(4) == 1L, s"expected 1 snapshot, got ${d.getLong(4)}")
  }

  test("bad references refuse loudly with the usage shape") {
    seed()
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM table_history('no_dot_reference')").collect()
    }
    assert(e1.getMessage.contains("catalog.table"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_vacuum('nosuch_cat.t', 1)").collect()
    }
    assert(e2.getMessage.contains("not a configured lake catalog"),
      e2.getMessage)
    // a MISSING table refuses loudly - a fabricated all-zeros detail
    // row for a typo is indistinguishable from a real empty table
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_detail('graft_maint.no_such_t')")
        .collect()
    }
    assert(e3.getMessage.contains("no such lake table"), e3.getMessage)
  }

  test("graft_restore rolls the table back to a pinned snapshot through SQL") {
    seed()
    val pin = spark.sql("SELECT * FROM graft_snapshot('graft_maint.mt')")
      .collect()(0).getLong(0)
    val before = spark.sql(
      "SELECT k, v FROM graft_maint.mt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    spark.sql("INSERT INTO graft_maint.mt VALUES ('ethereum', 777, 'x')")
    val st = spark.sql(
      s"SELECT * FROM graft_restore('graft_maint.mt', $pin)").collect()(0)
    assert(st.getLong(1) >= 1L, s"restore retired nothing: $st")
    val after = spark.sql(
      "SELECT k, v FROM graft_maint.mt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before, s"SQL restore diverged: $after vs $before")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_restore('graft_maint.mt', 9999)")
        .collect()
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }

  test("graft_analyze backfills data-skipping stats for pre-feature files") {
    seed()
    // wipe the sidecar to simulate a pre-feature table, then the TVF
    // must footer-read every live file missing stats (and only those)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_filestats/mt"), true)
    val live = lake.fileInventory("mt").size
    // a COLD catalog identity over the same root: the warm catalog's
    // in-memory cache still covers the files (correctly - analyze
    // through it finds nothing missing), but a fresh driver must
    // footer-read every live file and re-persist
    spark.conf.set("spark.sql.catalog.graft_maint_cold.root", root)
    val analyzed = spark.sql(
      "SELECT * FROM graft_analyze('graft_maint_cold.mt')")
      .collect()(0).getLong(0)
    assert(analyzed == live.toLong,
      s"expected $live files analyzed, got $analyzed")
    // idempotent through the warm path: nothing missing
    assert(spark.sql("SELECT * FROM graft_analyze('graft_maint.mt')")
      .collect()(0).getLong(0) == 0L)
  }

  test("graft_vacuum keepLast above Int.MaxValue clamps (keep-everything), never wraps to near-zero") {
    seed()
    spark.sql("SELECT * FROM graft_snapshot('graft_maint.mt')").collect()
    val snapsBefore = lake.snapshotVersions("mt").size
    assert(snapsBefore >= 1)
    // 4294967297 = 2^32 + 1 wraps to 1 under a bare .toInt - the
    // operator's "keep everything" intent must keep every snapshot
    val st = spark.sql(
      "SELECT * FROM graft_vacuum('graft_maint.mt', 4294967297)")
      .collect()(0)
    assert(lake.snapshotVersions("mt").size == snapsBefore,
      "oversized keepLast expired snapshots (Int wrap)")
    assert(st.getLong(0) == 0L, s"manifests_deleted = ${st.getLong(0)}")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_vacuum('graft_maint.mt', -1)")
        .collect()
    }
    assert(e.getMessage.contains("keepLast"), e.getMessage)
  }
}
