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

  test("SHOW TABLES serves from the manifest dir; DDL without a lake shape refuses loudly") {
    seed()
    val tables = spark.sql("SHOW TABLES IN graft_lake")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains(Schemas.Nfp), tables.toString)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // rename has no lake shape
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_lake.${Schemas.Nfp} RENAME TO nfp2")
    }
    assert(chain(e).exists(_.contains("renamed")), chain(e).mkString("; "))
  }

  test("CREATE TABLE maps onto Lake.createTable: round-trip, manifest-served, refusals") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.ddl_t1 (
        | chain_name STRING, k BIGINT, v STRING
        |) USING parquet PARTITIONED BY (chain_name)""".stripMargin)
    // created: schema committed + EMPTY manifest v1 published — the
    // table lists, reads empty, all manifest-served
    assert(lake.hasManifest("ddl_t1"), "create published no manifest")
    assert(spark.sql("SHOW TABLES IN graft_lake").collect()
      .map(_.getString(1)).contains("ddl_t1"))
    assert(spark.sql("SELECT * FROM graft_lake.ddl_t1").count() == 0L)
    spark.sql(
      """INSERT INTO graft_lake.ddl_t1 VALUES
        | ('ethereum', 1, 'a'), ('base', 2, 'b')""".stripMargin)
    val got = spark.sql(
      "SELECT k, v FROM graft_lake.ddl_t1 WHERE chain_name = 'ethereum'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a")), got.toString)
    assert(catalogLake.listCalls.get() == 0L,
      s"DDL lifecycle listed ${catalogLake.listCalls.get()} time(s)")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // re-create refuses with Spark's standard already-exists error
    val dup = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.ddl_t1 (chain_name STRING, x INT)")
    }
    assert(chain(dup).exists(_.toLowerCase.contains("already exists")),
      chain(dup).mkString("; "))
    // no chain_name column → the lake's contract refusal
    val noChain = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.ddl_bad1 (x INT, y STRING)")
    }
    assert(chain(noChain).exists(_.contains("chain_name")),
      chain(noChain).mkString("; "))
    // foreign partitioning has no lake shape
    val badPart = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft_lake.ddl_bad2 (chain_name STRING, d STRING)
          | PARTITIONED BY (d)""".stripMargin)
    }
    assert(chain(badPart).exists(_.contains("no lake shape")),
      chain(badPart).mkString("; "))
    // non-parquet provider has no lake shape
    val badFmt = intercept[Exception] {
      spark.sql(
        "CREATE TABLE graft_lake.ddl_bad3 (chain_name STRING) USING csv")
    }
    assert(chain(badFmt).exists(_.contains("no lake shape")),
      chain(badFmt).mkString("; "))
    // refusals left nothing behind
    Seq("ddl_bad1", "ddl_bad2", "ddl_bad3").foreach { t =>
      assert(!lake.hasSchema(t) && !lake.hasManifest(t), s"$t leaked state")
    }
  }

  test("CTAS creates then appends through the manifest transaction") {
    seed()
    spark.sql(
      s"""CREATE TABLE graft_lake.ctas_t AS
         | SELECT chain_name, transaction_hash, amount
         | FROM graft_lake.${Schemas.Nfp} WHERE chain_name = 'base'
         |""".stripMargin)
    // non-null-inferred literals/columns were coerced nullable; data
    // landed partitioned and manifest-committed
    assert(lake.hasManifest("ctas_t"))
    assert(lake.effectiveSchema("ctas_t").fields.forall(_.nullable))
    val n = spark.sql("SELECT count(*) FROM graft_lake.ctas_t")
      .collect()(0).getLong(0)
    assert(n >= 10L, s"CTAS landed $n rows")
    assert(lake.fileInventory("ctas_t") == lake.listInventory("ctas_t"),
      "CTAS manifest does not match disk")
  }

  test("TIMESTAMP AS OF resolves the commit log's #ts headers; pre-history refuses") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.tt_t (chain_name STRING, k BIGINT)
        |""".stripMargin)
    val preHistory = System.currentTimeMillis() - 3600000L
    spark.sql("INSERT INTO graft_lake.tt_t VALUES ('ethereum', 1)")
    // strictly separate the two commits' wall-clocks around t1
    val t1 = System.currentTimeMillis()
    while (System.currentTimeMillis() <= t1) Thread.sleep(1)
    spark.sql("INSERT INTO graft_lake.tt_t VALUES ('ethereum', 2)")
    def at(ms: Long) = spark.sql(
      s"""SELECT k FROM graft_lake.tt_t
         | TIMESTAMP AS OF '${java.time.Instant.ofEpochMilli(ms)}'
         | ORDER BY k""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(at(t1) == Seq(1L), s"t1 state diverged: ${at(t1)}")
    assert(at(System.currentTimeMillis()) == Seq(1L, 2L))
    // the Scala twin resolves identically
    assert(lake.readAtTimestamp("tt_t", t1).count() == 1L)
    // an instant before the first commit refuses loudly
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] { at(preHistory) }
    assert(chain(e).exists(_.contains("predates")), chain(e).mkString("; "))
  }

  test("DELETE FROM: CoW predicate delete, metadata-only chain delete, truncate - all retained") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.del_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    import spark.implicits._
    (0L until 40L).map(i =>
        (if (i % 2 == 0) "ethereum" else "base", i, s"v$i"))
      .toDF("chain_name", "k", "v")
      .createOrReplaceTempView("del_src")
    spark.sql("INSERT INTO graft_lake.del_t SELECT * FROM del_src")
    val v0 = lake.snapshot("del_t")
    // predicate delete: copy-on-write rewrite of the touched files
    spark.sql("DELETE FROM graft_lake.del_t WHERE k >= 30 AND v != 'v31'")
    val after = spark.sql("SELECT k FROM graft_lake.del_t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(after == (0L until 30L) :+ 31L, s"CoW delete diverged: $after")
    // retained: the pinned pre-delete snapshot still reads complete
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.del_t VERSION AS OF $v0")
      .collect()(0).getLong(0) == 40L)
    // chain_name equality downgrades to the metadata-only dropChain
    // (zero Spark jobs: no staging scan ran - listCalls still zero
    // and the retired area now holds the chain's files)
    spark.sql("DELETE FROM graft_lake.del_t WHERE chain_name = 'base'")
    assert(spark.sql(
      "SELECT count(*) FROM graft_lake.del_t WHERE chain_name = 'base'")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.del_t VERSION AS OF $v0")
      .collect()(0).getLong(0) == 40L,
      "chain delete broke the pinned snapshot (not retained)")
    // delete-all = metadata-only truncate
    spark.sql("DELETE FROM graft_lake.del_t")
    assert(spark.sql("SELECT count(*) FROM graft_lake.del_t")
      .collect()(0).getLong(0) == 0L)
    // TRUNCATE TABLE routes through the same TruncatableTable surface
    spark.sql("INSERT INTO graft_lake.del_t VALUES ('ethereum', 99, 'z')")
    spark.sql("TRUNCATE TABLE graft_lake.del_t")
    assert(spark.sql("SELECT count(*) FROM graft_lake.del_t")
      .collect()(0).getLong(0) == 0L, "TRUNCATE TABLE left rows")
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.del_t VERSION AS OF $v0")
      .collect()(0).getLong(0) == 40L,
      "truncate broke the pinned snapshot (not retained)")
    assert(catalogLake.listCalls.get() == 0L,
      s"DELETE lifecycle listed ${catalogLake.listCalls.get()} time(s)")
  }

  test("UPDATE: group-based CoW rewrite, pruned to matched partitions, retained") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.upd_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    import spark.implicits._
    (0L until 40L).map(i =>
        (if (i % 2 == 0) "ethereum" else "base", i, s"v$i"))
      .toDF("chain_name", "k", "v").createOrReplaceTempView("upd_src")
    spark.sql("INSERT INTO graft_lake.upd_t SELECT * FROM upd_src")
    val updLake = new graft.v3.Lake(spark, root)
    val v0 = updLake.snapshot("upd_t")
    val baseBefore = updLake.fileInventory("upd_t").filter(_._1 == "base")
    // matched rows live only in 'ethereum' (k even): runtime group
    // filtering must confine the rewrite to that partition
    spark.sql("UPDATE graft_lake.upd_t SET v = concat(v, '!') WHERE k % 4 = 0")
    val got = spark.sql(
      "SELECT k, v FROM graft_lake.upd_t WHERE k < 6 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((0L, "v0!"), (1L, "v1"), (2L, "v2"),
      (3L, "v3"), (4L, "v4!"), (5L, "v5")), got.toString)
    // the unmatched partition's files are byte-identical (not rewritten)
    assert(updLake.fileInventory("upd_t").filter(_._1 == "base")
      == baseBefore, "UPDATE rewrote a partition with no matched rows")
    // retained: the pinned pre-update snapshot still reads the old values
    assert(spark.sql(
      s"""SELECT v FROM graft_lake.upd_t VERSION AS OF $v0
         | WHERE k = 0""".stripMargin).collect()(0).getString(0) == "v0")
    // manifest matches disk exactly after the rewrite
    assert(updLake.fileInventory("upd_t") == updLake.listInventory("upd_t"))
    assert(catalogLake.listCalls.get() == 0L,
      s"UPDATE planned with ${catalogLake.listCalls.get()} listing(s)")
  }

  test("MERGE INTO: matched update + not-matched insert (new partition) + matched delete") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.mrg_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    spark.sql(
      """INSERT INTO graft_lake.mrg_t VALUES
        | ('ethereum', 1, 'a'), ('ethereum', 2, 'b'), ('base', 3, 'c')
        |""".stripMargin)
    spark.sql(
      """MERGE INTO graft_lake.mrg_t t USING (
        |  SELECT 'ethereum' AS chain_name, 1L AS k, 'merged' AS v
        |  UNION ALL SELECT 'arbitrum', 9L, 'new'
        |  UNION ALL SELECT 'ethereum', 2L, 'dropme'
        |) s ON t.k = s.k
        |WHEN MATCHED AND s.v = 'dropme' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(
      "SELECT chain_name, k, v FROM graft_lake.mrg_t ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == Seq(("ethereum", 1L, "merged"), ("base", 3L, "c"),
      ("arbitrum", 9L, "new")), got.toString)
    val mrgLake = new graft.v3.Lake(spark, root)
    assert(mrgLake.fileInventory("mrg_t") == mrgLake.listInventory("mrg_t"))
    assert(catalogLake.listCalls.get() == 0L,
      s"MERGE planned with ${catalogLake.listCalls.get()} listing(s)")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: target-only rows update/delete across ALL partitions (no wrong pruning)") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.mrgbs_t
        | (chain_name STRING, k BIGINT, v STRING)""".stripMargin)
    spark.sql(
      """INSERT INTO graft_lake.mrgbs_t VALUES
        | ('ethereum', 1, 'a'), ('ethereum', 2, 'b'),
        | ('base', 3, 'c'), ('arbitrum', 4, 'd')""".stripMargin)
    // source touches ONLY ethereum — but BY SOURCE clauses act on
    // target-only rows in EVERY partition, so runtime group filtering
    // must NOT narrow this statement to the matched partitions: a
    // wrongly-pruned scan would leave base/arbitrum rows untouched
    // (no '!' suffix, no delete) because ReplaceData only writes back
    // what the scan read
    spark.sql(
      """MERGE INTO graft_lake.mrgbs_t t USING (
        |  SELECT 'ethereum' AS chain_name, 1L AS k, 'merged' AS v
        |  UNION ALL SELECT 'ethereum', 9L, 'new'
        |) s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '!')
        |""".stripMargin)
    val got = spark.sql(
      "SELECT chain_name, k, v FROM graft_lake.mrgbs_t ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == Seq(
      ("ethereum", 1L, "merged"), // matched update
      ("ethereum", 2L, "b!"),     // target-only in a MATCHED partition
      ("arbitrum", 4L, "d!"),     // target-only in an UNMATCHED partition
      ("ethereum", 9L, "new")),   // not-matched insert
      s"BY SOURCE merge diverged (wrong group pruning?): $got")
    // k=3 (base) deleted by the BY SOURCE DELETE
    assert(spark.sql("SELECT count(*) FROM graft_lake.mrgbs_t WHERE k = 3")
      .collect()(0).getLong(0) == 0L)
    val bsLake = new graft.v3.Lake(spark, root)
    assert(bsLake.fileInventory("mrgbs_t") == bsLake.listInventory("mrgbs_t"))
    assert(catalogLake.listCalls.get() == 0L,
      s"BY SOURCE MERGE planned with ${catalogLake.listCalls.get()} " +
        "listing(s)")
  }

  test("a row-level rewrite losing the optimistic race aborts loudly with nothing published") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.race_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    spark.sql(
      "INSERT INTO graft_lake.race_t VALUES ('ethereum', 1, 'a'), ('ethereum', 2, 'b')")
    // rival commit fires in the window between the UPDATE's staged
    // write and its manifest transaction: it rewrites the very files
    // the UPDATE planned against, so the UPDATE must lose the
    // optimistic race and publish nothing
    val cat = catalogLake
    cat.preCommitHook = () => {
      cat.preCommitHook = () => ()
      val rival = new graft.v3.Lake(spark, root)
      import spark.implicits._
      rival.upsert(Seq(("ethereum", 2L, "rival")).toDF("chain_name", "k", "v"),
        "race_t", Seq("chain_name", "k"))
    }
    val e = intercept[Exception] {
      spark.sql("UPDATE graft_lake.race_t SET v = 'upd' WHERE k = 2")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("concurrent")), chain(e).mkString("; "))
    // the rival's commit is the table state; the UPDATE landed nothing
    val got = spark.sql("SELECT v FROM graft_lake.race_t WHERE k = 2")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("rival"), got.toString)
    val rLake = new graft.v3.Lake(spark, root)
    assert(rLake.fileInventory("race_t") == rLake.listInventory("race_t"))
  }

  test("full-table UPDATE serves its scan index from the SELECT path's cache (zero rebuilds)") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.fullupd_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    spark.sql(
      """INSERT INTO graft_lake.fullupd_t VALUES
        | ('ethereum', 1, 'a'), ('base', 2, 'b')""".stripMargin)
    // warm: this SELECT builds (or reuses) the current version's index
    assert(spark.sql("SELECT count(*) FROM graft_lake.fullupd_t")
      .collect()(0).getLong(0) == 2L)
    val builds0 = graft.plans.ManifestPartitioningIndex.builds.get()
    // no WHERE -> no runtime group filter -> the rewrite scan plans the
    // FULL entry set, which must come from the per-version cache, not
    // a fresh O(files) construction per statement
    spark.sql("UPDATE graft_lake.fullupd_t SET v = upper(v)")
    assert(graft.plans.ManifestPartitioningIndex.builds.get() == builds0,
      s"full-table UPDATE rebuilt the scan index " +
        s"(${graft.plans.ManifestPartitioningIndex.builds.get() - builds0} " +
        "full build(s); expected cache reuse)")
    val got = spark.sql(
      "SELECT v FROM graft_lake.fullupd_t ORDER BY k")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("A", "B"), got.toString)
  }

  test("a query one delta commit past the cached index PATCHES it forward; patched == rebuilt") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.patch_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    spark.sql(
      """INSERT INTO graft_lake.patch_t VALUES
        | ('ethereum', 1, 'a'), ('ethereum', 2, 'b'), ('base', 3, 'c')
        |""".stripMargin)
    // warm the index cache at the current version
    assert(spark.sql("SELECT count(*) FROM graft_lake.patch_t")
      .collect()(0).getLong(0) == 3L)
    val patchLake = new graft.v3.Lake(spark, root)
    import spark.implicits._
    // a delta with ADDS + REMOVES (upsert) plus a brand-new partition
    // (dir birth) - the two patch shapes beyond a plain append
    patchLake.upsert(Seq(("ethereum", 2L, "u"), ("arbitrum", 9L, "n"))
      .toDF("chain_name", "k", "v"), "patch_t", Seq("chain_name", "k"),
      retain = true)
    val builds0 = graft.plans.ManifestPartitioningIndex.builds.get()
    val got = spark.sql(
      "SELECT chain_name, k, v FROM graft_lake.patch_t ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == Seq(("ethereum", 1L, "a"), ("ethereum", 2L, "u"),
      ("base", 3L, "c"), ("arbitrum", 9L, "n")), got.toString)
    assert(graft.plans.ManifestPartitioningIndex.builds.get() == builds0,
      "the post-commit query fully rebuilt the index instead of " +
        "patching the cached one forward")
    // structural pin: the PATCHED index the cache now holds is
    // file-for-file identical to a from-scratch build of the same
    // version (dirs, paths, sizes, partition values)
    val (inc, v, entries) = patchLake.currentEntriesKeyed("patch_t").get
    val schema = patchLake.effectiveSchema("patch_t")
    val cached = LakeTable.cachedIndex(patchLake.root, "patch_t", inc, v,
      schema, () => fail("index not cached after the query"))
    val fresh = new graft.plans.ManifestPartitioningIndex(spark,
      new org.apache.hadoop.fs.Path(s"$root/patch_t"), entries,
      org.apache.spark.sql.types.StructType(
        schema.fields.filter(_.name == "chain_name")))
    def shape(i: graft.plans.ManifestPartitioningIndex) =
      i.leafDirToChildrenFiles.map { case (d, arr) =>
        d.toString -> arr.map(s => (s.getPath.toString, s.getLen))
          .sortBy(_._1).toSeq
      }
    assert(shape(cached) == shape(fresh), "patched index diverged from rebuild")
    assert(cached.partitionSpec().partitions.map(p =>
        (p.path.toString, p.values.toSeq(Seq(org.apache.spark.sql.types
          .StringType)))).toSet ==
      fresh.partitionSpec().partitions.map(p =>
        (p.path.toString, p.values.toSeq(Seq(org.apache.spark.sql.types
          .StringType)))).toSet,
      "patched partition spec diverged from rebuild")
  }

  test("row-level scan reports manifest-summed statistics; small-source MERGE broadcasts") {
    seed()
    spark.sql(
      """CREATE TABLE graft_lake.stat_t (chain_name STRING, k BIGINT, v STRING)
        |""".stripMargin)
    spark.sql(
      """INSERT INTO graft_lake.stat_t VALUES
        | ('ethereum', 1, 'a'), ('ethereum', 2, 'b'), ('base', 3, 'c')
        |""".stripMargin)
    val statLake = new graft.v3.Lake(spark, root)
    val (inc, v, entries) = statLake.currentEntriesKeyed("stat_t").get
    val schema = statLake.effectiveSchema("stat_t")
    val op = new LakeRowLevelOperation(spark, statLake, "stat_t",
      new org.apache.hadoop.fs.Path(s"$root/stat_t"), entries, schema,
      Seq("chain_name"),
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE,
      Some((inc, v)))
    val scan = op.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val stats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val expect = (entries.map(_._2).sum *
      spark.sessionState.conf.fileCompressionFactor).toLong
    assert(stats.sizeInBytes.isPresent &&
      stats.sizeInBytes.getAsLong == expect,
      s"row-level scan stats ${stats.sizeInBytes} != manifest sum $expect")
    // e2e: the rewrite's source-vs-target join must broadcast the
    // small side instead of shuffling the lake table
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // range() keeps the source non-foldable, so the equi-join keys
      // survive to planning and the broadcast shows as a HASH join
      // (a literal one-row source folds into the condition -> BNLJ)
      spark.sql(
        """MERGE INTO graft_lake.stat_t t
          | USING (SELECT 'ethereum' AS chain_name, id + 1 AS k,
          |               concat('m', id) AS v FROM range(2)) s
          | ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val deadline = System.currentTimeMillis() + 20000
      var seen = false
      while (!seen && System.currentTimeMillis() < deadline) {
        import scala.jdk.CollectionConverters._
        seen = plans.asScala.exists(_.contains("BroadcastHashJoin"))
        if (!seen) Thread.sleep(100)
      }
      assert(seen, "small-source MERGE did not plan a broadcast join: " +
        plans.toArray.mkString("\n---\n").take(4000))
    } finally spark.listenerManager.unregister(listener)
    val got = spark.sql(
      "SELECT v FROM graft_lake.stat_t WHERE k <= 2 ORDER BY k")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("m0", "m1"), got.toString)
  }

  test("dropTable + recreate through ONE stable catalog serves fresh data (no stale caches)") {
    seed()
    import spark.implicits._
    val cycLake = new graft.v3.Lake(spark, root)
    // two full lifecycles through the SAME catalog name - exactly what
    // a graded bench row does twice per JVM now that the
    // nanoTime-suffixed catalog names are retired: every lake cache
    // (relation, inventory, scan index, commit headers) must re-key on
    // the new manifest INCARNATION, not serve the dropped table's state
    (1 to 2).foreach { cycle =>
      cycLake.dropTable("cyc_t")
      spark.sql(
        "CREATE TABLE graft_lake.cyc_t (chain_name STRING, k BIGINT, v STRING)")
      spark.sql(
        s"INSERT INTO graft_lake.cyc_t VALUES ('ethereum', $cycle, 'c$cycle')")
      val got = spark.sql("SELECT k, v FROM graft_lake.cyc_t")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((cycle.toLong, s"c$cycle")),
        s"cycle $cycle read stale data through the reused catalog: $got")
      // the row-level path re-keys too
      spark.sql(s"UPDATE graft_lake.cyc_t SET v = 'u$cycle' WHERE k = $cycle")
      val upd = spark.sql("SELECT v FROM graft_lake.cyc_t")
        .collect().map(_.getString(0)).toSeq
      assert(upd == Seq(s"u$cycle"), s"cycle $cycle UPDATE diverged: $upd")
    }
    cycLake.dropTable("cyc_t")
  }

  test("SET/UNSET TBLPROPERTIES map onto the lake's versioned property registry") {
    seed()
    spark.sql(
      "CREATE TABLE graft_lake.prop_t (chain_name STRING, k BIGINT)")
    spark.sql(
      """ALTER TABLE graft_lake.prop_t SET TBLPROPERTIES (
        | 'write.bloom.columns' = 'k', 'write.bloom.ndv' = '100000')""".stripMargin)
    val propLake = new graft.v3.Lake(spark, root)
    assert(propLake.tableProperties("prop_t") ==
      Map("write.bloom.columns" -> "k", "write.bloom.ndv" -> "100000"))
    // SHOW TBLPROPERTIES reads the registry through Table.properties
    val shown = spark.sql("SHOW TBLPROPERTIES graft_lake.prop_t")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(shown.get("write.bloom.columns").contains("k"), shown.toString)
    spark.sql(
      "ALTER TABLE graft_lake.prop_t UNSET TBLPROPERTIES ('write.bloom.ndv')")
    assert(propLake.tableProperties("prop_t") ==
      Map("write.bloom.columns" -> "k"))
    // reserved keys REFUSE rather than silently no-op: a SET LOCATION
    // that "succeeds" while the table keeps reading from the lake
    // root would be a lie
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft_lake.prop_t SET LOCATION '/elsewhere'")
    }
    assert(e1.getMessage.contains("no lake shape"), e1.getMessage)
    // 'provider' dies in Spark's own analyzer; 'owner' reaches the
    // catalog and must hit the guard - loud either way
    val e2 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_lake.prop_t SET TBLPROPERTIES ('provider'='orc')")
    }
    assert(e2.getMessage.contains("reserved table property") ||
      e2.getMessage.contains("no lake shape"), e2.getMessage)
    val e2b = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_lake.prop_t SET TBLPROPERTIES ('option.x'='1')")
    }
    assert(e2b.getMessage.contains("no lake shape") ||
      e2b.getMessage.contains("reserved"), e2b.getMessage)
    // and the registry is untouched by the refused statements
    assert(propLake.tableProperties("prop_t") ==
      Map("write.bloom.columns" -> "k"))
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
