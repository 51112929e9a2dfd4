package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.v3.{Lake, Schemas}

/** Plan-time data skipping from per-file column stats: arbitrary
  * pushed predicates (non-KEY columns included) prune FILES before a
  * task is scheduled, results stay exactly read+filter, and every
  * unprovable shape degrades to keep-everything — never to a wrong
  * result. */
class DataSkippingSpec extends SparkSpec {

  private def rows(ids: Seq[Int], chain: String = "ethereum") = {
    import spark.implicits._
    ids.map { i =>
      (chain, "IncreaseLiquidity", f"0xtx$i%05d", 1000L + i, i % 13L,
        "0xu1", s"$i", s"${i * 10}", s"${i * 100}",
        if (i % 10 == 0) null else s"$i", i % 7L)
    }.toDF("chain_name", "name", "transaction_hash", "block_number",
      "tx_index", "from_address", "amount", "amount0", "amount1",
      "tokenId", "log_index")
  }

  private def freshLake(tag: String): (Lake, String) = {
    val root = Files.createTempDirectory(tag).toString
    (new Lake(spark, root), root)
  }

  /** Four single-file appends with DISJOINT block_number ranges:
    * wave j covers [1000 + 100j, 1000 + 100j + 99]. */
  private def seed(lake: Lake): Unit =
    (0 until 4).foreach(j =>
      lake.append(rows(100 * j until 100 * j + 100).coalesce(1),
        Schemas.Nfp))

  private def skipDelta(dir: String)(body: => Unit): (Long, Long) = {
    val before = DataSkipping.skipStats(dir).getOrElse((0L, 0L))
    body
    val after = DataSkipping.skipStats(dir).getOrElse((0L, 0L))
    (after._1 - before._1, after._2 - before._2)
  }

  test("commit-time stats + V1 read path: a block_number range schedules only the overlapping files") {
    val (lake, root) = freshLake("dskip-v1")
    seed(lake)
    val tableDir = s"$root/${Schemas.Nfp}"
    val (cand, kept) = skipDelta(tableDir) {
      val got = lake.read(Schemas.Nfp)
        .filter(col("block_number").between(1150L, 1249L))
        .agg(count(lit(1)), sum(col("block_number"))).collect()(0)
      assert(got.getLong(0) == 100L)
      assert(got.getLong(1) == (1150L to 1249L).sum)
    }
    assert(cand == 4 && kept == 2,
      s"expected 2 of 4 files kept, got kept=$kept of $cand")
    assert(lake.statsCollectFailures.get() == 0L)
  }

  test("every predicate shape agrees with the unskipped read; unprovable shapes keep everything") {
    val (lake, root) = freshLake("dskip-shapes")
    seed(lake)
    val tableDir = s"$root/${Schemas.Nfp}"
    val full = lake.read(Schemas.Nfp).collect().toSeq
    def check(cond: org.apache.spark.sql.Column,
              expectKept: Long): Unit = {
      val (cand, kept) = skipDelta(tableDir) {
        val got = lake.read(Schemas.Nfp).filter(cond).collect().toSeq
        val want = spark.createDataFrame(
          spark.sparkContext.parallelize(full),
          lake.read(Schemas.Nfp).schema).filter(cond).collect().toSeq
        assert(got.map(_.toString).sorted == want.map(_.toString).sorted,
          s"skipped read diverged for $cond")
      }
      if (expectKept < 0)
        // unprovable: the compiled test collapses to None and the
        // per-file walk never runs (the no-overhead path)
        assert((cand, kept) == ((0L, 0L)),
          s"$cond ran a skip walk: $kept of $cand")
      else
        assert((cand, kept) == ((4L, expectKept)),
          s"$cond kept $kept of $cand, expected $expectKept of 4")
    }
    // provable: =, <, >=, IN, LIKE-prefix, AND, OR of provables
    check(col("block_number") === 1005L, 1)
    check(col("block_number") < 1100L, 1)
    check(col("block_number") >= 1300L, 1)
    check(col("block_number").isin(1001L, 1303L), 2)
    check(col("transaction_hash").startsWith("0xtx001"), 1)
    check(col("block_number") > 1050L && col("block_number") <= 1150L, 2)
    check(col("block_number") < 1050L || col("block_number") > 1350L, 2)
    // string range on the zero-padded key column
    check(col("transaction_hash") between("0xtx00210", "0xtx00290"), 1)
    // IsNull compiles against persisted null counts now; tokenId is
    // OUTSIDE the default stats column set (9th data column, cap 8),
    // so its counts are unknown -> every file kept, results exact.
    // != still pushes an inferred IsNotNull(block_number) conjunct,
    // so a walk runs (block_number has no nulls: all kept).
    check(col("tokenId").isNull, 4)
    check(col("block_number") =!= 1005L, 4)
    check(col("block_number") === 1005L || col("tokenId").isNull, 4)
  }

  test("null-count and double-bound pruning: IsNull/IsNotNull and double ranges skip files; NaN/zero edges stay exact") {
    import org.apache.spark.sql.types._
    val (lake, root) = freshLake("dskip-nulldouble")
    val t = "px_skip"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("k", LongType, nullable = true),
      StructField("px", DoubleType, nullable = true),
      StructField("tag", StringType, nullable = true))))
    import spark.implicits._
    // wave j covers k in [100j, 100j+99], px = k + 0.25 (disjoint
    // double ranges); wave 0's k=1 row carries NEGATIVE ZERO (the
    // stats normalization edge). Nulls: px null in wave 0 where
    // k%10==0; tag null in wave 2 where k%7==0 and ALL null in wave 3.
    def wave(j: Int) = (100 * j until 100 * j + 100).map { k =>
      val px: java.lang.Double =
        if (j == 0 && k % 10 == 0) null
        else if (j == 0 && k == 1) java.lang.Double.valueOf(-0.0d)
        else java.lang.Double.valueOf(k + 0.25)
      val tag: String =
        if (j == 3 || (j == 2 && k % 7 == 0)) null else s"t$k"
      ("ethereum", k.toLong, px, tag)
    }.toDF("chain_name", "k", "px", "tag")
    (0 until 4).foreach(j => lake.append(wave(j).coalesce(1), t))
    val dirT = s"$root/$t"
    val full = lake.read(t).collect().toSeq
    def check(cond: org.apache.spark.sql.Column, expectKept: Long): Unit = {
      val s0 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      val got = lake.read(t).filter(cond).collect().toSeq
      val want = spark.createDataFrame(
        spark.sparkContext.parallelize(full),
        lake.read(t).schema).filter(cond).collect().toSeq
      assert(got.map(_.toString).sorted == want.map(_.toString).sorted,
        s"skipped read diverged for $cond")
      val s1 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      assert((s1._1 - s0._1, s1._2 - s0._2) == ((4L, expectKept)),
        s"$cond kept ${s1._2 - s0._2} of ${s1._1 - s0._1}, " +
          s"expected $expectKept of 4")
    }
    // double range/equality pruning
    check(col("px") === 250.25d, 1)
    check(col("px") < 100.0d, 1)
    check(col("px") >= 100.25d && col("px") < 200.0d, 1)
    // IsNull prunes to exactly the null-bearing files
    check(col("px").isNull, 1)
    check(col("tag").isNull, 2)
    // IsNotNull skips the ALL-null file, keeps partial/none-null ones
    check(col("tag").isNotNull, 3)
    check(col("px").isNotNull, 4)
    // zero edge: wave 0 holds a -0.0 value; parquet writes it as the
    // min, extraction normalizes it to 0.0, and BOTH literal forms
    // (IEEE-equal in Spark) must keep exactly that file and find the
    // row
    check(col("px") === 0.0d, 1)
    check(col("px") === -0.0d, 1)
    // NaN literal: unprovable from min/max (Spark orders NaN above
    // everything) - the inferred IsNotNull conjunct still walks, px
    // nulls keep wave 0 only when... px has non-nulls everywhere: 4
    check(col("px") === Double.NaN, 4)
    // null-safe equality to NULL is IsNull (same pruning)
    check(col("px") <=> lit(null), 1)
  }

  test("decimal bounds and != constant-file pruning; scale-mismatch literals degrade to keep") {
    import org.apache.spark.sql.types._
    val (lake, root) = freshLake("dskip-decne")
    val t = "dec_skip"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("k", LongType, nullable = true),
      StructField("price", DecimalType(12, 2), nullable = true),
      StructField("tag", StringType, nullable = true))))
    import spark.implicits._
    // wave j: price = (100j + i) + 0.25 as decimal(12,2), disjoint per
    // wave; tag CONSTANT 'only' in wave 3, mixed elsewhere, and null
    // on k%9==0 in wave 1 only
    def wave(j: Int) = (100 * j until 100 * j + 100).map { k =>
      val tag: String =
        if (j == 3) "only"
        else if (j == 1 && k % 9 == 0) null
        else s"t$k"
      ("ethereum", k.toLong, s"$k.25", tag)
    }.toDF("chain_name", "k", "price_s", "tag")
      .select(col("chain_name"), col("k"),
        col("price_s").cast("decimal(12,2)").as("price"), col("tag"))
    (0 until 4).foreach(j => lake.append(wave(j).coalesce(1), t))
    val dirT = s"$root/$t"
    val full = lake.read(t).collect().toSeq
    def check(cond: org.apache.spark.sql.Column, expectKept: Long): Unit = {
      val s0 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      val got = lake.read(t).filter(cond).collect().toSeq
      val want = spark.createDataFrame(
        spark.sparkContext.parallelize(full),
        lake.read(t).schema).filter(cond).collect().toSeq
      assert(got.map(_.toString).sorted == want.map(_.toString).sorted,
        s"skipped read diverged for $cond")
      val s1 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      if (expectKept < 0)
        assert((s1._1 - s0._1, s1._2 - s0._2) == ((0L, 0L)),
          s"$cond ran a walk: ${s1._2 - s0._2} of ${s1._1 - s0._1}")
      else
        assert((s1._1 - s0._1, s1._2 - s0._2) == ((4L, expectKept)),
          s"$cond kept ${s1._2 - s0._2} of ${s1._1 - s0._1}, " +
            s"expected $expectKept of 4")
    }
    // decimal range/equality: literal built at the column's EXACT type
    // (a mismatched scale would cast the column -> keep, tested below)
    val p250 = lit(new java.math.BigDecimal("250.25")).cast("decimal(12,2)")
    check(col("price") === p250, 1)
    check(col("price") < lit(new java.math.BigDecimal("100.00"))
      .cast("decimal(12,2)"), 1)
    // != prunes exactly the constant-valued file (wave 3 all 'only');
    // the file where tag has nulls (wave 1) is correctly KEPT (its
    // non-null values differ) and its null rows stay excluded
    check(col("tag") =!= "only", 3)
    // NOT <=> would ALSO match nulls: wave 3 has zero tag nulls
    // (known), so it still prunes
    check(!(col("tag") <=> "only"), 3)
    // a scale-differing literal: Catalyst's UnwrapCastInBinaryComparison
    // rewrites Cast(price) > 250.253 back to a (12,2)-typed comparison
    // (price > 250.25 boundary-adjusted), so the pushed filter prunes
    // legitimately - waves 2 and 3 survive, results exact
    check(col("price") > lit(new java.math.BigDecimal("250.253"))
      .cast("decimal(13,3)"), 2)
  }

  test("wide-decimal (FLBA) bounds prune under the SIGNED domain: decimal(38,2) ranges incl. negatives skip files") {
    import org.apache.spark.sql.types._
    val (lake, root) = freshLake("dskip-flba")
    val t = "dec38_skip"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("k", LongType, nullable = true),
      StructField("bal", DecimalType(38, 2), nullable = true))))
    import spark.implicits._
    // wave j covers bal in [100j - 200, 100j - 101] + .25 cents —
    // waves 0 and 1 are ENTIRELY negative, wave 2 straddles zero.
    // Under the broken unsigned byte order every negative bound sorts
    // ABOVE every positive one, so any mis-domained comparison would
    // prune wrongly here; the signed BigInteger domain must not.
    def wave(j: Int) = (0 until 100).map { i =>
      val v = 100 * j + i - 200
      ("ethereum", (100 * j + i).toLong, s"$v.25")
    }.toDF("chain_name", "k", "bal_s")
      .select(col("chain_name"), col("k"),
        col("bal_s").cast("decimal(38,2)").as("bal"))
    (0 until 4).foreach(j => lake.append(wave(j).coalesce(1), t))
    val dirT = s"$root/$t"
    val full = lake.read(t).collect().toSeq
    def check(cond: org.apache.spark.sql.Column, expectKept: Long): Unit = {
      val s0 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      val got = lake.read(t).filter(cond).collect().toSeq
      val want = spark.createDataFrame(
        spark.sparkContext.parallelize(full),
        lake.read(t).schema).filter(cond).collect().toSeq
      assert(got.map(_.toString).sorted == want.map(_.toString).sorted,
        s"skipped read diverged for $cond")
      val s1 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
      assert((s1._1 - s0._1, s1._2 - s0._2) == ((4L, expectKept)),
        s"$cond kept ${s1._2 - s0._2} of ${s1._1 - s0._1}, " +
          s"expected $expectKept of 4")
    }
    def d38(s: String) = lit(new java.math.BigDecimal(s))
      .cast("decimal(38,2)")
    // equality inside a fully-negative wave
    check(col("bal") === d38("-150.75"), 1)
    // range entirely below zero: waves 0 and 1 only
    check(col("bal") < d38("-100.00"), 2)
    // the sign boundary: >= 0 keeps waves 2 and 3 only — the case an
    // unsigned comparison inverts
    check(col("bal") >= d38("0.00"), 2)
    // a straddling range
    check(col("bal") >= d38("-120.50") && col("bal") <= d38("-20.25"), 2)
    // IN across two waves
    check(col("bal").isin(d38("-199.75"), d38("150.25")), 2)
    // != on a constant-valued file: single-value append prunes
    lake.append(Seq(("ethereum", 9999L, "42.00")).toDF("chain_name", "k",
        "bal_s")
      .select(col("chain_name"), col("k"),
        col("bal_s").cast("decimal(38,2)").as("bal")).coalesce(1), t)
    val s0 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
    assert(lake.read(t).filter(col("bal") =!= d38("42.00")).count() == 400L)
    val s1 = graft.plans.DataSkipping.skipStats(dirT).getOrElse((0L, 0L))
    assert((s1._1 - s0._1, s1._2 - s0._2) == ((5L, 4L)),
      s"!= kept ${s1._2 - s0._2} of ${s1._1 - s0._1}, expected 4 of 5")
  }

  test("a scale-mismatched decimal file (foreign writer) collects NO stats and is never pruned") {
    import org.apache.spark.sql.types._
    val (lake, root) = freshLake("dskip-decscale")
    val t = "dec_scale_gate"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("k", LongType, nullable = true),
      StructField("price", DecimalType(12, 2), nullable = true))))
    import spark.implicits._
    lake.append(Seq(("ethereum", 1L, "10.25"), ("ethereum", 2L, "20.25"))
      .toDF("chain_name", "k", "price_s")
      .select(col("chain_name"), col("k"),
        col("price_s").cast("decimal(12,2)").as("price")).coalesce(1), t)
    // a FOREIGN writer lands a file at scale 4 behind the manifest's
    // back (the only way such a file can exist) and refreshManifest
    // adopts it. Its unscaled longs are 100× the schema's domain —
    // trusting them would prune wrongly for any (12,2) literal.
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val foreignTmp = Files.createTempDirectory("dskip-foreign").toString
    Seq(("ethereum", 3L, "30.2525"))
      .toDF("chain_name", "k", "price_s")
      .select(col("k"), col("price_s").cast("decimal(12,4)").as("price"))
      .coalesce(1).write.mode("overwrite").parquet(foreignTmp)
    val src = fs.listStatus(new org.apache.hadoop.fs.Path(foreignTmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val dst = new org.apache.hadoop.fs.Path(
      s"$root/$t/chain_name=ethereum/foreign-scale4.parquet")
    assert(fs.rename(src, dst))
    lake.refreshManifest(t)
    assert(lake.analyzeTable(t) >= 1L)
    // the mismatched file's price stats must be UNKNOWN (extraction
    // gate), so every pruning walk keeps it
    val provider = lake.statsProvider(t)
    val inv = lake.fileInventory(t)
    val foreign = inv.find(_._2.contains("foreign-scale4")).get
    assert(provider.range(new org.apache.hadoop.fs.Path(foreign._2),
      foreign._3, "price").isEmpty,
      "scale-mismatched file served decimal stats - would mis-prune")
    // the lake-written file still prunes normally
    val native = inv.find(!_._2.contains("foreign-scale4")).get
    assert(provider.range(new org.apache.hadoop.fs.Path(native._2),
      native._3, "price").isDefined)
  }

  test("SQL catalog (DSv2) path prunes on a non-key predicate; VERSION pin + patched index keep pruning") {
    val (lake, root) = freshLake("dskip-sql")
    val cat = "dskip_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    seed(lake)
    val tableDir = s"$root/${Schemas.Nfp}"
    val (cand, kept) = skipDelta(tableDir) {
      val got = spark.sql(
        s"""SELECT count(*) AS n, sum(block_number) AS s
           |FROM $cat.${Schemas.Nfp}
           |WHERE block_number BETWEEN 1150 AND 1249""".stripMargin)
        .collect()(0)
      assert(got.getLong(0) == 100L && got.getLong(1) == (1150L to 1249L).sum)
    }
    // DSv2 walks listFiles more than once per query (statistics +
    // partition planning), so assert the RATIO: every walk kept
    // exactly the 2 overlapping files of 4
    assert(cand > 0 && cand % 4 == 0 && kept == cand / 2,
      s"DSv2 path: expected half kept, got $kept of $cand")
    // one more commit: the PATCHED index must prune the new file set
    lake.append(rows(400 until 500).coalesce(1), Schemas.Nfp)
    val (cand2, kept2) = skipDelta(tableDir) {
      val n = spark.sql(
        s"SELECT count(*) FROM $cat.${Schemas.Nfp} WHERE block_number >= 1400")
        .collect()(0).getLong(0)
      assert(n == 100L)
    }
    assert(cand2 > 0 && cand2 % 5 == 0 && kept2 == cand2 / 5,
      s"patched index: expected 1 of 5 kept per walk, got $kept2 of $cand2")
  }

  test("stats survive a driver restart through the sidecar; stats.collect=false disables; analyzeTable backfills") {
    val (lake, root) = freshLake("dskip-sidecar")
    seed(lake)
    val tableDir = s"$root/${Schemas.Nfp}"
    // a FRESH Lake instance (new driver) must prune from the
    // persisted sidecar without re-reading any footer
    val lake2 = new Lake(spark, root)
    val reads0 = lake2.footerReads.get()
    val (cand, kept) = skipDelta(tableDir) {
      assert(lake2.read(Schemas.Nfp)
        .filter(col("block_number") === 1310L).count() == 1L)
    }
    assert(cand == 4 && kept == 1, s"fresh driver kept $kept of $cand")
    assert(lake2.footerReads.get() == reads0,
      "plan-time pruning opened a footer")

    // a table opting out collects nothing and never prunes
    val (lake3, root3) = freshLake("dskip-off")
    lake3.setTableProperties(Schemas.Nfp, Map("stats.collect" -> "false"))
    (0 until 2).foreach(j =>
      lake3.append(rows(100 * j until 100 * j + 100).coalesce(1),
        Schemas.Nfp))
    val dir3 = s"$root3/${Schemas.Nfp}"
    val (c3, k3) = skipDelta(dir3) {
      assert(lake3.read(Schemas.Nfp)
        .filter(col("block_number") === 1005L).count() == 1L)
    }
    assert(c3 == 2 && k3 == 2, s"opted-out table pruned: $k3 of $c3")
    // flipping collection ON + analyzeTable backfills the old files
    lake3.setTableProperties(Schemas.Nfp, Map("stats.collect" -> "true"))
    assert(lake3.analyzeTable(Schemas.Nfp) == 2L)
    val (c4, k4) = skipDelta(dir3) {
      assert(lake3.read(Schemas.Nfp)
        .filter(col("block_number") === 1005L).count() == 1L)
    }
    assert(c4 == 2 && k4 == 1, s"backfilled table kept $k4 of $c4")
  }

  test("schema evolution x skipping: widened and added columns never prune wrongly") {
    import org.apache.spark.sql.types._
    val (lake, root) = freshLake("dskip-evo")
    val t = "docs_skip_evo"
    val sf = StructField(_: String, StringType, nullable = true)
    val v1 = StructType(Seq(sf("chain_name"), sf("doc_id"),
      StructField("n_tokens", IntegerType, nullable = true)))
    val v2 = StructType(Seq(sf("chain_name"), sf("doc_id"),
      StructField("n_tokens", LongType, nullable = true), sf("lang")))
    lake.createTable(t, v1)
    def wave(lo: Int, hi: Int, lang: Option[String]) = {
      import spark.implicits._
      val base = (lo until hi).map(i =>
        ("ethereum", f"0xd$i%06d", i)).toDF("chain_name", "doc_id", "nt")
      lang match {
        case None => base.select(col("chain_name"), col("doc_id"),
          col("nt").cast("int").as("n_tokens"))
        case Some(l) => base.select(col("chain_name"), col("doc_id"),
          col("nt").cast("long").as("n_tokens"), lit(l).as("lang"))
      }
    }
    // wave 1 under v1: int32 files, stats recorded from INT32 footers
    lake.append(wave(0, 100, None).coalesce(1), t)
    lake.evolveSchema(t, v2)
    // wave 2 under v2: int64 + the new lang column
    lake.append(wave(1000, 1100, Some("de")).coalesce(1), t)
    val dirT = s"$root/$t"
    // widened-column predicate: INT32-era stats (persisted widened to
    // long) and INT64-era stats prune under ONE long literal domain
    val (c1, k1) = skipDelta(dirT) {
      assert(lake.read(t).filter(col("n_tokens") >= 1000L).count() == 100L)
    }
    assert(c1 == 2 && k1 == 1, s"widened-column pruning: kept $k1 of $c1")
    val (c2, k2) = skipDelta(dirT) {
      assert(lake.read(t).filter(col("n_tokens") < 100L).count() == 100L)
    }
    assert(c2 == 2 && k2 == 1, s"widened-column pruning: kept $k2 of $c2")
    // added-column predicate: pre-evolution files have NO lang entry
    // (unknown -> kept, and their rows read lang as null - exact);
    // post-evolution files prune by their real stats
    val (c3, k3) = skipDelta(dirT) {
      assert(lake.read(t).filter(col("lang") === "de").count() == 100L)
      assert(lake.read(t).filter(col("lang") === "zz").count() == 0L)
    }
    // both queries keep the stats-less v1 file; the v2 file prunes
    // for 'zz' (1 + 2 kept across the two walks)
    assert(c3 == 4 && k3 == 3, s"added-column pruning: kept $k3 of $c3")
  }

  test("cluster rewrite tightens stats: post-clustering range queries prune the rewritten files") {
    val (lake, root) = freshLake("dskip-cluster")
    // interleaved appends: every file spans the whole block range -
    // nothing prunable on block_number
    (0 until 4).foreach(j =>
      lake.append(rows(Seq.range(j, 400, 4)).coalesce(1), Schemas.Nfp))
    val dirT = s"$root/${Schemas.Nfp}"
    val (c0, k0) = skipDelta(dirT) {
      assert(lake.read(Schemas.Nfp)
        .filter(col("block_number").between(1000L, 1049L)).count() == 50L)
    }
    assert(c0 == 4 && k0 == 4, s"pre-clustering should keep all: $k0 of $c0")
    // cluster by the range column: the rewrite commit collects tight
    // per-file stats for its own output, and the same query now
    // schedules a strict subset
    val bytes = lake.fileInventory(Schemas.Nfp).map(_._3).sum
    assert(lake.clusterCompact(Schemas.Nfp, targetBytes = bytes / 4,
      clusterBy = Seq("block_number")) == 1)
    val (c1, k1) = skipDelta(dirT) {
      assert(lake.read(Schemas.Nfp)
        .filter(col("block_number").between(1000L, 1049L)).count() == 50L)
    }
    assert(c1 >= 2 && k1 < c1,
      s"post-clustering range query did not prune: kept $k1 of $c1")
  }

  test("a typo'd stats.columns refuses AT SET TIME, not as a swallowed warning") {
    val (lake, _) = freshLake("dskip-typo")
    lake.append(rows(0 until 10).coalesce(1), Schemas.Nfp)
    val e = intercept[IllegalArgumentException] {
      lake.setTableProperties(Schemas.Nfp,
        Map("stats.columns" -> "block_number,blok_number"))
    }
    assert(e.getMessage.contains("blok_number"), e.getMessage)
    // a valid list sets fine and drives collection
    lake.setTableProperties(Schemas.Nfp,
      Map("stats.columns" -> "block_number"))
    assert(lake.statsColumns(Schemas.Nfp) == Seq("block_number"))
  }

  test("listFiles memo keys structurally: string literals containing #<digits> never collide") {
    // regression: the memo key was once the rendered filter text with
    // `#\d+` regex-stripped (to normalize exprIds) — which ALSO
    // mangled string literals carrying '#<digits>', so `doc_id =
    // 'item#1'` and `doc_id = 'item#2'` collided onto one cache key
    // and the second query silently reused the first's pruned file
    // list (missing rows). The key is now built from structurally
    // exprId-normalized expressions, literals untouched.
    val (lake, root) = freshLake("dskip-hashlit")
    val cat = "dskip_hashlit_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    import org.apache.spark.sql.types._
    val t = "docs_hashlit"
    lake.createTable(t, StructType(Seq(
      StructField("chain_name", StringType, nullable = true),
      StructField("doc_id", StringType, nullable = true),
      StructField("n", LongType, nullable = true))))
    import spark.implicits._
    // two single-value files: each literal's stats exclude the other
    // file, so a collided key returns the WRONG file set (0 rows)
    lake.append(Seq(("ethereum", "item#1", 1L), ("ethereum", "item#1", 2L))
      .toDF("chain_name", "doc_id", "n").coalesce(1), t)
    lake.append(Seq(("ethereum", "item#2", 3L), ("ethereum", "item#2", 4L))
      .toDF("chain_name", "doc_id", "n").coalesce(1), t)
    def q(v: String): Long =
      spark.sql(s"SELECT count(*) AS c, sum(n) AS s FROM $cat.$t " +
        s"WHERE doc_id = '$v'").collect()(0).getLong(1)
    // same table version → same cached index → same listFiles memo
    assert(q("item#1") == 3L, "first literal read wrong rows")
    assert(q("item#2") == 7L,
      "second literal reused the first literal's pruned file list")
    assert(q("item#1") == 3L) // and back (memo hit must be the RIGHT one)
  }

  test("UPDATE/MERGE correctness is untouched by stats (row-level scans push no data filters)") {
    val (lake, root) = freshLake("dskip-rowlevel")
    val cat = "dskip_rl_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    seed(lake)
    // narrow UPDATE: only rows in one file match; every OTHER row of
    // the table must survive the rewrite byte-for-byte
    spark.sql(s"UPDATE $cat.${Schemas.Nfp} SET amount = 'upd' " +
      "WHERE block_number BETWEEN 1150 AND 1159")
    val after = lake.read(Schemas.Nfp)
    assert(after.filter(col("amount") === "upd").count() == 10L)
    assert(after.count() == 400L,
      "row-level rewrite with stats present lost rows")
  }
}
