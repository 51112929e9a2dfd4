package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset-assembly operators for training pipelines:
  * train/val/test splitting and per-stratum downsampling. Both are
  * pure narrow projections over a salted md5 hash bucket — no
  * shuffle, no RNG state, no sampling drift between runs or engines:
  * the same (salt, id) always lands in the same bucket, on Spark and
  * in the DuckDB oracle alike (md5 is the repo's cross-engine hash;
  * see Dedup.md5Hash64). Reassembling a 100 TB corpus is therefore
  * reproducible and incremental — new rows join the same split their
  * id dictates, without touching old ones.
  */
object Sampling {

  /** Salted hash bucket in [0, buckets): the first 8 md5 hex digits of
    * `salt|id`, parsed as an integer. 32 bits of hash over ≤ 10^6
    * buckets keeps per-bucket skew negligible. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long") % buckets

  /** Deterministic train/val/test (or any) split: each row gets the
    * first label whose cumulative weight covers its hash bucket.
    * `fractions` must sum to ≤ 1; rows past the total (if < 1) get
    * null — a held-out remainder. Changing `salt` reshuffles every
    * assignment; changing only the fractions moves the minimum number
    * of rows (bucket boundaries shift, ids keep their buckets). */
  def datasetSplit(df: DataFrame, id: Column,
                   fractions: Seq[(String, Double)],
                   salt: String = "split",
                   buckets: Int = 10000,
                   out: String = "split"): DataFrame = {
    val total = fractions.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"fractions sum to $total > 1")
    val b = hashBucket(id, salt, buckets)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * buckets))
    // build the CASE from the last label backwards so the first
    // matching (lowest) cut wins
    val assigned = fractions.zip(cuts).reverse
      .foldLeft[Column](lit(null).cast("string")) {
        case (els, ((label, _), cut)) => when(b < cut, lit(label)).otherwise(els)
      }
    df.withColumn(out, assigned)
  }

  /** Leakage-safe [[datasetSplit]]: rows are assigned by their
    * DUPLICATE CLUSTER's representative id, not their own — so a
    * near-duplicate pair can never straddle train and test (the
    * standard eval-hygiene rule: a test document with a near-copy in
    * train is leaked, and doc-level hashing splits such pairs ~2·p·(1−p)
    * of the time). `clusters` is [[Dedup.duplicateClusters]] output
    * (id, cluster) — docs absent from it are singletons and hash by
    * their own id, which is exactly `coalesce(cluster, id)`. One
    * broadcast-or-shuffle equi-join on the id plus the same salted-md5
    * assignment; the cluster table is pair-graph-sized (near-dup
    * graphs are tiny relative to their corpus), not corpus-sized. */
  def datasetSplitByCluster(df: DataFrame, id: Column, clusters: DataFrame,
                            fractions: Seq[(String, Double)],
                            salt: String = "split",
                            buckets: Int = 10000,
                            out: String = "split"): DataFrame = {
    val keyed = df.join(
        clusters.select(col("id").as("__cid"), col("cluster").as("__cluster")),
        id === col("__cid"), "left")
    datasetSplit(keyed, coalesce(col("__cluster"), id), fractions, salt,
        buckets, out)
      .drop("__cid", "__cluster")
  }

  /** Per-source epoch plan for mixture reweighting: how many times to
    * repeat each source so its share of the assembled corpus reaches
    * the target weight — the static-mixture application step of
    * domain-reweighting recipes (upsample Wikipedia/books, leave web
    * crawl at one epoch). epochs_s = max(1, ⌈weight_s · total /
    * size_s⌉), where size is any per-row cost measure (chars, tokens)
    * and `total` its corpus-wide sum: a source holding share p of the
    * corpus and assigned weight w repeats ⌈w/p⌉ times. Exact-integer
    * sums; the one double product (w·total/size_s) is two exact-
    * rounded IEEE ops, bit-equal in the DuckDB oracle. Output:
    * (source, src_size, epochs) — |sources| rows. */
  def mixtureEpochs(df: DataFrame, source: String, size: Column,
                    weights: Map[String, Double],
                    defaultWeight: Double): DataFrame = {
    val bySrc = df.groupBy(col(source)).agg(sum(size).as("src_size"))
    val total = bySrc.agg(sum(col("src_size")).as("total_size"))
    val w = weights.toSeq.sortBy(_._1)
      .foldLeft[Column](lit(defaultWeight)) { case (els, (s, v)) =>
        when(col(source) === s, lit(v)).otherwise(els)
      }
    bySrc.crossJoin(broadcast(total))
      .select(col(source), col("src_size"),
        // a zero-size source would make w·total/0 = +Inf and
        // ceil(+Inf) → Long.MaxValue epochs, which the upsample
        // explode turns into an absurd job — fail loudly instead
        when(col("src_size") > 0,
          greatest(lit(1L), ceil(w * col("total_size") / col("src_size"))))
          .otherwise(raise_error(concat(lit("mixtureEpochs: source '"),
            col(source), lit("' has non-positive total size"))))
          .as("epochs"))
  }

  /** Apply the [[mixtureEpochs]] plan: every row repeats `epochs`
    * times with an `epoch` index (0-based) — the materialized
    * upsampled corpus (downstream shuffling/packing distinguishes
    * copies by (id, epoch)). The plan is |sources| rows, broadcast;
    * the corpus side explodes in place — no shuffle, scan-shaped at
    * 100 TB. */
  def mixtureUpsample(df: DataFrame, source: String, size: Column,
                      weights: Map[String, Double],
                      defaultWeight: Double): DataFrame = {
    val plan = mixtureEpochs(df, source, size, weights, defaultWeight)
      .select(col(source), col("epochs"))
    df.join(broadcast(plan), Seq(source))
      .withColumn("epoch", explode(sequence(lit(0L), col("epochs") - 1)))
      .drop("epochs")
  }

  /** Deterministic global training order — the "shuffle the corpus"
    * step of dataset assembly, as a reproducible computation instead
    * of an RNG pass: order rows by a salted 64-bit md5 hash. Output:
    * input + (order_key, shard, pos), where pos is the dense 0-based
    * rank within the shard and readers interleave shards round-robin
    * (shard r, pos 0), (shard r+1, pos 0), … — a full pass visits
    * every row exactly once in hash order.
    *
    * Scale shape: the hash is a narrow projection; the only wide step
    * is one row_number window PER SHARD, so no global single-partition
    * sort ever materializes — pick `shards` ≈ a few × executor count
    * and each window sorts |corpus|/shards rows. Same-salt runs
    * reproduce the same order on any engine (md5 is the cross-engine
    * hash); a new salt is a fresh epoch permutation. `id` must be
    * unique — it is the hash input AND the rank tie-break, so
    * duplicate ids would make their relative order engine-dependent. */
  def shuffleOrder(df: DataFrame, id: Column, shards: Int = 8,
                   salt: String = "shuffle"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val h = Dedup.md5Hash64(concat(lit(salt + "|"), id.cast("string")))
    df.withColumn("order_key", h)
      .withColumn("shard", pmod(col("order_key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("order_key"), id))
        .cast("long") - 1L)
  }

  /** Shard export manifest — the loader-side integrity artifact: one
    * row per shard with its row count, position bounds, and an
    * order-sensitive digest (md5 over the comma-joined ids in read
    * order), so a training loader can verify each shard file it
    * reads is complete, correctly ordered, and untampered — the
    * ready-for-training handoff every corpus export needs next to
    * [[shuffleOrder]]'s assignment. The in-shard id list is
    * assembled per shard key (collect + sort by pos row-locally —
    * shards are the parallelism unit and each holds n/shards rows by
    * the salted-hash balance, the documented [[shuffleOrder]]
    * contract); the digest is exact and engine-identical. Output:
    * (shard, n, min_pos, max_pos, ids_md5). */
  def shardManifest(ordered: DataFrame, id: Column): DataFrame = {
    // netstring framing makes the digest injective however the ids
    // look: "len:id" per element ("n" for NULL — concat_ws would
    // silently SKIP a null, leaving n and the digest inconsistent),
    // so comma-bearing or empty ids cannot collide frames
    val idStr = id.cast("string")
    val enc = when(idStr.isNull, lit("n"))
      .otherwise(concat(length(idStr).cast("string"), lit(":"), idStr))
    ordered.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"),
            enc.as("__id")))),
            s => s.getField("__id"))).cast("binary")).as("ids_md5"))
  }

  /** Deterministic curriculum ordering — the published easy-to-hard
    * (or short-to-long "sequence length warmup") pretraining order,
    * reproducible: rows rank by `score` ASCENDING within each shard
    * (pass a negated column for hard-to-easy), the rank maps to one of
    * `nBuckets` difficulty bands by exact integer arithmetic
    * (bucket = (rank−1)·nBuckets div shard_n — bands are equal-count,
    * not equal-width), and each band is internally shuffled by salted
    * md5 so the curriculum does not correlate with ingest order.
    * Output: input columns + order_key, shard, bucket, pos (the read
    * position within the shard; a loader walks shards round-robin and
    * each sees its bands in sequence).
    *
    * Scale shape: [[shuffleOrder]]'s contract — shards are the
    * parallelism unit, three window functions share ONE per-shard
    * partitioning (rank, count, position; no global sort ever
    * materializes), and `id` uniqueness makes every tie-break exact.
    * The DuckDB oracle replays hash, rank, band and position. */
  def curriculumOrder(df: DataFrame, id: Column, score: Column,
                      nBuckets: Int = 4, shards: Int = 8,
                      salt: String = "curr"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 1 && shards >= 1, "need nBuckets, shards >= 1")
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val h = Dedup.md5Hash64(concat(lit(salt + "|"), id.cast("string")))
    val byShard = Window.partitionBy(col("shard"))
    df.withColumn("order_key", h)
      .withColumn("shard", pmod(col("order_key"), lit(shards.toLong)))
      .withColumn("__rk", row_number().over(
        byShard.orderBy(score, id)).cast("long"))
      .withColumn("__n", count(lit(1)).over(byShard))
      .withColumn("bucket", call_function("div",
        (col("__rk") - 1) * nBuckets, col("__n")))
      .withColumn("pos", row_number().over(
        byShard.orderBy(col("bucket"), col("order_key"), id))
        .cast("long") - 1L)
      .drop("__rk", "__n")
  }

  /** EXACTLY-k deterministic sample per stratum — fixed-size eval/probe
    * subsets, where [[stratifiedSample]]'s rate form gives only an
    * expected size. Rank rows within each stratum by (salted md5, id) —
    * a uniform, reproducible order — and keep rank ≤ k (all rows when
    * the stratum is smaller). One row_number window per stratum
    * partition: strata are the parallelism unit, the same shape as
    * [[shuffleOrder]]'s per-shard rank, so no global sort and no
    * single-task window at any corpus size (assuming strata ≪ corpus,
    * which is what stratification means). Changing `salt` redraws the
    * sample; ids keep their rank order between draws of the same salt. */
  def takePerStratum(df: DataFrame, id: Column, stratum: Column, k: Int,
                     salt: String = "take"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val h = Dedup.md5Hash64(concat(lit(salt + "|"), id.cast("string")))
    df.withColumn("__h", h)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(stratum).orderBy(col("__h"), id)))
      .filter(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  /** Deterministic TOKEN-BUDGET sample per stratum — the form real
    * mixture specs take ("30B tokens of web, 5B of code"), where
    * [[takePerStratum]] counts documents and [[stratifiedSample]]
    * rates are fractions of an unknown total. Rows rank within their
    * stratum by (salted md5, id) — a uniform reproducible order — and
    * the kept set is the rank-prefix whose cumulative token count
    * stays under the stratum's budget: a row is kept iff the tokens
    * BEFORE it fit (cum − tokens < budget), so the budget is overshot
    * by at most one document (the same boundary convention as
    * [[Chunking.packSequences]] bin assignment). Strata absent from
    * `budgets` get `defaultBudget`.
    *
    * Scale shape: one rank window + one running-sum window, BOTH
    * partitioned by the stratum — they share a single hash exchange
    * (same fused-window shape as [[Curation.epochAssembly]]), so no
    * global sort at any corpus size; strata are the parallelism unit.
    * Deterministic and integer-exact, so the DuckDB oracle replays the
    * selection bit-for-bit; changing `salt` redraws which documents
    * fill the budget. Output: input + (n_tokens, cum_tokens), kept
    * rows only. */
  def tokenBudgetSample(df: DataFrame, id: Column, stratum: Column,
                        tokens: Column, budgets: Map[String, Long],
                        defaultBudget: Long,
                        salt: String = "budget"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "budgets must be >= 0")
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val h = Dedup.md5Hash64(concat(lit(salt + "|"), id.cast("string")))
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft[Column](lit(defaultBudget)) { case (els, (s, b)) =>
        when(stratum === s, lit(b)).otherwise(els)
      }
    val w = Window.partitionBy(stratum).orderBy(col("__h"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", h)
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .drop("__h")
  }

  /** Per-stratum deterministic downsample: keep a row iff its hash
    * bucket falls under the stratum's rate. Strata absent from `rates`
    * keep `defaultRate`. The salt is independent of [[datasetSplit]]'s
    * so sampling and splitting don't correlate. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0,
                       salt: String = "sample",
                       buckets: Int = 10000): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft[Column](lit(defaultRate)) { case (els, (s, r)) =>
        when(stratum === s, lit(r)).otherwise(els)
      }
    df.filter(hashBucket(id, salt, buckets) < round(rate * buckets))
  }

  /** UniMax language-balanced budget allocation (the published
    * alternative to temperature sampling for multilingual mixtures):
    * distribute a total token `budget` across groups (languages),
    * visiting groups in ASCENDING size order and giving each
    * min(epochCap · size, remaining budget ÷ remaining groups) —
    * small languages are capped at `epochCap` epochs (never oversampled
    * into repetition) and whatever they cannot absorb flows to the
    * larger languages' fair shares. The allocation is inherently
    * sequential in group order, so it runs as a driver loop over the
    * |groups|-row size aggregate (the mixtureEpochs/IVF-trainer rule:
    * plans stay distributed, human-sized model state may visit the
    * driver). All arithmetic is exact integers — fair shares use floor
    * division, ties in the size order break on the group name — so the
    * DuckDB oracle replays the loop as a RECURSIVE CTE bit-for-bit.
    *
    * Output: one row per group — (group, sz, alloc_tokens,
    * epochs_e6 = ⌊alloc·10⁶/sz⌋, exact while alloc < 2⁶³/10⁶ ≈ 9·10¹²
    * tokens per group; past that compute epochs unquantized).
    * Feed `alloc_tokens` to [[tokenBudgetSample]] (budgets per
    * stratum) to materialize the sampled corpus. */
  /** Temperature-scaled mixture allocation — the OTHER published
    * multilingual sampling rule (sampling probability ∝ p^(1/T)):
    * each group's share of the token `budget` is proportional to
    * sz^(1/T). Restricted to T = 2^sqrtSteps on purpose: x^(1/2) is
    * the ONE power IEEE 754 requires correctly rounded (hardware
    * sqrt — identical in Spark and DuckDB), so sz^(1/T) is
    * `sqrtSteps` nested sqrts, each deterministic, where a general
    * pow() would be libm-dependent. The weight is quantized
    * ⌊sqrt…(sz)·2²⁰+0.5⌋ BEFORE the normalizing sum, making the
    * allocation a_g = budget·q_g ÷ Σq exact integer arithmetic —
    * bit-reproducible in the oracle. T = 2 (one sqrt) is the common
    * published setting; `sqrtSteps = 2` gives T = 4.
    *
    * Fully declarative (unlike the inherently sequential
    * [[unimaxAllocation]]): one size aggregate, one broadcast total,
    * one projection. Exact while budget·q < 2⁶³ (q ≤ 2²⁰·√sz —
    * holds to ~8·10⁹ token budgets at million-token groups; past
    * that, rescale the quantization). Output: (group, sz, q,
    * alloc_tokens, epochs_e6). */
  def temperatureAllocation(df: DataFrame, group: String, size: Column,
                            budget: Long, sqrtSteps: Int = 1): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(sqrtSteps >= 1 && sqrtSteps <= 6, "need 1 <= sqrtSteps <= 6")
    val root = (1 to sqrtSteps).foldLeft(col("sz").cast("double"))(
      (c, _) => sqrt(c))
    val q = floor(root * (1L << 20) + 0.5).cast("long")
    val bySrc = df.groupBy(col(group)).agg(sum(size).cast("long").as("sz"))
      .withColumn("q", q)
    val total = bySrc.agg(sum(col("q")).cast("long").as("tq"))
    bySrc.crossJoin(broadcast(total))
      .select(col(group), col("sz"), col("q"),
        call_function("div", col("q") * budget, col("tq"))
          .as("alloc_tokens"))
      .withColumn("epochs_e6", call_function("div",
        col("alloc_tokens") * 1000000L, col("sz")))
  }

  def unimaxAllocation(df: DataFrame, group: String, size: Column,
                       budget: Long, epochCap: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(epochCap > 0, "epochCap must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col(group)).agg(sum(size).cast("long").as("sz"))
      .as[(String, Long)].collect()
      .sortBy { case (g, sz) => (sz, g) }
    var rem = budget
    val rows = sizes.zipWithIndex.map { case ((g, sz), i) =>
      require(sz > 0, s"unimaxAllocation: group '$g' has non-positive size")
      val cap = if (sz > Long.MaxValue / epochCap) Long.MaxValue
                else sz * epochCap
      val fair = rem / (sizes.length - i)
      val alloc = math.min(cap, fair)
      rem -= alloc
      (g, sz, alloc)
    }
    rows.toSeq.toDF(group, "sz", "alloc_tokens")
      .withColumn("epochs_e6", call_function("div",
        col("alloc_tokens") * 1000000L, col("sz")))
  }

  /** Weighted Bernoulli (Poisson/PPS) sampling with EXACT integer
    * thresholds — probability-proportional-to-size selection, the form
    * importance-weighted data selection takes at corpus scale (e.g.
    * sampling by DSIR weights or by token counts): row i is kept with
    * probability min(1, expectedRows·wᵢ/W), W = Σw, giving an expected
    * `expectedRows` kept rows with zero coordination — no global sort,
    * no sequential state, every row decides locally from its salted
    * md5 hash. The A-ES exponential-keys alternative (rank by
    * u^(1/w)) needs libm `pow`/`ln`, which differs across engines in
    * the last ulp; this form needs none: keep iff
    * h63·W < expectedRows·wᵢ·2⁶³, cross-multiplied in Decimal(38,0) —
    * exact while h63·W < 10³⁸, i.e. W up to ~10¹⁹ weight units — so
    * the DuckDB oracle replays the draw bit-for-bit in HUGEINT.
    * Weight-capped rows (expectedRows·wᵢ ≥ W) satisfy the predicate
    * for every h63 < 2⁶³, so the single comparison handles the
    * min(·,1) cap with no branch.
    *
    * Scale shape: one scalar aggregate for W broadcast back over the
    * corpus (the same broadcast-scalar shape as [[mixtureEpochs]]),
    * then a narrow filter. Changing `salt` redraws independently.
    * Output: kept rows + `w` (the long-cast weight). */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     expectedRows: Long,
                     salt: String = "wsample"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(expectedRows >= 0, "expectedRows must be >= 0")
    graft.functions.Md5Hash64Expr.register(df.sparkSession)
    val dec = DecimalType(38, 0)
    val tot = df.agg(sum(weight.cast("long")).cast(dec).as("__W"))
    val h63 = Dedup.md5Hash64(concat(lit(salt + "|"), id.cast("string")))
      .bitwiseAND(Long.MaxValue)
    df.withColumn("w", weight.cast("long"))
      .withColumn("__h63", h63)
      .crossJoin(broadcast(tot))
      .filter(col("__h63").cast(dec) * col("__W") <
        lit(expectedRows).cast(dec) * col("w").cast(dec) *
          lit("9223372036854775808").cast(dec))
      .drop("__h63", "__W")
  }
}
