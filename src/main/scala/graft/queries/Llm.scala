package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{Bpe, Chunking, Curation, Dedup, Multimodal, Sampling, Sessionize, Similarity, TextAnalysis, Unigram}

/** Oracle-checked queries for the LLM-data-pipeline operators
  * (BASELINE.json north star): dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard), similarity search, text analysis, sessionization,
  * multimodal byte plumbing. Every operator hashes with md5-derived
  * values shared by both engines, so every pipeline — including the
  * sketches (simhash, rolling fingerprint) and the LSH/IVF indexes —
  * is recomputed end-to-end by the DuckDB oracle.
  *
  * Fractional outputs are integerized with the cross-engine-exact
  * `floor(x·10^k + 0.5)` pattern (see Relational).
  *
  * int64-range assumption, every `CAST(sum(…) AS BIGINT)` below: DuckDB
  * sums into HUGEINT and the cast ERRORS LOUDLY past int64, where
  * Spark's non-ANSI sum would silently wrap — unreachable at any test
  * scale, and a loud oracle error beats a silent divergence.
  */
object Llm {
  import Relational.Q

  /** DuckDB expression for the ANN-LSH bucket of the double list `e`:
    * the exact planes Spark uses, rebuilt from their raw splitmix64
    * hashes (integer literal / Long.MaxValue — both engines round the
    * division identically, and list_dot_product folds left-to-right in
    * double just like the codegen'd DotProduct). */
  private def annBucketSql(numPlanes: Int, dim: Int): String = {
    val hs = graft.llm.Similarity.planeHashes(numPlanes, dim)
    (0 until numPlanes).map { p =>
      val plane = hs(p).map(h =>
        s"CAST($h AS DOUBLE)/9223372036854775807.0").mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(e, $plane) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB SQL recomputing the banded-hyperplane near-dup pipeline
    * end-to-end: splitmix64 plane hashes rebuilt IN SQL with exact
    * unsigned-64 HUGEINT arithmetic (verified bit-equal to
    * [[graft.llm.Similarity.planeHashes]]), planes assembled as
    * i-ordered lists (so `list_dot_product` folds left-to-right like
    * the codegen'd DotProduct), band keys from sign-of-dot-products,
    * candidates from the band equi-join, exact cosine rerank. At 256
    * planes this is ~2 KB of SQL versus ~1 MB of inlined literals
    * (the [[annBucketSql]] recipe), and DuckDB runs it 10× faster. */
  /** SQL mirror of [[graft.llm.Similarity.withPlantedDups]]: copies at
    * id+1000000 with the fixed ±4% per-index jitter (DuckDB lambda
    * index i is 1-based, Spark's is 0-based — hence (i-1) here).
    * Appended to a `FROM embeddings` select producing (vec_id, list). */
  private def plantedEmbSql(every: Int): String =
    if (every <= 0) "" else s"""
    |  UNION ALL SELECT vec_id + 1000000, list_transform(embedding,
    |    (x, i) -> CAST(x AS DOUBLE)
    |      * (1.0 + 0.02 * (CAST((i - 1) % 5 AS DOUBLE) - 2.0)))
    |  FROM embeddings WHERE vec_id % $every = 0""".stripMargin

  /** WITH-fragment rebuilding the splitmix64 hyperplanes in exact
    * HUGEINT arithmetic (bit-equal to
    * [[graft.llm.Similarity.planeHashes]]): CTEs `pi`…`s6` plus
    * `planes(p, pl)`. Shared by the near-dup gate row and the
    * semantic-decontamination row. */
  private def planesCteSql(nPlanes: Int, dim: Int, seed: Long): String = {
    // splitmix64 constants, split for overflow-free mod-2^64 multiply:
    // a*b mod 2^64 = ((a*b_hi mod 2^32)*2^32 + a*b_lo) mod 2^64, every
    // intermediate < 2^97 — inside HUGEINT's 128-bit range
    val A  = java.lang.Long.toUnsignedString(0x9E3779B97F4A7C15L)
    val c1 = 0xBF58476D1CE4E5B9L; val c2 = 0x94D049BB133111EBL
    val M64 = "18446744073709551616"
    s"""pi AS (SELECT p, i FROM range($nPlanes) t1(p), range($dim) t2(i)),
    |s0 AS (SELECT p, i, CAST($seed + p*1000003 + i AS HUGEINT) AS x FROM pi),
    |s1 AS (SELECT p, i, (x + $A) % $M64 AS x FROM s0),
    |s2 AS (SELECT p, i, xor(x, x // 1073741824) AS t FROM s1),
    |s3 AS (SELECT p, i, (((t * ${c1 >>> 32}) % 4294967296) * 4294967296
    |  + t * ${c1 & 0xFFFFFFFFL}) % $M64 AS x FROM s2),
    |s4 AS (SELECT p, i, xor(x, x // 134217728) AS t FROM s3),
    |s5 AS (SELECT p, i, (((t * ${c2 >>> 32}) % 4294967296) * 4294967296
    |  + t * ${c2 & 0xFFFFFFFFL}) % $M64 AS x FROM s4),
    |s6 AS (SELECT p, i, xor(x, x // 2147483648) AS x FROM s5),
    |planes AS MATERIALIZED (SELECT p,
    |  list(CAST(CAST(CASE WHEN x >= 9223372036854775808
    |      THEN x - $M64 ELSE x END AS BIGINT) AS DOUBLE)
    |    / 9223372036854775807.0 ORDER BY i) AS pl
    |  FROM s6 GROUP BY p)""".stripMargin
  }

  private def nearDupScaleSql(threshold: Double, bands: Int,
                              rowsPerBand: Int, dim: Int,
                              seed: Long = 42L,
                              plantedEvery: Int = 0): String = {
    val plantedUnion = plantedEmbSql(plantedEvery)
    s"""WITH ${planesCteSql(bands * rowsPerBand, dim, seed)},
    |emb AS MATERIALIZED (SELECT vec_id,
    |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings$plantedUnion),
    |pre AS MATERIALIZED (SELECT vec_id, e,
    |  sqrt(list_dot_product(e, e)) AS nrm FROM emb),
    |bk AS MATERIALIZED (SELECT vec_id, p // $rowsPerBand AS band,
    |  CAST(sum(CASE WHEN list_dot_product(e, pl) > 0
    |    THEN 1 << (p % $rowsPerBand) ELSE 0 END) AS BIGINT) AS key
    |  FROM emb, planes GROUP BY vec_id, band),
    |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
    |  FROM bk l JOIN bk r ON l.band = r.band AND l.key = r.key
    |    AND l.vec_id < r.vec_id),
    |sc AS (SELECT c.a, c.b,
    |  list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS score
    |  FROM cand c JOIN pre x ON x.vec_id = c.a
    |    JOIN pre y ON y.vec_id = c.b)
    |SELECT a, b, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6
    |FROM sc WHERE score >= $threshold ORDER BY a, b""".stripMargin
  }

  /** DuckDB SQL recomputing the cross-set semantic decontamination
    * end-to-end: the eval side is the planted jittered copies (the
    * same plant rule as [[plantedEmbSql]], standalone), both sides get
    * band keys from the shared [[planesCteSql]] planes, candidates
    * come from the cross-set (band, key) join, and contaminated train
    * vectors aggregate their reranked hits. */
  private def semanticDecontSql(threshold: Double, bands: Int,
                                rowsPerBand: Int, dim: Int,
                                seed: Long = 42L,
                                plantedEvery: Int = 20): String = {
    def bkSql(src: String) =
      s"""(SELECT vec_id, p // $rowsPerBand AS band,
      |  CAST(sum(CASE WHEN list_dot_product(e, pl) > 0
      |    THEN 1 << (p % $rowsPerBand) ELSE 0 END) AS BIGINT) AS key
      |  FROM $src, planes GROUP BY vec_id, band)""".stripMargin
    s"""WITH ${planesCteSql(bands * rowsPerBand, dim, seed)},
    |tr AS MATERIALIZED (SELECT vec_id,
    |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
    |ev AS MATERIALIZED (SELECT vec_id + 1000000 AS vec_id,
    |  list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)
    |    * (1.0 + 0.02 * (CAST((i - 1) % 5 AS DOUBLE) - 2.0))) AS e
    |  FROM embeddings WHERE vec_id % $plantedEvery = 0),
    |pt AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM tr),
    |pe AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM ev),
    |bkt AS ${bkSql("tr")},
    |bke AS ${bkSql("ev")},
    |cand AS (SELECT DISTINCT l.vec_id AS t, r.vec_id AS ev_id
    |  FROM bkt l JOIN bke r ON l.band = r.band AND l.key = r.key),
    |sc AS (SELECT c.t, c.ev_id,
    |  list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS score
    |  FROM cand c JOIN pt x ON x.vec_id = c.t
    |    JOIN pe y ON y.vec_id = c.ev_id)
    |SELECT t AS vec_id, count(*) AS n_eval_hits,
    |  CAST(floor(max(score) * 1000000 + 0.5) AS BIGINT) AS max_cos_e6
    |FROM sc WHERE score >= $threshold
    |GROUP BY t ORDER BY vec_id""".stripMargin
  }

  /** DuckDB SQL recomputing margin-based bitext mining end-to-end:
    * source = even vec_ids, target = odd vec_ids plus planted jittered
    * copies of every `plantedEvery`-th even vector at id+1000001 (odd,
    * so they land on the target side), shared [[planesCteSql]] planes,
    * cross-set (band, key) candidates, per-pair quantized cosine, two
    * k-NN rank windows, and the exact integer mean-of-means margin. */
  private def marginMiningSql(k: Int, thresholdE6: Long, bands: Int,
                              rowsPerBand: Int, dim: Int,
                              seed: Long = 42L,
                              plantedEvery: Int = 10): String = {
    def bkSql(src: String) =
      s"""(SELECT vec_id, p // $rowsPerBand AS band,
      |  CAST(sum(CASE WHEN list_dot_product(e, pl) > 0
      |    THEN 1 << (p % $rowsPerBand) ELSE 0 END) AS BIGINT) AS key
      |  FROM $src, planes GROUP BY vec_id, band)""".stripMargin
    s"""WITH ${planesCteSql(bands * rowsPerBand, dim, seed)},
    |se AS MATERIALIZED (SELECT vec_id,
    |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    |  FROM embeddings WHERE vec_id % 2 = 0),
    |te AS MATERIALIZED (SELECT vec_id,
    |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    |  FROM embeddings WHERE vec_id % 2 = 1
    |  UNION ALL SELECT vec_id + 1000001,
    |  list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)
    |    * (1.0 + 0.02 * (CAST((i - 1) % 5 AS DOUBLE) - 2.0)))
    |  FROM embeddings WHERE vec_id % $plantedEvery = 0),
    |pss AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM se),
    |pst AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM te),
    |bks AS ${bkSql("se")},
    |bkt AS ${bkSql("te")},
    |cand AS (SELECT DISTINCT l.vec_id AS s, r.vec_id AS t
    |  FROM bks l JOIN bkt r ON l.band = r.band AND l.key = r.key),
    |pos AS (SELECT * FROM (SELECT c.s, c.t,
    |  CAST(floor(list_dot_product(x.e, y.e) / (x.nrm * y.nrm)
    |    * 1000000 + 0.5) AS BIGINT) AS q
    |  FROM cand c JOIN pss x ON x.vec_id = c.s
    |    JOIN pst y ON y.vec_id = c.t) WHERE q > 0),
    |fwd AS (SELECT s, t, q FROM (SELECT s, t, q, row_number() OVER
    |  (PARTITION BY s ORDER BY q DESC, t) AS rn FROM pos) WHERE rn <= $k),
    |ss AS (SELECT s, CAST(count(*) AS BIGINT) AS n_s,
    |  CAST(sum(q) AS BIGINT) AS sum_s FROM fwd GROUP BY s),
    |bwd AS (SELECT s, t, q FROM (SELECT s, t, q, row_number() OVER
    |  (PARTITION BY t ORDER BY q DESC, s) AS rn FROM pos) WHERE rn <= $k),
    |st AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t,
    |  CAST(sum(q) AS BIGINT) AS sum_t FROM bwd GROUP BY t),
    |mg AS (SELECT f.s, f.t, f.q,
    |  (2 * f.q * ss.n_s * st.n_t * 1000000)
    |    // (ss.sum_s * st.n_t + st.sum_t * ss.n_s) AS margin_e6
    |  FROM fwd f JOIN ss ON ss.s = f.s JOIN st ON st.t = f.t)
    |SELECT s AS src_id, t AS tgt_id, q AS cos_e6, margin_e6 FROM
    |  (SELECT *, row_number() OVER (PARTITION BY s
    |    ORDER BY margin_e6 DESC, t) AS rk FROM mg)
    |WHERE rk = 1 AND margin_e6 >= $thresholdE6 ORDER BY src_id""".stripMargin
  }

  /** CTE chain replaying [[graft.llm.Chunking.contentDefinedChunks]]
    * over the rows of CTE `src` (doc_id, text): token positions, the
    * k-gram md5-64 ending at each position, the mod-`m` cut vote, the
    * strictly-before running cut count, and the per-chunk ordered
    * reassembly digest. Emits `<out>` = (doc_id, chunk_id,
    * n_chunk_tokens, chunk_md5); intermediate CTEs are prefixed
    * `<out>_`. Shared by the CDC profile and CDC-incremental rows. */
  private def cdcChunksCte(src: String, out: String, k: Int, m: Int): String =
    s"""${out}_tok AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p
    |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM $src)),
    |${out}_gr AS (SELECT doc_id, p, t[p] AS tok,
    |  array_to_string(t[greatest(p - ${k - 1}, 1):p], ' ') AS gram
    |  FROM ${out}_tok),
    |${out}_hs AS (SELECT doc_id, p, tok,
    |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
    |    * 4294967296 + lo AS hv
    |  FROM (SELECT doc_id, p, tok,
    |    ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hi,
    |    ('0x' || substr(md5(gram), 9, 8))::BIGINT AS lo FROM ${out}_gr)),
    |${out}_ch AS (SELECT doc_id, p, tok,
    |  coalesce(sum(CASE WHEN p >= $k AND ((hv % $m) + $m) % $m = 0
    |      THEN 1 ELSE 0 END)
    |    OVER (PARTITION BY doc_id ORDER BY p
    |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    |    AS chunk_id
    |  FROM ${out}_hs),
    |$out AS (SELECT doc_id, chunk_id,
    |  CAST(count(*) AS BIGINT) AS n_chunk_tokens,
    |  md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
    |  FROM ${out}_ch GROUP BY doc_id, chunk_id)""".stripMargin

  /** SQL CTE bodies mirroring the planting rules (markup on id mod
    * 3/4/5, PII on id mod 7/5/11, repetition on id mod 6) and SQL
    * expressions mirroring the strip/redact transforms — one source of
    * truth shared by the per-operator rows and the end-to-end
    * curation-pipeline row. Each `plant*Cte(from)` yields
    * `SELECT doc_id, <planted> AS text FROM from`. */
  private def plantMarkupCte(from: String): String =
    s"""SELECT doc_id,
    |  CASE WHEN doc_id % 5 = 0 THEN '<!-- header --><br/> ' ELSE '' END
    |  || CASE WHEN doc_id % 3 = 0
    |       THEN '<div class="doc"><p>' || text || '</p></div>'
    |       ELSE text END
    |  || CASE WHEN doc_id % 4 = 0
    |       THEN ' <a href="https://ex.am/p?q=1&amp;r=2">click &lt;here&gt;</a>'
    |       ELSE '' END AS text
    |  FROM $from""".stripMargin

  private def plantPiiCte(from: String): String =
    s"""SELECT doc_id, text
    |  || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
    |       || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
    |  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
    |       || CAST(doc_id % 256 AS VARCHAR) || '.0.'
    |       || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
    |  || CASE WHEN doc_id % 11 = 0 THEN ' call +1-415-555-'
    |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    |  AS text FROM $from""".stripMargin

  private def plantRepetitionCte(from: String): String =
    s"""SELECT doc_id, text || CASE WHEN doc_id % 6 = 0
    |    THEN repeat(' click here to win', 8) ELSE '' END AS text
    |  FROM $from""".stripMargin

  /** The [[graft.llm.TextAnalysis.stripMarkupText]] transform over the
    * SQL expression `inner`. */
  private def stripSqlExpr(inner: String): String =
    s"""trim(regexp_replace(
    |  replace(replace(replace(replace(replace(replace(
    |    regexp_replace(regexp_replace($inner, '<!--.*?-->', ' ', 'g'),
    |      '<[^<>]+>', ' ', 'g'),
    |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
    |    '&nbsp;', ' '), '&amp;', '&'),
    |  ' +', ' ', 'g'))""".stripMargin

  /** The [[graft.llm.TextAnalysis.redactText]] transform over the SQL
    * expression `inner`, built from the same [[graft.llm.TextAnalysis
    * .PiiPatterns]] literals the Spark side applies. */
  private def redactSqlExpr(inner: String): String =
    graft.llm.TextAnalysis.PiiPatterns.foldLeft(inner) {
      case (acc, (_, p, r)) => s"regexp_replace($acc, '$p', '$r', 'g')"
    }

  /** CTE chain recomputing the composite quality gate over a `src`
    * CTE of (doc_id, text): quality signals, 2-gram repetition, and
    * the reason bitmask, ending in `v` (doc_id, signals…, reasons).
    * Shared by the gate row and the per-source corpus report. */
  private val gateCtesSql: String =
    """q AS (SELECT doc_id,
    |  len(string_split(trim(text), ' ')) AS n_tokens,
    |  CAST(floor(10000.0 * len(list_distinct(string_split(trim(text), ' ')))
    |    / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS ttr_bp,
    |  CAST(floor(10000.0 * length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
    |    / length(text) + 0.5) AS BIGINT) AS punct_bp,
    |  CAST(floor(10000.0 * len(list_filter(string_split(trim(text), ' '),
    |      t -> lower(t) IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in',
    |        'is', 'it', 'that', 'for', 'on', 'with', 'as', 'at', 'by')))
    |    / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS stopword_bp,
    |  CAST(floor(100.0 * (length(text) - (len(string_split(trim(text), ' ')) - 1))
    |    / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS mean_tok_len_c
    |  FROM src),
    |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM src
    |  WHERE len(string_split(text, ' ')) >= 2),
    |g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
    |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
    |        FROM toks)),
    |pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
    |r AS (SELECT doc_id,
    |  CAST(floor(10000.0 * sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c)
    |    + 0.5) AS BIGINT) AS dup_gram_bp FROM pg GROUP BY doc_id),
    |j AS (SELECT q.*, coalesce(r.dup_gram_bp, 0) AS dup_gram_bp
    |  FROM q LEFT JOIN r USING (doc_id)),
    |v AS (SELECT *,
    |  CAST(CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END
    |   + CASE WHEN n_tokens > 1000 THEN 2 ELSE 0 END
    |   + CASE WHEN mean_tok_len_c < 300 OR mean_tok_len_c > 700 THEN 4 ELSE 0 END
    |   + CASE WHEN ttr_bp < 3000 THEN 8 ELSE 0 END
    |   + CASE WHEN dup_gram_bp > 2000 THEN 16 ELSE 0 END
    |   + CASE WHEN stopword_bp < 100 THEN 32 ELSE 0 END AS BIGINT) AS reasons
    |  FROM j)""".stripMargin

  /** DuckDB expression: per-centroid dot-product scores of the double
    * list `e` against the IVF coarse quantizer — same exact-literal
    * reconstruction as [[annBucketSql]]. */
  private def ivfScoresSql(nLists: Int, dim: Int): String = {
    val hs = graft.llm.Similarity.planeHashes(nLists, dim,
      graft.llm.Similarity.IvfSeed)
    (0 until nLists).map { c =>
      val cen = hs(c).map(h =>
        s"CAST($h AS DOUBLE)/9223372036854775807.0").mkString("[", ", ", "]")
      s"list_dot_product(e, $cen)"
    }.mkString("[", ", ", "]")
  }

  /** WITH-fragment replaying [[graft.llm.Similarity.trainIvfCentroids]]
    * in DuckDB, iteration by iteration: `c0` is the splitmix64 literal
    * init, then each round `t` is an assignment CTE (argmax dot over
    * the nLists-row centroid cross join — `row_number` ordered dot
    * DESC, list_id ASC matches Spark's first-max `array_position`) and
    * a recentre CTE running the trainer's EXACT arithmetic: integer
    * sums of 2⁻²⁰-quantized coordinates, one rounded IEEE divide.
    * Every step is order-independent, so the trained centroids match
    * Spark's bit-for-bit. Produces `c$iters(list_id, cen)`; callers
    * must provide an `emb(vec_id, e)` CTE. */
  private def trainedCentroidsSql(nLists: Int, dim: Int, iters: Int,
                                  src: String = "emb"): String = {
    val hs = graft.llm.Similarity.planeHashes(nLists, dim,
      graft.llm.Similarity.IvfSeed)
    val cens = (0 until nLists).map { c =>
      hs(c).map(h => s"CAST($h AS DOUBLE)/9223372036854775807.0")
        .mkString("[", ", ", "]")
    }.mkString("[", ",\n    ", "]")
    val iterSql = (1 to iters).map { t =>
      s"""a$t AS (SELECT vec_id, e, list_id FROM (
    SELECT $src.vec_id, $src.e, c.list_id, row_number() OVER (
      PARTITION BY $src.vec_id
      ORDER BY list_dot_product($src.e, c.cen) DESC, c.list_id) AS rn
    FROM $src CROSS JOIN c${t - 1} c) WHERE rn = 1),
  m$t AS (SELECT list_id, g.i AS i,
      CAST(sum(CAST(floor(e[g.i] * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / (count(*) * 1048576.0) AS m
    FROM a$t, (SELECT unnest(generate_series(1, $dim)) AS i) g
    GROUP BY list_id, g.i),
  c$t AS (SELECT p.list_id,
      list(CASE WHEN m.m IS NULL THEN p.cen[g.i] ELSE m.m END ORDER BY g.i) AS cen
    FROM c${t - 1} p
    CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS i) g
    LEFT JOIN m$t m ON m.list_id = p.list_id AND m.i = g.i
    GROUP BY p.list_id)"""
    }.mkString(",\n  ")
    s"""c0 AS (SELECT g.i - 1 AS list_id, cens[g.i] AS cen
    FROM (SELECT $cens AS cens),
      (SELECT unnest(generate_series(1, $nLists)) AS i) g),
  $iterSql"""
  }

  /** CTE stack replaying the PQ codebook trainer
    * ([[graft.llm.Similarity.trainPqCodebooks]]): pc0..pc{iters} are
    * per-round codebook states as (s, code, cen-list) rows — the
    * trainedCentroidsSql pattern with a subspace axis. Assignment
    * uses the L2 surrogate 2·x·c − |c|² with (DESC, code) tie-break;
    * recentring is the exact 2⁻²⁰-quantized integer-sum rule. */
  private def pqTrainSql(m: Int, k: Int, subDim: Int, iters: Int,
                         src: String): String = {
    val dim = m * subDim
    val lits = (0 until m).map { s =>
      graft.llm.Similarity.planeHashes(k, subDim,
        graft.llm.Similarity.IvfSeed + 1000L * s)
        .map(_.map(h => s"CAST($h AS DOUBLE)/9223372036854775807.0" +
          s" * sqrt(3.0/$dim.0)")
          .mkString("[", ", ", "]"))
        .mkString("[", ",\n      ", "]")
    }.mkString("[", ",\n    ", "]")
    val iterSql = (1 to iters).map { t =>
      s"""qa$t AS (SELECT vec_id, s, code FROM (
    SELECT e.vec_id, c.s, c.code, row_number() OVER (
      PARTITION BY e.vec_id, c.s
      ORDER BY 2 * list_dot_product(
          e.e[c.s * $subDim + 1 : c.s * $subDim + $subDim], c.cen)
        - list_dot_product(c.cen, c.cen) DESC, c.code) AS rn
    FROM $src e CROSS JOIN pc${t - 1} c) WHERE rn = 1),
  qm$t AS (SELECT a.s, a.code, g.i AS i,
      CAST(sum(CAST(floor(e.e[a.s * $subDim + g.i] * 1048576.0 + 0.5)
        AS BIGINT)) AS DOUBLE) / (count(*) * 1048576.0) AS mval
    FROM qa$t a JOIN $src e USING (vec_id),
         (SELECT unnest(generate_series(1, $subDim)) AS i) g
    GROUP BY a.s, a.code, g.i),
  pc$t AS (SELECT p.s, p.code,
      list(CASE WHEN m.mval IS NULL THEN p.cen[g.i] ELSE m.mval END
        ORDER BY g.i) AS cen
    FROM pc${t - 1} p
    CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS i) g
    LEFT JOIN qm$t m ON m.s = p.s AND m.code = p.code AND m.i = g.i
    GROUP BY p.s, p.code)"""
    }.mkString(",\n  ")
    s"""pcen0 AS (SELECT $lits AS a),
  pc0 AS (SELECT si.i - 1 AS s, ci.i - 1 AS code, p.a[si.i][ci.i] AS cen
    FROM pcen0 p,
      (SELECT unnest(generate_series(1, $m)) AS i) si,
      (SELECT unnest(generate_series(1, $k)) AS i) ci),
  $iterSql"""
  }

  /** CTE stack replaying `rounds` BPE training rounds (see
    * [[graft.llm.Bpe]]): `v0..v{rounds}` are vocabulary states with
    * U+0001-cell-encoded spellings (`chr(1)` builds the cells),
    * `m1..m{rounds}` the per-round argmax merge pairs. SQL `replace`
    * IS the greedy left-to-right BPE merge in both engines — matches
    * cannot straddle a cell boundary, and neither engine rescans
    * replaced output. */
  private def bpeTrainCtes(rounds: Int): String = {
    val rs = (1 to rounds).map { r =>
      s"""p$r AS (SELECT t[i] AS x, t[i+1] AS y, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT cnt, t, unnest(generate_series(1, len(t)-1)) AS i
          FROM (SELECT cnt, string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t
                FROM v${r - 1}) WHERE len(t) >= 2)
    GROUP BY x, y),
  m$r AS (SELECT x, y, c FROM p$r ORDER BY c DESC, x, y LIMIT 1),
  v$r AS (SELECT word, cnt, replace(s,
      (SELECT chr(1)||x||chr(1)||chr(1)||y||chr(1) FROM m$r),
      (SELECT chr(1)||x||y||chr(1) FROM m$r)) AS s FROM v${r - 1})"""
    }.mkString(",\n  ")
    s"""dw AS (SELECT w FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
      FROM documents) WHERE w <> '' AND NOT contains(w, chr(1))),
  v0 AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt,
      regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'gs') AS s
    FROM dw GROUP BY w),
  $rs"""
  }

  /** WITH-fragments for the hashed-feature classifier over relation
    * `src` (must expose doc_id, text): `w` = the md5-derived stand-in
    * (bucket → weight) model, `feats` = (doc_id, bucket) hashed
    * unigram+bigram features. Shared by `llm_quality_classifier` and
    * the classifier-gated curation row. */
  private def classifierCtesSql(src: String, width: Int): String =
    s"""w AS (SELECT b AS bucket,
    |  ('0x' || substr(md5('w|' || b), 1, 15))::BIGINT % 2000001
    |    - 1000000 AS w_e6
    |  FROM (SELECT unnest(generate_series(0, ${width - 1})) AS b)),
    |ctoks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
    |  FROM $src),
    |cuni AS (SELECT doc_id, 'u|' || tok AS feat
    |  FROM (SELECT doc_id, unnest(t) AS tok FROM ctoks)),
    |cbi AS (SELECT doc_id, 'b|' || array_to_string(t[i:i+1], ' ') AS feat
    |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
    |        FROM ctoks WHERE len(t) >= 2)),
    |feats AS (SELECT doc_id,
    |  ('0x' || substr(md5(feat), 1, 15))::BIGINT % $width AS bucket
    |  FROM (SELECT * FROM cuni UNION ALL SELECT * FROM cbi))""".stripMargin

  /** The trained-merge application chain for one cell-encoded word
    * expression: rounds 1..`rounds` applied in training order, each
    * merge pair pulled from its `m{r}` CTE by scalar subquery. */
  private def bpeMergeChainSql(rounds: Int, word: String): String =
    (1 to rounds).foldLeft(
      s"regexp_replace($word, '(.)', chr(1)||'\\1'||chr(1), 'gs')") {
      (acc, r) =>
        s"""replace($acc,
      (SELECT chr(1)||x||chr(1)||chr(1)||y||chr(1) FROM m$r),
      (SELECT chr(1)||x||y||chr(1) FROM m$r))"""
    }

  /** The full batch-curation oracle (plants → clean → gate → exact
    * min-id keeper → deterministic shuffle), shared VERBATIM by
    * `llm_curation_pipeline` and `llm_curation_streamed` — the streamed
    * row's whole point is that stream → reconcile → assembly must match
    * this exact SQL under any arrival order. */
  private lazy val curationPipelineSql: String =
    s"""WITH d0 AS (SELECT doc_id, text FROM documents
    |  UNION ALL SELECT doc_id + 924000, text FROM documents
    |  WHERE doc_id % 10 = 0),
    |pm AS (__PM__),
    |pp AS (__PP__),
    |pr AS (${plantRepetitionCte("pp")}),
    |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
    |${gateCtesSql},
    |kept AS (SELECT s.doc_id, md5(s.text) AS clean_md5
    |  FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0),
    |keepers AS (SELECT min(doc_id) AS doc_id FROM kept
    |  GROUP BY clean_md5),
    |surv AS (SELECT k.doc_id, k.clean_md5 FROM kept k
    |  JOIN keepers USING (doc_id)),
    |h AS (SELECT doc_id, clean_md5,
    |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
    |    * 4294967296 + lo AS order_key
    |  FROM (SELECT doc_id, clean_md5,
    |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
    |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
    |  FROM surv)),
    |sh AS (SELECT doc_id, clean_md5, order_key,
    |  ((order_key % 8) + 8) % 8 AS shard FROM h)
    |SELECT doc_id, clean_md5, order_key, shard,
    |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
    |    AS pos
    |FROM sh ORDER BY doc_id""".stripMargin
      .replace("__PM__", plantMarkupCte("d0"))
      .replace("__PP__", plantPiiCte("pm"))
      .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text")))

  /** The classifier-gated curation oracle: the SAME plants → clean →
    * gate scaffold as `curationPipelineSql`, with the hashed-feature
    * classifier (over the gate-kept CLEANED text) inserted before the
    * exact min-id keeper — the published two-stage filter shape,
    * replayed end-to-end. */
  private lazy val curationClassifiedSql: String =
    s"""WITH d0 AS (SELECT doc_id, text FROM documents
    |  UNION ALL SELECT doc_id + 924000, text FROM documents
    |  WHERE doc_id % 10 = 0),
    |pm AS (__PM__),
    |pp AS (__PP__),
    |pr AS (${plantRepetitionCte("pp")}),
    |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
    |${gateCtesSql},
    |${classifierCtesSql(
        "(SELECT s.doc_id, s.text FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0)",
        262144)},
    |clfkeep AS (SELECT feats.doc_id FROM feats JOIN w USING (bucket)
    |  GROUP BY feats.doc_id HAVING CAST(sum(w.w_e6) AS BIGINT) >= 0),
    |kept AS (SELECT s.doc_id, md5(s.text) AS clean_md5
    |  FROM src s JOIN v USING (doc_id) JOIN clfkeep USING (doc_id)
    |  WHERE v.reasons = 0),
    |keepers AS (SELECT min(doc_id) AS doc_id FROM kept
    |  GROUP BY clean_md5),
    |surv AS (SELECT k.doc_id, k.clean_md5 FROM kept k
    |  JOIN keepers USING (doc_id)),
    |h AS (SELECT doc_id, clean_md5,
    |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
    |    * 4294967296 + lo AS order_key
    |  FROM (SELECT doc_id, clean_md5,
    |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
    |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
    |  FROM surv)),
    |sh AS (SELECT doc_id, clean_md5, order_key,
    |  ((order_key % 8) + 8) % 8 AS shard FROM h)
    |SELECT doc_id, clean_md5, order_key, shard,
    |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
    |    AS pos
    |FROM sh ORDER BY doc_id""".stripMargin
      .replace("__PM__", plantMarkupCte("d0"))
      .replace("__PP__", plantPiiCte("pm"))
      .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text")))

  /** The full MinHash-LSH band-candidate oracle, shared VERBATIM by
    * `llm_dedup_minhash_lsh` (one-shot recompute) and
    * `llm_dedup_stream_pairs` (streamed index accumulation) — band
    * signatures are per-document, so the streamed union must equal
    * this full recompute exactly. */
  private lazy val minhashLshSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
    |  WHERE len(string_split(text, ' ')) >= 5),
    |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
    |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
    |        FROM toks)),
    |md AS (SELECT doc_id, md5('0|' || shingle) AS m0,
    |  md5('1|' || shingle) AS m1 FROM sh),
    |mh AS (SELECT doc_id,
    |  min(('0x' || substr(m0, 1, 8))::BIGINT) AS h0,
    |  min(('0x' || substr(m0, 9, 8))::BIGINT) AS h1,
    |  min(('0x' || substr(m0, 17, 8))::BIGINT) AS h2,
    |  min(('0x' || substr(m0, 25, 8))::BIGINT) AS h3,
    |  min(('0x' || substr(m1, 1, 8))::BIGINT) AS h4,
    |  min(('0x' || substr(m1, 9, 8))::BIGINT) AS h5,
    |  min(('0x' || substr(m1, 17, 8))::BIGINT) AS h6,
    |  min(('0x' || substr(m1, 25, 8))::BIGINT) AS h7
    |  FROM md GROUP BY doc_id),
    |bands AS (
    |  SELECT doc_id, 0 AS band,
    |    md5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS sig FROM mh
    |  UNION ALL SELECT doc_id, 1,
    |    md5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM mh
    |  UNION ALL SELECT doc_id, 2,
    |    md5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM mh
    |  UNION ALL SELECT doc_id, 3,
    |    md5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM mh)
    |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    |FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig
    |  AND l.doc_id < r.doc_id
    |ORDER BY a, b""".stripMargin

  /** Write each tranche as one parquet file into `srcDir` with STRICTLY
    * INCREASING, widely separated mtimes, so a single
    * `maxFilesPerTrigger = 1` AvailableNow run processes them as
    * separate micro-batches in EXACTLY this order (FileStreamSource
    * sorts its backlog by modification time; sub-second write
    * timestamps could otherwise tie). One stream start for N batches —
    * the per-run query/checkpoint startup cost is paid once. */
  private def streamedTranches(srcDir: String,
                               tranches: Seq[DataFrame]): Unit = {
    val stamped = scala.collection.mutable.Set.empty[String]
    // fixed base: only the ORDER of mtimes matters (FileStreamSource's
    // maxFileAge window is relative to the newest file seen, so an
    // absolute past epoch is safe), and a fixed base keeps reruns
    // byte-deterministic
    val t0 = 1600000000000L
    tranches.zipWithIndex.foreach { case (t, i) =>
      t.coalesce(1).write.mode("append").parquet(srcDir)
      new java.io.File(srcDir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".") && !stamped.contains(f.getName))
        .foreach { f =>
          f.setLastModified(t0 + i * 60000L); stamped += f.getName
        }
    }
  }

  /** Cache key for a scale-factor directory: basename PLUS a short
    * digest of the canonical absolute path AND of the directory's
    * content fingerprint (each file's relative path, size, mtime).
    * Two corpora sharing a directory name (sf0.1 under different
    * roots) can never serve each other's cached tranches or lakes,
    * and a REGENERATED corpus at the same path (new data, same name)
    * keys to a fresh cache instead of warm caches serving stale
    * tranches while the oracle reads the new bytes. */
  private val sfKeyMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // the memo is keyed on a CHEAP freshness probe (the directory's own
  // mtime + entry count) so a long-lived driver notices an in-place
  // corpus regeneration (files added/replaced bump the dir mtime or
  // count) without paying the full-tree walk per call; an exotic
  // regeneration that rewrites file CONTENTS in place with identical
  // names, counts and a preserved dir mtime would still serve the old
  // key within one driver - restart the driver (or clear the memo) in
  // that case. Across driver processes the full fingerprint always
  // decides.
  private[queries] def sfCacheKey(sfDir: String): String = {
    val d = new java.io.File(sfDir)
    val probe = s"$sfDir@${d.lastModified}:${Option(d.list()).fold(0)(_.length)}"
    sfKeyMemo.computeIfAbsent(probe, _ => sfCacheKeyUncached(sfDir))
  }

  // NOTE: the fingerprint is mtime-sensitive by design (the advisor's
  // stale-tranche hazard outweighs rebuild cost); orphaned key dirs
  // under /tmp accumulate until the OS tmp cleaner or a manual
  // rm -rf /tmp/graft-tranches reclaims them.
  private def sfCacheKeyUncached(sfDir: String): String = {
    val f = new java.io.File(sfDir).getCanonicalFile
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(f.getPath.getBytes("UTF-8"))
    def walk(d: java.io.File): Unit =
      Option(d.listFiles()).toSeq.flatten.sortBy(_.getName).foreach { c =>
        if (c.isDirectory) walk(c)
        else md.update(
          s"${c.getPath.stripPrefix(f.getPath)}:${c.length}:${c.lastModified}"
            .getBytes("UTF-8"))
      }
    walk(f)
    val h = md.digest().take(6).map("%02x".format(_)).mkString
    s"${f.getName}-$h"
  }

  /** Package-visible bridges so other registry files (V3Shape's
    * streamed CDC row) reuse the tranche cache + mtime stamping. */
  private[queries] def sharedTranchesFor(sfDir: String, key: String)
                                        (build: String => Unit): String =
    sharedTranches(sfDir, key)(build)
  private[queries] def writeTranches(srcDir: String,
                                     tranches: Seq[DataFrame]): Unit =
    streamedTranches(srcDir, tranches)
  private[queries] def streamTempRunFor(prefix: String)
                                       (body: String => DataFrame): DataFrame =
    streamTempRun(prefix)(body)

  /** Scope a narrow shuffle width around a streamed-row body: micro-
    * batches are admission-bounded small (maxFilesPerTrigger = 1 over
    * tranche files), so the session's corpus-sized
    * `spark.sql.shuffle.partitions` buys nothing per batch and costs
    * task-scheduling overhead × batches × stages — measured ~40% of
    * the streamed rows' wall-clock at sf0.1. Results are partition-
    * invariant (every streamed row ends in a keyed aggregate or a
    * total ORDER BY); a real deployment sizes the conf to its own
    * micro-batch admission the same way. Restores the previous value
    * even on failure. */
  private def withStreamShuffle[A](s: SparkSession, n: Int = 4)
                                  (body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Tranche-source cache for the streamed rows: every tranche set is
    * a DETERMINISTIC function of the sf directory (fixed splits of
    * driver-generated tables, fixed mtime stamps), yet each row used
    * to rebuild its sources inside the timed body — three coalesced
    * writes of setup cost per invocation that measure nothing about
    * the streaming pipeline. Built once per (sf, key) under
    * /tmp/graft-tranches and reused across rows, bench reps AND
    * driver runs; sinks/checkpoints stay per-run temp. Landing is
    * atomic (build in a hidden sibling, rename in; losers of a
    * concurrent race adopt the winner's dir), `_graft_done` marks a
    * complete build so interrupted ones rebuild. KEYS VERSION THE
    * CONTENT: change a tranche derivation → bump its key suffix, or a
    * warm cache will serve the old bytes. */
  private def sharedTranches(sfDir: String, key: String)
                            (build: String => Unit): String = {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    val root = new java.io.File(
      s"/tmp/graft-tranches/${sfCacheKey(sfDir)}")
    val dir = new java.io.File(root, key)
    if (new java.io.File(dir, "_graft_done").exists()) return dir.toString
    root.mkdirs()
    val tmp = java.nio.file.Files
      .createTempDirectory(root.toPath, s".$key-build").toFile
    build(tmp.toString)
    new java.io.File(tmp, "_graft_done").createNewFile()
    if (tmp.renameTo(dir)) dir.toString
    else if (new java.io.File(dir, "_graft_done").exists()) {
      deleteRec(tmp); dir.toString // concurrent winner — adopt theirs
    } else {
      deleteRec(dir) // markerless leftovers from an interrupted build
      if (tmp.renameTo(dir)) { dir.toString }
      else tmp.toString // last resort: correct, just uncached
    }
  }

  /** Run a temp-dir-backed streamed query body, snapshot the
    * (driver-small) result with an eager localCheckpoint, and delete
    * the whole temp tree: the streamed rows otherwise leave
    * corpus-sized source/sink/checkpoint dirs in the system temp dir
    * on EVERY invocation (bench reps included) — unbounded disk growth
    * across runs on a shared machine. The checkpoint keeps every stage
    * of the body eager inside the caller's timed region; only the
    * final result rows outlive the files. Callers apply their total
    * ORDER BY after the snapshot, so row order never depends on
    * checkpoint partitioning. */
  private def streamTempRun(prefix: String)(body: String => DataFrame): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory(prefix)
    try body(base.toString).localCheckpoint()
    finally {
      // the tree is per-run-unique and fully dead once the result is
      // checkpointed, so the O(files) physical delete runs on the
      // async purge worker instead of the caller (measured ~0.4 s of
      // deleteImpl samples inside streamed rows; guide §1.2). The
      // worker's shutdown hook keeps the no-garbage-on-exit guarantee.
      graft.fs.AsyncPurge.submit(() => {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(base)
        try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      })
    }
  }

  /** The exact unigram+bigram corpus-LM scoring CTEs (produce `us` with
    * (doc_id, n_tok, uni_score_e12) and `bs` with (doc_id,
    * bi_score_e6)), shared by `llm_text_lm_fluency` and
    * `llm_perplexity_buckets` — the bucket labels must be computed from
    * the SAME scores the fluency row grades. */
  private lazy val lmFluencyCtes: String =
    """u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
    |  FROM documents),
    |c1u AS (SELECT term, count(*) AS c1 FROM u GROUP BY term),
    |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS total FROM c1u),
    |us AS (SELECT doc_id,
    |    CAST(floor(CAST(sum(c1) AS DOUBLE) * 1000000000000.0
    |      / (count(*) * (SELECT total FROM tot)) + 0.5) AS BIGINT)
    |      AS uni_score_e12,
    |    count(*) AS n_tok
    |  FROM u JOIN c1u USING (term) GROUP BY doc_id),
    |btoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
    |  WHERE len(string_split(text, ' ')) >= 2),
    |b AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS shingle
    |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
    |        FROM btoks)),
    |c2b AS (SELECT shingle, count(*) AS c2 FROM b GROUP BY shingle),
    |bq AS (SELECT doc_id,
    |    CAST(floor(c2 * 1000000.0 / c1 + 0.5) AS BIGINT) AS q
    |  FROM b JOIN c2b USING (shingle)
    |  JOIN c1u ON c1u.term = split_part(b.shingle, ' ', 1)),
    |bs AS (SELECT doc_id,
    |    CAST(floor(CAST(sum(q) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
    |      AS bi_score_e6
    |  FROM bq GROUP BY doc_id)""".stripMargin

  /** DuckDB replay of the HLL distinct sketch (registers, harmonic
    * denominator, estimate — all exact integer arithmetic; trailing-
    * zero rank = bit_count((w & -w) - 1) + 1). Shared VERBATIM by
    * `llm_distinct_sketch` (one-pass batch) and
    * `llm_distinct_sketch_streamed` (per-batch partials max-merged at
    * assembly) — the merge-equals-single-pass guarantee is exactly
    * what sharing the SQL proves. */
  private lazy val distinctSketchSql: String =
    """WITH toks AS (SELECT lang,
    |  unnest(string_split(trim(text), ' ')) AS tok FROM documents),
    |h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
    |  FROM toks),
    |br AS (SELECT lang, h % 64 AS bucket,
    |  CASE WHEN h // 64 = 0 THEN 50
    |       ELSE least(bit_count(((h // 64) & -(h // 64)) - 1) + 1, 50)
    |  END AS rho FROM h),
    |mx AS (SELECT lang, bucket, max(rho) AS register
    |  FROM br GROUP BY 1, 2),
    |grid AS (SELECT lang, bucket
    |  FROM (SELECT DISTINCT lang FROM documents)
    |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bucket)),
    |regs AS (SELECT grid.lang, grid.bucket,
    |  coalesce(mx.register, 0) AS register
    |  FROM grid LEFT JOIN mx
    |    ON grid.lang = mx.lang AND grid.bucket = mx.bucket),
    |s AS (SELECT lang,
    |  CAST(sum(CAST(2 ** (50 - register) AS BIGINT)) AS BIGINT) AS s_sum
    |  FROM regs GROUP BY 1)
    |SELECT r.lang, CAST(r.bucket AS BIGINT) AS bucket,
    |  CAST(r.register AS BIGINT) AS register, s.s_sum,
    |  3271257763731268608 // s.s_sum AS est
    |FROM regs r JOIN s USING (lang) ORDER BY lang, bucket""".stripMargin

  /** The count-min oracle (registers + probed estimates), shared
    * VERBATIM by `llm_cms_counts` (single pass) and `llm_cms_streamed`
    * (per-batch partials sum-merged at assembly) — counts are
    * additive, so the streamed sink must equal this full recompute
    * exactly as long as every batch lands exactly once. */
  private lazy val cmsCountsSql: String =
    """WITH toks AS (SELECT unnest(string_split(trim(text), ' '))
    |    AS token FROM documents),
    |lanes AS (SELECT unnest(generate_series(0, 3)) AS lane),
    |hits AS (SELECT l.lane,
    |  ('0x' || substr(md5(t.token), 8 * l.lane + 1, 8))::BIGINT % 256
    |    AS bucket
    |  FROM toks t CROSS JOIN lanes l),
    |regs AS (SELECT lane, bucket, count(*) AS cnt
    |  FROM hits GROUP BY 1, 2),
    |exact AS (SELECT token, count(*) AS n FROM toks
    |  GROUP BY token ORDER BY n DESC, token LIMIT 25),
    |probes AS (SELECT e.token, e.n, l.lane,
    |  ('0x' || substr(md5(e.token), 8 * l.lane + 1, 8))::BIGINT % 256
    |    AS bucket
    |  FROM exact e CROSS JOIN lanes l)
    |SELECT p.token, p.n, CAST(min(r.cnt) AS BIGINT) AS cms_est
    |FROM probes p JOIN regs r USING (lane, bucket)
    |GROUP BY p.token, p.n ORDER BY p.n DESC, p.token""".stripMargin

  /** DuckDB SQL recomputing n-gram-Jaccard pairs + RECURSIVE min-label
    * connected components over `documents` — shared verbatim by
    * `llm_dedup_clusters` (driver union-find path) and
    * `llm_dedup_clusters_distributed` (label-propagation path): the
    * two engine paths must produce the SAME labels, so they grade
    * against the SAME oracle. */
  private val clustersCcSql: String =
    """WITH RECURSIVE
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
      |        FROM toks)),
      |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
      |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
      |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
      |  FROM sh a JOIN sh b USING (shingle)
      |  JOIN cand ON cand.a = a.doc_id AND cand.b = b.doc_id
      |  GROUP BY 1, 2),
      |jpairs AS (SELECT i.a, i.b FROM inter i
      |  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
      |  WHERE 1.0 * i.c / (sa.n + sb.n - i.c) >= 0.5),
      |nodes AS (SELECT a AS n FROM jpairs UNION SELECT b FROM jpairs),
      |dedges AS (SELECT a AS lo, b AS hi FROM jpairs
      |  UNION ALL SELECT b, a FROM jpairs),
      |cc(n, label) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT e.hi, cc.label FROM cc JOIN dedges e ON cc.n = e.lo
      |  WHERE cc.label < e.hi)
      |SELECT n AS doc_id, min(label) AS cluster FROM cc
      |GROUP BY n ORDER BY doc_id""".stripMargin

  /** DuckDB SQL recomputing BM25 end-to-end (inverted index, global
    * statistics, rational-constant scoring, per-query rank) — shared
    * verbatim by `llm_retrieval_bm25` (single-pass) and
    * `llm_retrieval_bm25_streamed` (index accumulated per micro-batch,
    * statistics derived at scoring time): the incremental index must
    * score EXACTLY like the batch one. */
  /** CTE chain replaying `rounds` prefix-doubling passes of
    * [[graft.llm.Dedup.suffixRanks]]: sr0 = vocabulary dense rank,
    * sr{k+1} = dense rank of (r(pos), coalesce(r(pos + 2^k), 0)). */
  private def suffixRanksSql(rounds: Int): String = {
    val steps = (0 until rounds).map { k =>
      val step = 1 << k
      s""",sr${k + 1} AS (SELECT a.doc_id, a.pos,
      |  CAST(dense_rank() OVER (ORDER BY a.r, coalesce(b.r, 0))
      |    AS BIGINT) AS r
      |  FROM sr$k a LEFT JOIN sr$k b
      |    ON b.doc_id = a.doc_id AND b.pos = a.pos + $step)""".stripMargin
    }.mkString("\n")
    s"""stoks AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
    |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
    |    FROM (SELECT doc_id, string_split(text, ' ') AS t
    |          FROM documents))),
    |sr0 AS (SELECT doc_id, pos,
    |  CAST(dense_rank() OVER (ORDER BY tok) AS BIGINT) AS r FROM stoks)
    |$steps""".stripMargin
  }

  /** Shared CTE prefix of the unigram-LM rows (`WITH RECURSIVE` added
    * by the caller): word frequencies → seed substring pieces (chars
    * always kept) → integer surprisal costs (object doc of
    * [[graft.llm.Unigram]]) → per-word DAG edges → Bellman-Ford
    * relaxation of the Viterbi DP → jitter-unique argmin per word. */
  private val unigramCtes: String =
    """wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) >= 1 GROUP BY word),
      |pos AS (SELECT word, i, l, substr(word, i, l) AS piece
      |  FROM wf
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
      |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS l)
      |  WHERE i + l - 1 <= length(word)),
      |pc AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT p.piece, w.freq FROM pos p JOIN wf w USING (word))
      |  GROUP BY piece
      |  HAVING CAST(sum(freq) AS BIGINT) >= 100 OR length(piece) = 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM pc),
      |cost AS (SELECT piece, cnt,
      |  CAST(length(bin(t)) - length(bin(cnt)) AS BIGINT) * 1048576
      |    + (('0x' || substr(md5(piece), 9, 8))::BIGINT & 1048575) AS c
      |  FROM pc, tot),
      |edges AS (SELECT p.word, p.i - 1 AS src, p.i + p.l - 1 AS dst,
      |    p.piece, c.c
      |  FROM pos p JOIN cost c USING (piece)),
      |dp(word, pos, cost, path) AS (
      |  SELECT word, 0, CAST(0 AS BIGINT), '' FROM wf
      |  UNION
      |  SELECT e.word, e.dst, d.cost + e.c, d.path || ';' || e.piece
      |  FROM dp d JOIN edges e ON e.word = d.word AND e.src = d.pos),
      |best AS (SELECT d.word, min(d.cost) AS cost,
      |    arg_min(d.path, d.cost) AS path
      |  FROM dp d JOIN wf w ON w.word = d.word AND d.pos = length(w.word)
      |  GROUP BY d.word)""".stripMargin

  /** 16 unrolled shift-and-square rounds of the fixed-point log₂
    * ([[graft.functions.Log2FixedExpr]]) over a CTE named `vals` with
    * columns (k, x) — emits g0..g16 and `lg` (k, q). The m² wrap is
    * HUGEINT here, unsigned-long in the JVM: identical bits. */
  private def log2ChainSql: String = {
    val steps = (1 to 16).map { i =>
      s""",g$i AS (SELECT k, bl,
      |  CASE WHEN CAST(m AS HUGEINT) * m >= 9223372036854775808
      |    THEN CAST(CAST(m AS HUGEINT) * m // 4294967296 AS BIGINT)
      |    ELSE CAST(CAST(m AS HUGEINT) * m // 2147483648 AS BIGINT)
      |    END AS m,
      |  fr * 2 + CASE WHEN CAST(m AS HUGEINT) * m
      |    >= 9223372036854775808 THEN 1 ELSE 0 END AS fr
      |  FROM g${i - 1})""".stripMargin
    }.mkString("\n")
    s"""g0 AS (SELECT k, CAST(length(bin(x)) AS BIGINT) AS bl,
    |  CASE WHEN length(bin(x)) <= 32
    |    THEN x * (CAST(1 AS BIGINT) << (32 - length(bin(x))))
    |    ELSE x >> (length(bin(x)) - 32) END AS m,
    |  CAST(0 AS BIGINT) AS fr FROM vals)
    |$steps
    |,lg AS (SELECT k, (bl - 1) * 65536 + fr AS q FROM g16)""".stripMargin
  }

  /** Shared CTE prefix of the Naive Bayes rows: planted-boilerplate
    * labels, hashed uni+bigram occurrences, dense per-bucket class
    * counts, totals/priors, and the log₂ chain over every value the
    * model needs. */
  /** corpus CTE body for [[nbCtes]]: must yield (doc_id, text, y). */
  private val nbPlantedCorpusSql: String =
    s"""SELECT doc_id,
    |  CASE WHEN doc_id % 3 = 0
    |    THEN '${graft.llm.Dedup.BoilerplateBanner} ' || text
    |    ELSE text END AS text,
    |  CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT)
    |    ELSE CAST(-1 AS BIGINT) END AS y
    |  FROM documents""".stripMargin

  private def nbCtes(width: Int,
                     corpusSql: String = nbPlantedCorpusSql): String =
    s"""corpus AS ($corpusSql),
    |ntoks AS (SELECT doc_id, y, string_split(trim(text), ' ') AS t
    |  FROM corpus),
    |nuni AS (SELECT doc_id, y, 'u|' || tok AS feat
    |  FROM (SELECT doc_id, y, unnest(t) AS tok FROM ntoks)),
    |nbi AS (SELECT doc_id, y, 'b|' || array_to_string(t[i:i+1], ' ') AS feat
    |  FROM (SELECT doc_id, y, t, unnest(generate_series(1, len(t)-1)) AS i
    |        FROM ntoks WHERE len(t) >= 2)),
    |occ AS (SELECT doc_id, y,
    |  ('0x' || substr(md5(feat), 1, 15))::BIGINT % $width AS bucket
    |  FROM (SELECT * FROM nuni UNION ALL SELECT * FROM nbi)),
    |cnts AS (SELECT b.bucket,
    |  COALESCE(SUM(CASE WHEN o.y = 1 THEN 1 ELSE 0 END), 0) AS cnt_pos,
    |  COALESCE(SUM(CASE WHEN o.y = -1 THEN 1 ELSE 0 END), 0) AS cnt_neg
    |  FROM (SELECT unnest(generate_series(0, ${width - 1})) AS bucket) b
    |  LEFT JOIN occ o USING (bucket) GROUP BY 1),
    |tots AS (SELECT CAST(sum(cnt_pos) AS BIGINT) AS tp,
    |  CAST(sum(cnt_neg) AS BIGINT) AS tn FROM cnts),
    |pri AS (SELECT CAST(count(*) FILTER (y = 1) AS BIGINT) AS np,
    |  CAST(count(*) FILTER (y = -1) AS BIGINT) AS nn FROM corpus),
    |vals AS (SELECT 'p|' || bucket AS k, cnt_pos + 1 AS x FROM cnts
    |  UNION ALL SELECT 'n|' || bucket, cnt_neg + 1 FROM cnts
    |  UNION ALL SELECT 'tp', tp + $width FROM tots
    |  UNION ALL SELECT 'tn', tn + $width FROM tots
    |  UNION ALL SELECT 'np', np FROM pri
    |  UNION ALL SELECT 'nn', nn FROM pri),
    |$log2ChainSql,
    |model AS (SELECT c.bucket, c.cnt_pos, c.cnt_neg,
    |  lp.q - ltp.q - ln.q + ltn.q AS w_q
    |  FROM cnts c
    |  JOIN lg lp ON lp.k = 'p|' || c.bucket
    |  JOIN lg ln ON ln.k = 'n|' || c.bucket
    |  CROSS JOIN (SELECT q FROM lg WHERE k = 'tp') ltp
    |  CROSS JOIN (SELECT q FROM lg WHERE k = 'tn') ltn)""".stripMargin

  private val bm25Sql: String =
    """WITH tf AS (SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
      |  FROM tf GROUP BY doc_id),
      |n AS (SELECT count(*) AS n FROM documents),
      |t AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM dl),
      |q AS (SELECT DISTINCT doc_id AS query_id, term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents WHERE doc_id % 100 = 0)),
      |sc AS (SELECT q.query_id, tf.doc_id,
      |  CAST(floor(((2*n.n - 2*dfq.df + 1) / (2*dfq.df + 1))
      |    * ((22*t.t*tf.tf) / (10*t.t*tf.tf + 3*t.t + 9*dl.dl*n.n))
      |    * 1000000 + 0.5) AS BIGINT) AS s_e6
      |  FROM tf JOIN q USING (term) JOIN dfq USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN t),
      |agg AS (SELECT query_id, doc_id, count(*) AS n_hit_terms,
      |  sum(s_e6) AS score_e6 FROM sc GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |  ORDER BY score_e6 DESC, doc_id) AS rank FROM agg)
      |SELECT query_id, doc_id, CAST(n_hit_terms AS BIGINT) AS n_hit_terms,
      |  CAST(score_e6 AS BIGINT) AS score_e6, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("llm_dedup_exact",
      ((s: SparkSession, d: String) =>
        Dedup.exact(Tables.documents(s, d), "text", "doc_id")
          .select(col("keep_id"), col("n_dupes"))
          .orderBy(col("keep_id"))): Q,
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    ("llm_dedup_minhash_lsh",
      ((s: SparkSession, d: String) =>
        Dedup.minhashLsh(Tables.documents(s, d), "text", "doc_id",
            shingleK = 5, numPerms = 8, bands = 4)
          .orderBy(col("a"), col("b"))): Q,
      Some(minhashLshSql)),

    // the STREAMED dedup index under the DuckDB oracle: three
    // micro-batches through dedupIndexStream (signatures computed once
    // per document, persisted, each batch's candidates joined against
    // the accumulated index), then the union of all per-batch pair
    // partitions — which must equal the FULL recompute, because band
    // signatures are per-document and every pair is emitted by the
    // batch of its later-arriving member. The oracle is
    // llm_dedup_minhash_lsh's SQL VERBATIM
    ("llm_dedup_stream_pairs",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        withStreamShuffle(s) { streamTempRun("graft-dedup-stream") { base =>
          val srcDir = sharedTranches(d, "docs-012-v1") { sd =>
            streamedTranches(sd,
              Seq(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
                docs.filter(pmod(col("doc_id"), lit(3)) === 1),
                docs.filter(pmod(col("doc_id"), lit(3)) === 2)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            docs.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.dedupIndexStream(src, "text",
            "doc_id", s"$base/index", s"$base/pairs", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          s.read.parquet(s"$base/pairs").select(col("a"), col("b"))
            .distinct()
        } }.orderBy(col("a"), col("b"))
      }): Q,
      Some(minhashLshSql)),

    // incremental dedup: the 20% "new batch" (doc_id ≡ 4 mod 5) joins
    // against the 80% existing signature index — the oracle is the
    // FULL recompute filtered to pairs touching the batch, which must
    // be identical because band signatures are per-document
    ("llm_dedup_minhash_incremental",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val oldSigs = Dedup.minhashSignatures(
          Dedup.shinglesFromToks(
            Dedup.tokenize(docs.filter(pmod(col("doc_id"), lit(5)) =!= 4),
              "text", "doc_id"), "doc_id", 5, dedup = false),
          "doc_id", numPerms = 8)
        Dedup.minhashLshIncremental(
            docs.filter(pmod(col("doc_id"), lit(5)) === 4), oldSigs,
            "text", "doc_id", shingleK = 5, numPerms = 8, bands = 4)
          .orderBy(col("a"), col("b"))
      }): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |md AS (SELECT doc_id, md5('0|' || shingle) AS m0,
        |  md5('1|' || shingle) AS m1 FROM sh),
        |mh AS (SELECT doc_id,
        |  min(('0x' || substr(m0, 1, 8))::BIGINT) AS h0,
        |  min(('0x' || substr(m0, 9, 8))::BIGINT) AS h1,
        |  min(('0x' || substr(m0, 17, 8))::BIGINT) AS h2,
        |  min(('0x' || substr(m0, 25, 8))::BIGINT) AS h3,
        |  min(('0x' || substr(m1, 1, 8))::BIGINT) AS h4,
        |  min(('0x' || substr(m1, 9, 8))::BIGINT) AS h5,
        |  min(('0x' || substr(m1, 17, 8))::BIGINT) AS h6,
        |  min(('0x' || substr(m1, 25, 8))::BIGINT) AS h7
        |  FROM md GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 0 AS band,
        |    md5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS sig FROM mh
        |  UNION ALL SELECT doc_id, 1,
        |    md5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM mh
        |  UNION ALL SELECT doc_id, 2,
        |    md5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM mh
        |  UNION ALL SELECT doc_id, 3,
        |    md5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM mh)
        |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        |FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig
        |  AND l.doc_id < r.doc_id
        |WHERE l.doc_id % 5 = 4 OR r.doc_id % 5 = 4
        |ORDER BY a, b""".stripMargin)),

    ("llm_dedup_ngram_jaccard",
      ((s: SparkSession, d: String) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "text", "doc_id",
            k = 5, maxDf = 5, minJaccard = 0.5)
          .orderBy(col("a"), col("b"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  JOIN cand ON cand.a = a.doc_id AND cand.b = b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b,
        |  CAST(floor(1.0 * i.c / (sa.n + sb.n - i.c) * 10000 + 0.5) AS BIGINT)
        |    AS jacc_bp
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.a
        |  JOIN sizes sb ON sb.doc_id = i.b
        |WHERE 1.0 * i.c / (sa.n + sb.n - i.c) >= 0.5
        |ORDER BY a, b""".stripMargin)),

    // link-graph centrality over the duplication-candidate graph:
    // damped PageRank in exact fixed-point integers (floor divisions
    // only), 5 power iterations replayed by a RECURSIVE CTE — the
    // crawl-curation "rank hosts before filtering" signal, here
    // ranking duplication hubs
    ("llm_graph_centrality",
      ((s: SparkSession, d: String) =>
        graft.ops.Graph.pageRank(
            graft.ops.Graph.symmetrize(
              Dedup.candidatePairs(Tables.documents(s, d), "text", "doc_id",
                k = 5, maxDf = 5)),
            iters = 5)
          .withColumnRenamed("node", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some("""WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
        |dedges AS (SELECT a AS src, b AS dst FROM cand
        |  UNION ALL SELECT b, a FROM cand),
        |nodes AS (SELECT DISTINCT src AS node FROM dedges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM dedges GROUP BY src),
        |pr(iter, node, r) AS (
        |  SELECT 0, node, 1000000000000 // (SELECT n FROM nn) FROM nodes
        |  UNION ALL
        |  SELECT x.iter + 1, x.dst,
        |    (3000000000000 // (20 * (SELECT n FROM nn))) + (17 * x.s) // 20
        |  FROM (SELECT p.iter AS iter, e.dst AS dst,
        |          SUM(p.r // d.deg) AS s
        |        FROM pr p JOIN deg d ON d.src = p.node
        |          JOIN dedges e ON e.src = p.node
        |        WHERE p.iter < 5 GROUP BY p.iter, e.dst) x)
        |SELECT p.node AS doc_id, d.deg AS deg, p.r AS r
        |FROM pr p JOIN deg d ON d.src = p.node
        |WHERE p.iter = 5 ORDER BY doc_id""".stripMargin)),

    // STREAM-STREAM interval join graded end-to-end: error-window and
    // click streams arrive as 3 worst-case-order tranches EACH, join
    // continuously via Streaming.intervalJoinStream (bucket-equality
    // state sharding + watermarked range), and the accumulated sink
    // grades against j6_interval_bucket_join's batch SQL VERBATIM
    // (lives here for the streamTempRun/streamedTranches helpers)
    ("j6_interval_join_streamed",
      ((s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        withStreamShuffle(s) { streamTempRun("graft-ij-stream") { base =>
          val intervals = ev.filter(col("event_type") === "error")
            .select(col("event_id").as("incident_id"),
              col("ts_us").as("i_us"))
          val points = ev.filter(col("event_type") === "click")
            .select(col("ts_us").as("p_us"),
              floor(col("value") * 100 + 0.5).cast("long").as("v_c"))
          val iDir = sharedTranches(d, "j6-intervals-v1") { sd =>
            streamedTranches(sd, (0 to 2).map(i =>
              intervals.filter(pmod(col("incident_id"), lit(3)) === (2 - i))))
          }
          val pDir = sharedTranches(d, "j6-points-v1") { sd =>
            streamedTranches(sd, (0 to 2).map(i =>
              points.filter(pmod(col("p_us"), lit(3)) === i)))
          }
          val iS = graft.streaming.Streaming.fileStream(s, iDir,
              intervals.schema, maxFilesPerTrigger = 1)
            .withColumn("i_ts", timestamp_micros(col("i_us")))
          val pS = graft.streaming.Streaming.fileStream(s, pDir,
              points.schema, maxFilesPerTrigger = 1)
            .withColumn("p_ts", timestamp_micros(col("p_us")))
          val joined = graft.streaming.Streaming.intervalJoinStream(
            pS, iS, "p_ts", "i_ts", lengthUs = 300000000L,
            lateness = "90 days")
          val q = joined.select(col("incident_id"), col("p_us"), col("v_c"))
            .writeStream.format("parquet")
            .option("path", s"$base/out")
            .option("checkpointLocation", s"$base/ck")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          s.read.parquet(s"$base/out")
            .groupBy(col("incident_id"))
            .agg(count(lit(1)).as("n_clicks"), sum(col("v_c")).as("sum_v_c"),
              min(col("p_us")).as("first_click_us"))
        } }.orderBy(col("incident_id"))
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

    // seeded (personalized) PageRank over the same candidate graph:
    // restart mass lands only on the even-id "trusted" nodes, scores
    // measure seed proximity (TrustRank); the oracle replays the
    // seeded recurrence in the same RECURSIVE CTE family
    ("llm_graph_trustrank",
      ((s: SparkSession, d: String) => {
        import s.implicits._
        val edges = graft.ops.Graph.symmetrize(
          Dedup.candidatePairs(Tables.documents(s, d), "text", "doc_id",
            k = 5, maxDf = 5))
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(pmod(col("node"), lit(2)) === 0)
        graft.ops.Graph.trustRank(edges, seeds, iters = 5)
          .withColumnRenamed("node", "doc_id")
          .orderBy(col("doc_id"))
      }): Q,
      Some("""WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
        |dedges AS (SELECT a AS src, b AS dst FROM cand
        |  UNION ALL SELECT b, a FROM cand),
        |nodes AS (SELECT DISTINCT src AS node FROM dedges),
        |seeds AS (SELECT node FROM nodes WHERE node % 2 = 0),
        |ns AS (SELECT count(*) AS n FROM seeds),
        |deg AS (SELECT src, count(*) AS deg FROM dedges GROUP BY src),
        |pr(iter, node, r) AS (
        |  SELECT 0, n.node,
        |    CASE WHEN s.node IS NOT NULL
        |      THEN 1000000000000 // (SELECT n FROM ns) ELSE 0 END
        |  FROM nodes n LEFT JOIN seeds s USING (node)
        |  UNION ALL
        |  SELECT x.iter + 1, x.node,
        |    CASE WHEN x.is_seed
        |      THEN 3000000000000 // (20 * (SELECT n FROM ns)) ELSE 0 END
        |    + (17 * x.s) // 20
        |  FROM (SELECT p.iter AS iter, e.dst AS node,
        |          max(CASE WHEN s2.node IS NOT NULL THEN 1 ELSE 0 END) = 1
        |            AS is_seed,
        |          SUM(p.r // d.deg) AS s
        |        FROM pr p JOIN deg d ON d.src = p.node
        |          JOIN dedges e ON e.src = p.node
        |          LEFT JOIN seeds s2 ON s2.node = e.dst
        |        WHERE p.iter < 5 GROUP BY p.iter, e.dst) x)
        |SELECT p.node AS doc_id, d.deg AS deg, p.r AS r
        |FROM pr p JOIN deg d ON d.src = p.node
        |WHERE p.iter = 5 ORDER BY doc_id""".stripMargin)),

    // asymmetric CONTAINMENT dedup over planted extended copies: every
    // 20th doc gains a doubled-length container whose Jaccard sits
    // near 1/3 (invisible to the 0.5 resemblance gate) while
    // containment(orig -> container) is exactly 1.0
    ("llm_dedup_containment",
      ((s: SparkSession, d: String) =>
        Dedup.containmentPairs(
            Dedup.withPlantedExtensions(
              Tables.documents(s, d).select(col("doc_id"), col("text")),
              "text", "doc_id", every = 20),
            "text", "doc_id", k = 5, maxDf = 5, minContainment = 0.9)
          .orderBy(col("a"), col("b"))): Q,
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |    text || ' ' || array_to_string(
        |      list_transform(
        |        generate_series(1, len(string_split(text, ' ')) + 5),
        |        i -> 'pad' || CAST(doc_id + 3000000 AS VARCHAR) || '_'
        |          || CAST(i AS VARCHAR)), ' ') AS text
        |  FROM documents WHERE doc_id % 20 = 0),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  JOIN cand ON cand.a = a.doc_id AND cand.b = b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b,
        |  CAST(floor(1.0 * i.c / sa.n * 10000 + 0.5) AS BIGINT) AS cont_a_bp,
        |  CAST(floor(1.0 * i.c / sb.n * 10000 + 0.5) AS BIGINT) AS cont_b_bp
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.a
        |  JOIN sizes sb ON sb.doc_id = i.b
        |WHERE greatest(1.0 * i.c / sa.n, 1.0 * i.c / sb.n) >= 0.9
        |ORDER BY a, b""".stripMargin)),

    ("llm_dedup_clusters",
      ((s: SparkSession, d: String) =>
        Dedup.duplicateClusters(
            Dedup.ngramJaccardPairs(Tables.documents(s, d), "text", "doc_id",
              k = 5, maxDf = 5, minJaccard = 0.5)
              .select(col("a"), col("b")))
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(clustersCcSql)),

    // the SAME clusters through the fleet-scale path: driverThreshold=0
    // forces the distributed min-label propagation loop (the route a
    // >1M-edge pair graph takes), graded against the identical
    // RECURSIVE-CC oracle — proving the two paths agree not just in
    // LlmSpec's fixture but on the full planted corpus
    ("llm_dedup_clusters_distributed",
      ((s: SparkSession, d: String) =>
        Dedup.duplicateClusters(
            Dedup.ngramJaccardPairs(Tables.documents(s, d), "text", "doc_id",
              k = 5, maxDf = 5, minJaccard = 0.5)
              .select(col("a"), col("b")),
            driverThreshold = 0L)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(clustersCcSql)),

    // fully SQL-checkable: the shingle hash is md5-derived (first 16
    // hex chars as two 32-bit halves), so DuckDB recomputes the entire
    // simhash → banding → hamming pipeline bit-for-bit
    ("llm_dedup_simhash",
      ((s: SparkSession, d: String) =>
        Dedup.simhashPairs(
            Dedup.simhash(Tables.documents(s, d), "text", "doc_id", k = 2),
            "doc_id", maxHamming = 7, bands = 8)
          .orderBy(col("a"), col("b"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
        |        FROM toks)),
        |hs AS (SELECT doc_id,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id,
        |        ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hi,
        |        ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS lo FROM sh)),
        |bits AS (SELECT doc_id, i,
        |  CASE WHEN sum(CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END) > 0
        |    THEN 1 ELSE 0 END AS bit
        |  FROM hs, (SELECT unnest(generate_series(0, 63)) AS i) g
        |  GROUP BY doc_id, i),
        |bands AS (SELECT doc_id, i // 8 AS band, sum(bit * (1 << (i % 8))) AS key
        |  FROM bits GROUP BY doc_id, band),
        |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        |  FROM bands l JOIN bands r
        |    ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
        |ham AS (SELECT c.a, c.b,
        |  CAST(sum(CASE WHEN x.bit != y.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |  FROM cand c JOIN bits x ON x.doc_id = c.a
        |    JOIN bits y ON y.doc_id = c.b AND y.i = x.i
        |  GROUP BY c.a, c.b)
        |SELECT a, b, hamming FROM ham WHERE hamming <= 7 ORDER BY a, b""".stripMargin)),

    ("llm_similarity_topk",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some("""WITH q AS (SELECT vec_id AS q_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings),
        |sc AS (SELECT q_id, vec_id, list_cosine_similarity(qe, ce) AS score
        |  FROM q, c WHERE vec_id != q_id),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    ("llm_embedding_neardup",
      ((s: SparkSession, d: String) =>
        Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id",
            "embedding", threshold = 0.45)
          .select(col("a"), col("b"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"))
          .orderBy(col("a"), col("b"))): Q,
      Some("""WITH c AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  CAST(floor(list_cosine_similarity(a.ce, b.ce) * 1000000 + 0.5)
        |    AS BIGINT) AS score_e6
        |FROM c a JOIN c b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.ce, b.ce) >= 0.45
        |ORDER BY a, b""".stripMargin)),

    // the 100 TB configuration of the same operator: a realistic dedup
    // threshold with 12-plane bands (4096 buckets/band — sized per the
    // scale model 2^rowsPerBand ≳ n for the 5k-row bench corpus;
    // candidates ≈ bands·n²/2^rowsPerBand, see Similarity.nearDupPairs
    // scaladoc + ScaleProbe for the measured lever). The
    // corpus has no natural pairs at cosine ≥ 0.8 (max observed pair
    // ≈ 0.51), so near-duplicates are PLANTED: every 20th vector gains
    // a deterministically jittered copy (withPlantedDups — the standard
    // planted-pair recall protocol), and the oracle recomputes the
    // plant + banding + rerank pipeline end-to-end in SQL — the row
    // proves the scale-safe config actually recovers pairs, not just
    // that two engines agree on an empty answer
    ("llm_embedding_neardup_scale",
      ((s: SparkSession, d: String) =>
        Similarity.nearDupPairs(
            Similarity.withPlantedDups(Tables.embeddings(s, d), "vec_id",
              "embedding", every = 20),
            "vec_id", "embedding", threshold = 0.8, bands = 32, rowsPerBand = 12)
          .select(col("a"), col("b"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"))
          .orderBy(col("a"), col("b"))): Q,
      Some(nearDupScaleSql(threshold = 0.8, bands = 32, rowsPerBand = 12,
        dim = 64, plantedEvery = 20))),

    // SemDeDup-style semantic dedup over the planted corpus: IVF
    // cluster assignment, within-cluster pairwise cosine, remove on a
    // lower-id match ≥ 0.95. Assignment, pair scores and the removal
    // verdict are all recomputed in SQL (centroids rebuilt from
    // splitmix literals like the IVF row); planted jittered copies
    // make the removed set non-empty.
    ("llm_dedup_semantic",
      ((s: SparkSession, d: String) =>
        Similarity.semDedup(
            Similarity.withPlantedDups(Tables.embeddings(s, d), "vec_id",
              "embedding", every = 20),
            "vec_id", "embedding", threshold = 0.95, nLists = 8)
          .select(col("vec_id"), col("list_id"), col("n_lower"), col("removed"),
            coalesce(floor(col("max_lower") * 1000000 + 0.5).cast("long"),
              lit(-1L)).as("max_lower_e6"))
          .orderBy(col("vec_id"))): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings${plantedEmbSql(20)}),
        |pre AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
        |  ${ivfScoresSql(nLists = 8, dim = 64)} AS cs FROM emb),
        |corp AS (SELECT vec_id, e, nrm,
        |  list_position(cs, list_max(cs)) - 1 AS list_id FROM pre),
        |pr AS (SELECT b.vec_id AS vec_id, count(*) AS n_lower,
        |    max(list_dot_product(a.e, b.e) / (a.nrm * b.nrm)) AS ms
        |  FROM corp a JOIN corp b
        |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  GROUP BY b.vec_id)
        |SELECT c.vec_id, c.list_id, coalesce(p.n_lower, 0) AS n_lower,
        |  coalesce(p.ms >= 0.95, false) AS removed,
        |  coalesce(CAST(floor(p.ms * 1000000 + 0.5) AS BIGINT), -1)
        |    AS max_lower_e6
        |FROM corp c LEFT JOIN pr p USING (vec_id)
        |ORDER BY c.vec_id""".stripMargin)),

    // fully SQL-checkable: the splitmix64 plane hashes are inlined as
    // integer literals and divided to doubles in SQL — identical IEEE
    // values both engines, so buckets and scores match bit-for-bit
    ("llm_similarity_ann_lsh",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.annTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, numPlanes = 4)
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |bk AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
        |  ${annBucketSql(numPlanes = 4, dim = 64)} AS bucket FROM emb),
        |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |  list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS score
        |  FROM bk q JOIN bk c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
        |  WHERE q.vec_id < 10),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // IVF-flat with deterministic centroids: assignment, probing and
    // rerank all recomputed in SQL from the same centroid literals
    ("llm_similarity_ivf",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2)
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |pre AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
        |  ${ivfScoresSql(nLists = 8, dim = 64)} AS cs FROM emb),
        |corp AS (SELECT vec_id, e, nrm,
        |  list_position(cs, list_max(cs)) - 1 AS list_id FROM pre),
        |qp AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn,
        |  i - 1 AS list_id, cs[i] AS c_score
        |  FROM pre, (SELECT unnest(generate_series(1, 8)) AS i) g
        |  WHERE vec_id < 10),
        |qr AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY c_score DESC, list_id) AS pr FROM qp),
        |sc AS (SELECT p.q_id, c.vec_id,
        |  list_dot_product(p.qe, c.e) / (p.qn * c.nrm) AS score
        |  FROM (SELECT * FROM qr WHERE pr <= 2) p
        |  JOIN corp c ON c.list_id = p.list_id AND c.vec_id != p.q_id),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // tokenizer fertility by language: the trained 6-merge BPE applied
    // with lang carried through the narrow projection, one keyed
    // aggregate, exact integral basis points. The oracle re-trains,
    // re-encodes and re-aggregates end-to-end
    ("llm_bpe_fertility",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Bpe.fertilityByGroup(docs, "text", "doc_id", "lang",
            Bpe.train(docs, "text", rounds = 6))
          .orderBy(col("lang"))
      }): Q,
      Some(s"""WITH ${bpeTrainCtes(6)},
  enc AS (SELECT doc_id, ${bpeMergeChainSql(6, "w")} AS s
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
          FROM documents) WHERE w <> '' AND NOT contains(w, chr(1))),
  fa AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
      CAST(sum(len(string_split(trim(e.s, chr(1)), chr(1)||chr(1))))
        AS BIGINT) AS n_bpe_tokens
    FROM enc e JOIN documents d USING (doc_id) GROUP BY d.lang)
  SELECT lang, n_words, n_bpe_tokens,
    CAST((n_bpe_tokens * 10000) // n_words AS BIGINT) AS fertility_bp
  FROM fa WHERE n_words > 0 ORDER BY lang""")),

    // hard-negative mining: per query, top-5 most-similar candidates
    // that are neither same-label nor near-duplicates (cosine >= 0.95
    // — a copy of the anchor is a positive in disguise, not a
    // negative). The corpus carries planted MISLABELED duplicates
    // (jittered copy, shifted label) so the dup guard is non-vacuous:
    // without the threshold filter the copy would top query 0's list.
    // Candidates via the same IVF probe join as llm_similarity_ivf
    ("llm_hard_negatives",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val planted = Similarity.withMislabeledDups(e, "vec_id",
          "embedding", "label", every = 20)
        Similarity.hardNegatives(planted,
            planted.filter(col("vec_id") < 10), "vec_id", "embedding",
            "label", k = 5, dupThreshold = 0.95, nLists = 8, nProbe = 2)
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH cemb AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000, (label + 1) % 10,
        |    list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)
        |      * (1.0 + 0.02 * (CAST((i - 1) % 5 AS DOUBLE) - 2.0)))
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |pre AS (SELECT vec_id, label, e,
        |  sqrt(list_dot_product(e, e)) AS nrm,
        |  ${ivfScoresSql(nLists = 8, dim = 64)} AS cs FROM cemb),
        |corp AS (SELECT vec_id, label, e, nrm,
        |  list_position(cs, list_max(cs)) - 1 AS list_id FROM pre),
        |qp AS (SELECT vec_id AS q_id, label AS q_label, e AS qe,
        |  nrm AS qn, i - 1 AS list_id, cs[i] AS c_score
        |  FROM pre, (SELECT unnest(generate_series(1, 8)) AS i) g
        |  WHERE vec_id < 10),
        |qr AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY c_score DESC, list_id) AS pr FROM qp),
        |sc AS (SELECT p.q_id, c.vec_id,
        |  list_dot_product(p.qe, c.e) / (p.qn * c.nrm) AS score
        |  FROM (SELECT * FROM qr WHERE pr <= 2) p
        |  JOIN corp c ON c.list_id = p.list_id AND c.vec_id != p.q_id
        |    AND c.label != p.q_label),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM sc WHERE score < 0.95)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // IVF-flat with TRAINED centroids: the oracle replays all five
    // Lloyd's rounds in SQL (exact quantized-integer recentre sums —
    // see trainedCentroidsSql), then the same probe/rerank as the
    // fixed-centroid row. The strongest form of the check: DuckDB
    // re-derives the trained index itself rather than trusting the
    // engine's training output. Training runs on a deterministic
    // BOUNDED sample (Similarity.trainSample: the 256 smallest-md5
    // ids — size-capped however large the corpus, a per-partition
    // top-n heap rather than a constant-fraction filter), mirrored
    // exactly in the oracle's training CTE
    // product-quantization codebook TRAINING: m=8 independent Lloyd's
    // runs over the subspaces (trained on the same sample), every round
    // replayed in SQL with the exact-integer recentring — the trained
    // artifact graded like the IVF/BPE/unigram/NB trainers
    ("llm_similarity_pq_train",
      ((s: SparkSession, d: String) => {
        import s.implicits._
        val cbs = Similarity.trainPqCodebooks(
          Similarity.trainSample(Tables.embeddings(s, d), "vec_id", 256),
          "embedding", m = 16, k = 16, iters = 3)
        cbs.zipWithIndex.flatMap { case (cb, sIdx) =>
          cb.zipWithIndex.flatMap { case (cen, code) =>
            cen.zipWithIndex.map { case (v, i) =>
              (sIdx.toLong, code.toLong, i.toLong,
                math.floor(v * 1048576.0 + 0.5).toLong)
            }
          }
        }.toSeq.toDF("s", "code", "i", "cen_q")
          .orderBy(col("s"), col("code"), col("i"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(e0, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END))
        |    AS e
        |  FROM (SELECT vec_id, e0, sqrt(list_dot_product(e0, e0)) AS n
        |    FROM (SELECT vec_id,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0
        |      FROM embeddings))),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${pqTrainSql(m = 16, k = 16, subDim = 4, iters = 3, src = "embt")}
        |SELECT p.s, p.code, CAST(g.i - 1 AS BIGINT) AS i,
        |  CAST(floor(p.cen[g.i] * 1048576.0 + 0.5) AS BIGINT) AS cen_q
        |FROM pc3 p,
        |  (SELECT unnest(generate_series(1, 4)) AS i) g
        |ORDER BY s, code, i""".stripMargin)),

    // ...and PQ/ADC retrieval: the corpus stored as 8 codes per
    // vector (32x compression), queries exact, scores = sums of
    // quantized LUT lookups — exact integer ranking, oracle-replayed
    // end-to-end (training included)
    ("llm_similarity_pq_topk",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val cbs = Similarity.trainPqCodebooks(
          Similarity.trainSample(e, "vec_id", 256),
          "embedding", m = 16, k = 16, iters = 3)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, cbs)
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(e0, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END))
        |    AS e
        |  FROM (SELECT vec_id, e0, sqrt(list_dot_product(e0, e0)) AS n
        |    FROM (SELECT vec_id,
        |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0
        |      FROM embeddings))),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${pqTrainSql(m = 16, k = 16, subDim = 4, iters = 3, src = "embt")},
        |codes AS (SELECT vec_id, s, code FROM (
        |  SELECT e.vec_id, c.s, c.code, row_number() OVER (
        |    PARTITION BY e.vec_id, c.s
        |    ORDER BY 2 * list_dot_product(e.e[c.s * 4 + 1 : c.s * 4 + 4],
        |        c.cen) - list_dot_product(c.cen, c.cen) DESC, c.code) AS rn
        |  FROM emb e CROSS JOIN pc3 c) WHERE rn = 1),
        |qlut AS (SELECT q.vec_id AS q_id, c.s, c.code,
        |  CAST(floor(list_dot_product(q.e[c.s * 4 + 1 : c.s * 4 + 4],
        |    c.cen) * 1048576.0 + 0.5) AS BIGINT) AS w
        |  FROM emb q CROSS JOIN pc3 c WHERE q.vec_id < 10),
        |sc AS (SELECT l.q_id, cd.vec_id, CAST(SUM(l.w) AS BIGINT)
        |    AS score_q
        |  FROM codes cd JOIN qlut l ON l.s = cd.s AND l.code = cd.code
        |  WHERE cd.vec_id <> l.q_id GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_q DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id, score_q, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin)),

    // IVFADC — the FAISS billion-scale default composed from the two
    // trained models: coarse IVF pruning to nProbe lists, then
    // PQ/ADC nibble-code scoring of only those candidates; BOTH
    // training replays plus assignment, probes and LUT ranking run in
    // one oracle query
    ("llm_similarity_ivfpq",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val samp = Similarity.trainSample(e, "vec_id", 256)
        val coarse = Similarity.trainIvfCentroids(samp, "embedding",
          nLists = 8, iters = 5)
        val cbs = Similarity.trainPqCodebooks(samp, "embedding",
          m = 16, k = 16, iters = 3)
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2,
            coarse, cbs)
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |embn AS (SELECT vec_id,
        |  list_transform(e, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END))
        |    AS en
        |  FROM (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS n
        |        FROM emb)),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |embtn AS (SELECT vec_id, en AS e FROM embn
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${trainedCentroidsSql(nLists = 8, dim = 64, iters = 5,
              src = "embt")},
        |  ${pqTrainSql(m = 16, k = 16, subDim = 4, iters = 3,
              src = "embtn")},
        |lists AS (SELECT emb.vec_id,
        |    list_position(cs, list_max(cs)) - 1 AS list_id
        |  FROM (SELECT emb.vec_id,
        |      list(list_dot_product(emb.e, c.cen) ORDER BY c.list_id) AS cs
        |    FROM emb CROSS JOIN c5 c GROUP BY emb.vec_id) emb),
        |codes AS (SELECT vec_id, s, code FROM (
        |  SELECT n.vec_id, c.s, c.code, row_number() OVER (
        |    PARTITION BY n.vec_id, c.s
        |    ORDER BY 2 * list_dot_product(n.en[c.s * 4 + 1 : c.s * 4 + 4],
        |        c.cen) - list_dot_product(c.cen, c.cen) DESC, c.code) AS rn
        |  FROM embn n CROSS JOIN pc3 c) WHERE rn = 1),
        |qp AS (SELECT e.vec_id AS q_id, c.list_id,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.e, c.cen) DESC, c.list_id) AS pr
        |  FROM emb e CROSS JOIN c5 c WHERE e.vec_id < 10),
        |qlut AS (SELECT n.vec_id AS q_id, c.s, c.code,
        |  CAST(floor(list_dot_product(n.en[c.s * 4 + 1 : c.s * 4 + 4],
        |    c.cen) * 1048576.0 + 0.5) AS BIGINT) AS w
        |  FROM embn n CROSS JOIN pc3 c WHERE n.vec_id < 10),
        |cand AS (SELECT p.q_id, l.vec_id
        |  FROM (SELECT * FROM qp WHERE pr <= 2) p
        |  JOIN lists l ON l.list_id = p.list_id AND l.vec_id <> p.q_id),
        |sc AS (SELECT ca.q_id, ca.vec_id,
        |    CAST(SUM(ql.w) AS BIGINT) AS score_q
        |  FROM cand ca JOIN codes cd ON cd.vec_id = ca.vec_id
        |  JOIN qlut ql ON ql.q_id = ca.q_id AND ql.s = cd.s
        |    AND ql.code = cd.code
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_q DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id, score_q, rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin)),

    // recall@k eval harness as a first-class query: the trained-IVF
    // index's per-query recall against the exact brute-force top-k,
    // in exact integer basis points — BOTH retrieval paths replay in
    // the oracle (training rounds included) and the recall join runs
    // on the two result sets, so the eval itself is graded, not just
    // the index
    ("llm_similarity_recall_eval",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val qs = e.filter(col("vec_id") < 10)
        val exact = Similarity.bruteForceTopK(e, qs, "vec_id",
          "embedding", k = 5)
        val cs = Similarity.trainIvfCentroids(
          Similarity.trainSample(e, "vec_id", 256), "embedding",
          nLists = 8, iters = 5)
        val approx = Similarity.ivfTopK(e, qs, "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 2, centroids = Some(cs))
        Similarity.recallAtK(approx, exact, "q_id", "vec_id")
          .orderBy(col("q_id"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${trainedCentroidsSql(nLists = 8, dim = 64, iters = 5,
            src = "embt")},
        |pre0 AS (SELECT emb.vec_id,
        |    list(list_dot_product(emb.e, c.cen) ORDER BY c.list_id) AS cs
        |  FROM emb CROSS JOIN c5 c GROUP BY emb.vec_id),
        |pre AS (SELECT emb.vec_id, emb.e,
        |    sqrt(list_dot_product(emb.e, emb.e)) AS nrm, p.cs
        |  FROM emb JOIN pre0 p USING (vec_id)),
        |corp AS (SELECT vec_id, e, nrm,
        |  list_position(cs, list_max(cs)) - 1 AS list_id FROM pre),
        |qp AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn,
        |  i - 1 AS list_id, cs[i] AS c_score
        |  FROM pre, (SELECT unnest(generate_series(1, 8)) AS i) g
        |  WHERE vec_id < 10),
        |qr AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY c_score DESC, list_id) AS pr FROM qp),
        |asc0 AS (SELECT p.q_id, c.vec_id,
        |  list_dot_product(p.qe, c.e) / (p.qn * c.nrm) AS score
        |  FROM (SELECT * FROM qr WHERE pr <= 2) p
        |  JOIN corp c ON c.list_id = p.list_id AND c.vec_id != p.q_id),
        |approx AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM asc0) WHERE rn <= 5),
        |bsc AS (SELECT q.vec_id AS q_id, c.vec_id,
        |    list_cosine_similarity(q.e, c.e) AS score
        |  FROM (SELECT * FROM emb WHERE vec_id < 10) q, emb c
        |  WHERE c.vec_id != q.vec_id),
        |exact AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM bsc) WHERE rn <= 5)
        |SELECT e.q_id, count(*) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 10000 // count(*) AS BIGINT) AS recall_bp
        |FROM exact e LEFT JOIN approx a
        |  ON a.q_id = e.q_id AND a.vec_id = e.vec_id
        |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin)),

    // recall@10 for flat PQ — the compression/recall tradeoff as a
    // GRADED row, not a spec comment: 32× code compression buys
    // imperfect ranking, and the honest number (measured ~0.375 at
    // sf0.01) sits under the oracle exactly like trained-IVF's does.
    // Same harness (recallAtK), approximate side = PQ/ADC retrieval,
    // exact side = brute force, both replayed end-to-end in SQL
    ("llm_similarity_recall_pq",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val qs = e.filter(col("vec_id") < 10)
        val exact = Similarity.bruteForceTopK(e, qs, "vec_id",
          "embedding", k = 10)
        val cbs = Similarity.trainPqCodebooks(
          Similarity.trainSample(e, "vec_id", 256),
          "embedding", m = 16, k = 16, iters = 3)
        val approx = Similarity.pqTopK(e, qs, "vec_id", "embedding",
          k = 10, cbs)
        Similarity.recallAtK(approx, exact, "q_id", "vec_id")
          .orderBy(col("q_id"))
      }): Q,
      Some(s"""WITH embr AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |emb AS (SELECT vec_id,
        |  list_transform(e, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END))
        |    AS e
        |  FROM (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS n
        |    FROM embr)),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${pqTrainSql(m = 16, k = 16, subDim = 4, iters = 3, src = "embt")},
        |codes AS (SELECT vec_id, s, code FROM (
        |  SELECT e.vec_id, c.s, c.code, row_number() OVER (
        |    PARTITION BY e.vec_id, c.s
        |    ORDER BY 2 * list_dot_product(e.e[c.s * 4 + 1 : c.s * 4 + 4],
        |        c.cen) - list_dot_product(c.cen, c.cen) DESC, c.code) AS rn
        |  FROM emb e CROSS JOIN pc3 c) WHERE rn = 1),
        |qlut AS (SELECT q.vec_id AS q_id, c.s, c.code,
        |  CAST(floor(list_dot_product(q.e[c.s * 4 + 1 : c.s * 4 + 4],
        |    c.cen) * 1048576.0 + 0.5) AS BIGINT) AS w
        |  FROM emb q CROSS JOIN pc3 c WHERE q.vec_id < 10),
        |sc AS (SELECT l.q_id, cd.vec_id, CAST(SUM(l.w) AS BIGINT)
        |    AS score_q
        |  FROM codes cd JOIN qlut l ON l.s = cd.s AND l.code = cd.code
        |  WHERE cd.vec_id <> l.q_id GROUP BY 1, 2),
        |approx AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score_q DESC, vec_id) AS rn
        |  FROM sc) WHERE rn <= 10),
        |bsc AS (SELECT q.vec_id AS q_id, c.vec_id,
        |    list_cosine_similarity(q.e, c.e) AS score
        |  FROM (SELECT * FROM embr WHERE vec_id < 10) q, embr c
        |  WHERE c.vec_id != q.vec_id),
        |exact AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM bsc) WHERE rn <= 10)
        |SELECT e.q_id, count(*) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 10000 // count(*) AS BIGINT) AS recall_bp
        |FROM exact e LEFT JOIN approx a
        |  ON a.q_id = e.q_id AND a.vec_id = e.vec_id
        |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin)),

    // recall@10 for IVFADC — the composed coarse-prune + PQ-rank
    // index graded against the same exact baseline: recall now folds
    // BOTH loss sources (lists the probe missed, codes ranked wrong),
    // the number the nProbe/compression budget actually buys
    ("llm_similarity_recall_ivfpq",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val qs = e.filter(col("vec_id") < 10)
        val exact = Similarity.bruteForceTopK(e, qs, "vec_id",
          "embedding", k = 10)
        val samp = Similarity.trainSample(e, "vec_id", 256)
        val coarse = Similarity.trainIvfCentroids(samp, "embedding",
          nLists = 8, iters = 5)
        val cbs = Similarity.trainPqCodebooks(samp, "embedding",
          m = 16, k = 16, iters = 3)
        val approx = Similarity.ivfPqTopK(e, qs, "vec_id", "embedding",
          k = 10, nLists = 8, nProbe = 2, coarse, cbs)
        Similarity.recallAtK(approx, exact, "q_id", "vec_id")
          .orderBy(col("q_id"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |embn AS (SELECT vec_id,
        |  list_transform(e, x -> x / (CASE WHEN n = 0 THEN 1.0 ELSE n END))
        |    AS en
        |  FROM (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS n
        |        FROM emb)),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |embtn AS (SELECT vec_id, en AS e FROM embn
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${trainedCentroidsSql(nLists = 8, dim = 64, iters = 5,
              src = "embt")},
        |  ${pqTrainSql(m = 16, k = 16, subDim = 4, iters = 3,
              src = "embtn")},
        |lists AS (SELECT emb.vec_id,
        |    list_position(cs, list_max(cs)) - 1 AS list_id
        |  FROM (SELECT emb.vec_id,
        |      list(list_dot_product(emb.e, c.cen) ORDER BY c.list_id) AS cs
        |    FROM emb CROSS JOIN c5 c GROUP BY emb.vec_id) emb),
        |codes AS (SELECT vec_id, s, code FROM (
        |  SELECT n.vec_id, c.s, c.code, row_number() OVER (
        |    PARTITION BY n.vec_id, c.s
        |    ORDER BY 2 * list_dot_product(n.en[c.s * 4 + 1 : c.s * 4 + 4],
        |        c.cen) - list_dot_product(c.cen, c.cen) DESC, c.code) AS rn
        |  FROM embn n CROSS JOIN pc3 c) WHERE rn = 1),
        |qp AS (SELECT e.vec_id AS q_id, c.list_id,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.e, c.cen) DESC, c.list_id) AS pr
        |  FROM emb e CROSS JOIN c5 c WHERE e.vec_id < 10),
        |qlut AS (SELECT n.vec_id AS q_id, c.s, c.code,
        |  CAST(floor(list_dot_product(n.en[c.s * 4 + 1 : c.s * 4 + 4],
        |    c.cen) * 1048576.0 + 0.5) AS BIGINT) AS w
        |  FROM embn n CROSS JOIN pc3 c WHERE n.vec_id < 10),
        |cand AS (SELECT p.q_id, l.vec_id
        |  FROM (SELECT * FROM qp WHERE pr <= 2) p
        |  JOIN lists l ON l.list_id = p.list_id AND l.vec_id <> p.q_id),
        |sc AS (SELECT ca.q_id, ca.vec_id,
        |    CAST(SUM(ql.w) AS BIGINT) AS score_q
        |  FROM cand ca JOIN codes cd ON cd.vec_id = ca.vec_id
        |  JOIN qlut ql ON ql.q_id = ca.q_id AND ql.s = cd.s
        |    AND ql.code = cd.code
        |  GROUP BY 1, 2),
        |approx AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score_q DESC, vec_id) AS rn
        |  FROM sc) WHERE rn <= 10),
        |bsc AS (SELECT q.vec_id AS q_id, c.vec_id,
        |    list_cosine_similarity(q.e, c.e) AS score
        |  FROM (SELECT * FROM emb WHERE vec_id < 10) q, emb c
        |  WHERE c.vec_id != q.vec_id),
        |exact AS (SELECT q_id, vec_id FROM (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM bsc) WHERE rn <= 10)
        |SELECT e.q_id, count(*) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 10000 // count(*) AS BIGINT) AS recall_bp
        |FROM exact e LEFT JOIN approx a
        |  ON a.q_id = e.q_id AND a.vec_id = e.vec_id
        |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin)),

    ("llm_similarity_ivf_trained",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val cs = Similarity.trainIvfCentroids(
          Similarity.trainSample(e, "vec_id", 256), "embedding",
          nLists = 8, iters = 5)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2,
            centroids = Some(cs))
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |embt AS (SELECT * FROM emb
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 256),
        |  ${trainedCentroidsSql(nLists = 8, dim = 64, iters = 5, src = "embt")},
        |pre0 AS (SELECT emb.vec_id,
        |    list(list_dot_product(emb.e, c.cen) ORDER BY c.list_id) AS cs
        |  FROM emb CROSS JOIN c5 c GROUP BY emb.vec_id),
        |pre AS (SELECT emb.vec_id, emb.e,
        |    sqrt(list_dot_product(emb.e, emb.e)) AS nrm, p.cs
        |  FROM emb JOIN pre0 p USING (vec_id)),
        |corp AS (SELECT vec_id, e, nrm,
        |  list_position(cs, list_max(cs)) - 1 AS list_id FROM pre),
        |qp AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn,
        |  i - 1 AS list_id, cs[i] AS c_score
        |  FROM pre, (SELECT unnest(generate_series(1, 8)) AS i) g
        |  WHERE vec_id < 10),
        |qr AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY c_score DESC, list_id) AS pr FROM qp),
        |sc AS (SELECT p.q_id, c.vec_id,
        |  list_dot_product(p.qe, c.e) / (p.qn * c.nrm) AS score
        |  FROM (SELECT * FROM qr WHERE pr <= 2) p
        |  JOIN corp c ON c.list_id = p.list_id AND c.vec_id != p.q_id),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // chunk→document mean-pooling: groups of 8 consecutive vectors
    // pool to one embedding; the quantized-integer recentre sum (the
    // IVF trainer's rule) makes the mean fold-order independent, so
    // the oracle matches bit-for-bit on the exploded (group, dim) rows
    // Johnson–Lindenstrauss projection to 8 dims through the shared
    // splitmix planes (rebuilt in SQL from integer literals); each
    // coordinate is one deterministic dot / sqrt(outDim), quantized
    // after the single float chain
    ("llm_embedding_project",
      ((s: SparkSession, d: String) =>
        Similarity.jlProject(Tables.embeddings(s, d), "vec_id",
            "embedding", outDim = 8, dim = 64)
          .select(col("vec_id"), col("p").cast("long").as("p"),
            col("coord_e6"))
          .orderBy(col("vec_id"), col("p"))): Q,
      Some(s"""WITH ${planesCteSql(8, 64, 42L)},
        |v AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings)
        |SELECT vec_id, p,
        |  CAST(floor(list_dot_product(e, pl) / sqrt(8.0 / 3.0) * 1000000
        |    + 0.5) AS BIGINT) AS coord_e6
        |FROM v, planes ORDER BY vec_id, p""".stripMargin)),

    // exact integer Gram matrix (the PCA/whitening/OPQ accumulation):
    // per-row products quantized to 2^-20 units BEFORE the sum, so
    // the corpus-wide accumulation is order-free integer addition
    ("llm_embedding_gram",
      ((s: SparkSession, d: String) =>
        Similarity.gramMatrix(Tables.embeddings(s, d), "embedding",
            dim = 64)
          .select(col("i").cast("long").as("i"),
            col("j").cast("long").as("j"), col("g_q"))
          .orderBy(col("i"), col("j"))): Q,
      Some("""WITH v AS (SELECT
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |x AS (SELECT e, unnest(generate_series(0, 63)) AS i FROM v),
        |y AS (SELECT e, i, unnest(generate_series(i, 63)) AS j FROM x)
        |SELECT i, j,
        |  CAST(sum(CAST(floor(e[i + 1] * e[j + 1] * 1048576 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS g_q
        |FROM y GROUP BY i, j ORDER BY i, j""".stripMargin)),

    ("llm_embedding_meanpool",
      ((s: SparkSession, d: String) =>
        Similarity.meanPoolEmbeddings(Tables.embeddings(s, d),
            (col("vec_id") / lit(8)).cast("long"), "embedding")
          .orderBy(col("group_id"), col("i"))): Q,
      Some("""WITH u AS (SELECT vec_id // 8 AS group_id, g.i - 1 AS i,
        |    CAST(embedding[g.i] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g)
        |SELECT group_id, i,
        |  CAST(floor(CAST(sum(CAST(floor(x * 1048576.0 + 0.5) AS BIGINT))
        |      AS DOUBLE) * 1000000000.0 / (count(*) * 1048576.0) + 0.5)
        |    AS BIGINT) AS mean_e9,
        |  count(*) AS n_chunks
        |FROM u GROUP BY group_id, i
        |ORDER BY group_id, i""".stripMargin)),

    // embedding hygiene gate over planted defects (NaN / +Inf /
    // all-zero — zeroing wins on overlap, same CASE order both
    // engines): every check an exact predicate, replayed verbatim
    ("llm_embedding_hygiene",
      ((s: SparkSession, d: String) =>
        Similarity.embeddingHygiene(
            Similarity.withPlantedBadVectors(Tables.embeddings(s, d),
              "vec_id", "embedding"),
            "vec_id", "embedding", expectedDim = 64)
          .orderBy(col("vec_id"))): Q,
      Some("""WITH p AS (SELECT vec_id,
        |  CASE WHEN vec_id % 41 = 0
        |         THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
        |       WHEN vec_id % 31 = 0
        |         THEN list_transform(embedding, (x, i) ->
        |           CASE WHEN i = 1 THEN 'nan'::FLOAT ELSE x END)
        |       WHEN vec_id % 37 = 0
        |         THEN list_transform(embedding, (x, i) ->
        |           CASE WHEN i = 1 THEN 'inf'::FLOAT ELSE x END)
        |       ELSE embedding END AS e
        |  FROM embeddings),
        |f AS (SELECT vec_id, len(e) AS n_dims,
        |  len(list_filter(e, x -> isnan(x))) > 0 AS has_nan,
        |  len(list_filter(e, x -> isinf(x))) > 0 AS has_inf,
        |  len(list_filter(e, x -> x <> CAST(0.0 AS FLOAT))) = 0 AS all_zero
        |  FROM p)
        |SELECT vec_id, n_dims, has_nan, has_inf, all_zero,
        |  (NOT has_nan AND NOT has_inf AND NOT all_zero AND n_dims = 64)
        |    AS ok
        |FROM f ORDER BY vec_id""".stripMargin)),

    // per-vector int8 quantization: scale and quantized checksums are
    // deterministic IEEE arithmetic, recomputed exactly in SQL
    ("llm_embedding_quantize",
      ((s: SparkSession, d: String) =>
        Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"),
            floor(col("scale") * 1000000000L + 0.5).cast("long").as("scale_e9"),
            aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
            aggregate(col("q"), lit(0L), (a, x) => a + abs(x.cast("long"))).as("q_l1"))
          .orderBy(col("vec_id"))): Q,
      Some("""WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM e),
        |q AS (SELECT vec_id, scale,
        |  CASE WHEN scale > 0
        |    THEN list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
        |    ELSE list_transform(e, x -> 0::BIGINT) END AS qv
        |  FROM s)
        |SELECT vec_id, CAST(floor(scale * 1000000000 + 0.5) AS BIGINT) AS scale_e9,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
        |FROM q ORDER BY vec_id""".stripMargin)),

    // retrieval over the int8 codes: scales cancel from the cosine, so
    // ranking is the integer cosine of code vectors — sums of small-int
    // products are exact in double, making the scorer cross-engine
    // exact for any fold order
    ("llm_similarity_quantized_topk",
      ((s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        Similarity.quantizedTopK(e, e.filter(col("vec_id") < 10),
            "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("vec_id"),
            floor(col("score") * 1000000 + 0.5).cast("long").as("score_e6"),
            col("rn"))
          .orderBy(col("q_id"), col("rn"))
      }): Q,
      Some("""WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM e),
        |q AS (SELECT vec_id, CASE WHEN scale > 0
        |  THEN list_transform(e, x -> CAST(CAST(floor(x / scale + 0.5) AS BIGINT) AS DOUBLE))
        |  ELSE list_transform(e, x -> 0.0) END AS qv FROM s),
        |n AS (SELECT vec_id, qv, sqrt(list_dot_product(qv, qv)) AS qn FROM q),
        |sc AS (SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
        |  list_dot_product(a.qv, b.qv) / (a.qn * b.qn) AS score
        |  FROM (SELECT * FROM n WHERE vec_id < 10) a
        |  JOIN n b ON b.vec_id != a.vec_id),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn FROM sc)
        |SELECT q_id, vec_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6, rn
        |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    ("llm_text_quality",
      ((s: SparkSession, d: String) =>
        TextAnalysis.qualityStats(Tables.documents(s, d), "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id,
        |len(string_split(trim(text), ' ')) AS n_tokens,
        |CAST(floor(10000.0 * len(list_distinct(string_split(trim(text), ' ')))
        |  / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS ttr_bp,
        |CAST(floor(10000.0 * length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
        |  / length(text) + 0.5) AS BIGINT) AS punct_bp,
        |CAST(floor(10000.0 * len(list_filter(string_split(trim(text), ' '),
        |    t -> lower(t) IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in',
        |      'is', 'it', 'that', 'for', 'on', 'with', 'as', 'at', 'by')))
        |  / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS stopword_bp,
        |CAST(floor(100.0 * (length(text) - (len(string_split(trim(text), ' ')) - 1))
        |  / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS mean_tok_len_c
        |FROM documents ORDER BY doc_id""".stripMargin)),

    ("llm_text_tokens",
      ((s: SparkSession, d: String) =>
        graft.ops.Ops.parallelizeInput(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
            TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish_tokens"))
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id,
        |len(string_split(trim(text), ' ')) AS n_ws_tokens,
        |len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |  AS n_bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    ("llm_text_langid",
      ((s: SparkSession, d: String) =>
        TextAnalysis.langId(Tables.documents(s, d), "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id,
        |len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS n_en,
        |len(regexp_extract_all(lower(text), '\b(der|die|das|und|nicht)\b')) AS n_de,
        |len(regexp_extract_all(lower(text), '\b(le|les|et|des|une)\b')) AS n_fr,
        |len(regexp_extract_all(lower(text), '\b(el|los|las|y|una)\b')) AS n_es,
        |CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
        |  WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
        |  WHEN n_fr >= n_es THEN 'fr' ELSE 'es' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin)),

    ("llm_text_fingerprint",
      ((s: SparkSession, d: String) =>
        graft.ops.Ops.parallelizeInput(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id,
        |md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |  ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // shift-tolerant rolling sketch: min md5-derived hash over 8-token
    // windows, recomputed exactly in SQL
    ("llm_text_rolling_fp",
      ((s: SparkSession, d: String) =>
        TextAnalysis.rollingMinFingerprint(Tables.documents(s, d),
            "text", "doc_id", k = 8)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS i
        |        FROM toks)),
        |hs AS (SELECT doc_id,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id,
        |        ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hi,
        |        ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS lo FROM sh))
        |SELECT doc_id, min(h) AS roll_fp FROM hs
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // mergeable HLL distinct sketch (custom TypedImperativeAggregate):
    // the oracle replays every register AND the estimate exactly —
    // trailing-zero rank is bit_count((w & -w) - 1) + 1, the harmonic
    // denominator is an exact long sum of powers of two, the estimate
    // one exact integer division by the hardcoded bias numerator
    ("llm_distinct_sketch",
      ((s: SparkSession, d: String) =>
        TextAnalysis.distinctTokenSketch(Tables.documents(s, d),
            "text", "lang", "doc_id")
          .orderBy(col("lang"), col("bucket"))): Q,
      Some(distinctSketchSql)),

    // the STREAMED sketch under the DuckDB oracle: three micro-batches
    // through sketchStream (each batch aggregates only its own rows
    // into 64 partial registers per group; the corpus is never
    // re-read), then the assembly-time max-merge — which must equal
    // the single-pass batch sketch because max-merge is associative,
    // commutative and idempotent. The oracle is llm_distinct_sketch's
    // SQL VERBATIM; batches split round-robin so every group spans
    // all three
    ("llm_distinct_sketch_streamed",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        withStreamShuffle(s) { streamTempRun("graft-sketch-stream") { base =>
          val srcDir = sharedTranches(d, "docs-012-v1") { sd =>
            streamedTranches(sd,
              Seq(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
                docs.filter(pmod(col("doc_id"), lit(3)) === 1),
                docs.filter(pmod(col("doc_id"), lit(3)) === 2)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            docs.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.sketchStream(src, "text",
            "lang", "doc_id", s"$base/regs", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          TextAnalysis.sketchFromRegisters(
            s.read.parquet(s"$base/regs").drop("batch_id", "src_batch"), "lang")
        } }.orderBy(col("lang"), col("bucket"))
      }): Q,
      Some(distinctSketchSql)),

    // PII detection + redaction over deterministically planted PII
    // (the synthetic corpus has no '@' or digits — the planted-pair
    // protocol keeps the row non-vacuous). Counts, redacted length and
    // redacted-text md5 are all recomputed end-to-end in SQL; the
    // regexes live in the RE2 ∩ java.util.regex common subset.
    ("llm_pii_redact",
      ((s: SparkSession, d: String) =>
        TextAnalysis.redactPii(
            TextAnalysis.withPlantedPii(Tables.documents(s, d), "text", "doc_id"),
            "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(raw"""WITH p AS (__PLANT__),
        |r AS (SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(text,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
        |  FROM p)
        |SELECT doc_id, n_email, n_ipv4, n_phone,
        |  length(red) AS redacted_len, md5(red) AS redacted_md5
        |FROM r ORDER BY doc_id""".stripMargin
        .replace("__PLANT__", plantPiiCte("documents")))),

    // corpus-level boilerplate removal (CCNet line-dedup at word-5-gram
    // granularity) over a planted repeated banner on every third doc.
    // The oracle recomputes gram hashing (the 64-bit md5 reconstruction
    // shared with simhash), document frequency, covered positions and
    // the cleaned-text md5 end-to-end.
    ("llm_boilerplate_ngrams",
      ((s: SparkSession, d: String) =>
        Dedup.removeBoilerplate(
            Dedup.withPlantedBoilerplate(Tables.documents(s, d), "text", "doc_id"),
            "text", "doc_id", k = 5, minDf = 50L)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH p AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN '${Dedup.BoilerplateBanner} ' || text ELSE text END AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM p),
        |g0 AS (SELECT doc_id, i AS s, md5(array_to_string(t[i:i+4], ' ')) AS m
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks WHERE len(t) >= 5)),
        |grams AS (SELECT doc_id, s,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS g
        |  FROM (SELECT doc_id, s,
        |        ('0x' || substr(m, 1, 8))::BIGINT AS hi,
        |        ('0x' || substr(m, 9, 8))::BIGINT AS lo FROM g0)),
        |freq AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
        |  GROUP BY g HAVING count(*) >= 50),
        |rem AS (SELECT DISTINCT doc_id, s + j AS pp
        |  FROM grams JOIN freq USING (g), range(5) r(j)),
        |pos AS (SELECT doc_id, i AS pp, t[i] AS tok
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        |        FROM toks)),
        |kept AS (SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(tok, ' ' ORDER BY pp)) AS cleaned_md5
        |  FROM pos ANTI JOIN rem USING (doc_id, pp) GROUP BY doc_id)
        |SELECT t.doc_id, len(t.t) AS n_tokens,
        |  len(t.t) - coalesce(k.n_kept, 0) AS n_removed,
        |  coalesce(k.cleaned_md5, md5('')) AS cleaned_md5
        |FROM toks t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin)),

    // line-WISE corpus dedup (whole exact lines in >= minDf docs
    // dropped, documents reassembled) over planted header/footer
    // chrome — the C4/RefinedWeb line-level stage at its native
    // granularity, vs the word-5-gram row above. The oracle replays
    // plant -> line split -> per-line doc frequency -> anti-join ->
    // position-ordered reassembly end-to-end (md5 line digests are
    // the cross-engine join key).
    ("llm_line_dedup",
      ((s: SparkSession, d: String) =>
        Dedup.lineDedup(
            Dedup.withPlantedLines(Tables.documents(s, d), "text", "doc_id"),
            "text", "doc_id", minDf = 20L)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH p AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN '${Dedup.LineHeader}' || chr(10)
        |      ELSE '' END || text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || '${Dedup.LineFooter}'
        |      ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
        |lines AS (SELECT doc_id, i AS pos, l[i] AS ln, md5(l[i]) AS k
        |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        |        FROM ls)),
        |freq AS (SELECT k FROM (SELECT DISTINCT doc_id, k FROM lines)
        |  GROUP BY k HAVING count(*) >= 20),
        |kept AS (SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(ln, chr(10) ORDER BY pos)) AS cleaned_md5
        |  FROM lines ANTI JOIN freq USING (k) GROUP BY doc_id)
        |SELECT s.doc_id, len(s.l) AS n_lines,
        |  len(s.l) - coalesce(k.n_kept, 0) AS n_removed,
        |  coalesce(k.cleaned_md5, md5('')) AS cleaned_md5
        |FROM ls s LEFT JOIN kept k USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin)),

    // deterministic dataset assembly: split assignment and stratified
    // sampling are salted-md5 bucket projections, so the oracle
    // recomputes the exact assignment (md5 is the cross-engine hash)
    ("llm_split_assign",
      ((s: SparkSession, d: String) =>
        Sampling.datasetSplit(Tables.documents(s, d), col("doc_id"),
            fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id,
        |CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 10000 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)),

    // exactly-k per stratum: fixed-size deterministic subsets (eval
    // sets, probes) — rank by salted md5 within each stratum, keep
    // rank <= k; the oracle rebuilds the signed-64 hash and the rank
    ("llm_take_per_stratum",
      ((s: SparkSession, d: String) =>
        Sampling.takePerStratum(
            Tables.events(s, d).select(col("event_id"), col("event_type")),
            col("event_id"), col("event_type"), k = 100)
          .orderBy(col("event_id"))): Q,
      Some("""WITH h AS (SELECT event_id, event_type,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS hk
        |  FROM (SELECT event_id, event_type,
        |    ('0x' || substr(md5('take|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('take|' || CAST(event_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM events))
        |SELECT event_id, event_type FROM (
        |  SELECT event_id, event_type, row_number() OVER
        |    (PARTITION BY event_type ORDER BY hk, event_id) AS rk FROM h)
        |WHERE rk <= 100 ORDER BY event_id""".stripMargin)),

    // weighted Bernoulli (PPS) sampling by document length: each row
    // keeps with probability min(1, n·w/W) decided locally from its
    // salted hash — the draw replayed in HUGEINT cross-multiplication
    ("llm_sample_weighted",
      ((s: SparkSession, d: String) =>
        Sampling.weightedSample(
            Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
            col("doc_id"), col("n_chars"), expectedRows = 200)
          .select(col("doc_id"), col("w"))
          .orderBy(col("doc_id"))): Q,
      Some("""WITH h AS (SELECT doc_id, n_chars,
        |  ((CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo) & 9223372036854775807 AS h63
        |  FROM (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM documents)),
        |t AS (SELECT CAST(sum(n_chars) AS HUGEINT) AS w_tot FROM documents)
        |SELECT doc_id, n_chars AS w FROM h, t
        |WHERE CAST(h63 AS HUGEINT) * w_tot
        |  < CAST(200 AS HUGEINT) * n_chars * CAST(9223372036854775808 AS HUGEINT)
        |ORDER BY doc_id""".stripMargin)),

    // corpus-LM fluency (CCNet-style quality axis): exact count-based
    // unigram + bigram-continuation scores; every divide runs on exact
    // integer operands so both engines round identically
    ("llm_text_lm_fluency",
      ((s: SparkSession, d: String) =>
        TextAnalysis.lmFluency(Tables.documents(s, d), "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH $lmFluencyCtes
        |SELECT us.doc_id, us.n_tok, us.uni_score_e12, bs.bi_score_e6
        |FROM us JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // interpolated Kneser-Ney bigram scoring — the smoothing family
    // the published LM filters actually run (CCNet's KenLM is KN),
    // d = 3/4 as an exact rational over a common denominator, each
    // bigram TYPE's log-prob = lq(num) - lq(den) in fixed-point
    // units; the oracle rebuilds the count tables and replays the
    // full 16-round log2 chain over num and den
    ("llm_text_kn_score",
      ((s: SparkSession, d: String) =>
        TextAnalysis.knBigramScore(Tables.documents(s, d), "text",
            "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH kt AS (SELECT doc_id, string_split(trim(text), ' ') AS t
        |  FROM documents WHERE len(string_split(trim(text), ' ')) >= 2),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 1)) AS i FROM kt)),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2),
        |kc1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS n1p
        |  FROM c12 GROUP BY 1),
        |n1c AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1c
        |  FROM c12 GROUP BY 1),
        |n1pp AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c12),
        |vals AS (
        |  SELECT 'n|' || CAST(length(c12.w1) AS VARCHAR) || ':'
        |      || c12.w1 || c12.w2 AS k,
        |    (4 * c12.c12 - 3) * n1pp.v + 3 * kc1.n1p * n1c.n1c AS x
        |  FROM c12 JOIN kc1 USING (w1) JOIN n1c USING (w2)
        |  CROSS JOIN n1pp
        |  UNION ALL
        |  SELECT 'd|' || w1, 4 * kc1.c1 * n1pp.v
        |  FROM kc1 CROSS JOIN n1pp),
        |$log2ChainSql,
        |wt AS (SELECT c12.w1, c12.w2, ln.q - ld.q AS wq
        |  FROM c12
        |  JOIN lg ln ON ln.k = 'n|' || CAST(length(c12.w1) AS VARCHAR)
        |    || ':' || c12.w1 || c12.w2
        |  JOIN lg ld ON ld.k = 'd|' || c12.w1)
        |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(wt.wq) AS BIGINT) AS kn_q
        |FROM bg JOIN wt ON wt.w1 = bg.w1 AND wt.w2 = bg.w2
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CCNet-style perplexity buckets: per-LANGUAGE rank by the exact
    // bigram fluency score, cut into head/middle/tail thirds (the
    // recipe trains on head+middle). Integer boundary comparisons
    // (rk*3 <= n) over the shared fluency CTEs — the oracle reproduces
    // every label exactly
    ("llm_perplexity_buckets",
      ((s: SparkSession, d: String) =>
        TextAnalysis.perplexityBuckets(Tables.documents(s, d), "text",
            "doc_id", stratum = "lang")
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH $lmFluencyCtes,
        |sc AS (SELECT us.doc_id, bs.bi_score_e6 FROM us
        |  JOIN bs USING (doc_id)),
        |j AS (SELECT d.doc_id, d.lang, sc.bi_score_e6 FROM documents d
        |  JOIN sc USING (doc_id)),
        |r AS (SELECT doc_id, lang, bi_score_e6,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY bi_score_e6 DESC, doc_id) AS BIGINT) AS rk,
        |  CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n FROM j)
        |SELECT doc_id, lang, bi_score_e6,
        |  CASE WHEN rk * 3 <= n THEN 'head'
        |       WHEN rk * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin)),

    // DSIR-style target-domain importance weights in exact rational
    // form: target = the src0 domain, corpus = all documents; per
    // token q = (c_t+1)(R+V)·2^20 / ((c_r+1)(T+V)) — exact long
    // products, exactly-rounded IEEE multiply+divide, exact long sum.
    // The oracle recomputes counts, the three scalars and every
    // quantized ratio identically
    ("llm_dsir_weights",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.targetDomainWeights(docs,
            docs.filter(col("source") === "src0"), "text", "doc_id")
          .orderBy(col("doc_id"))
      }): Q,
      Some("""WITH u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tt AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE source = 'src0'),
        |cr AS (SELECT term, count(*) AS c_r FROM u GROUP BY term),
        |ct AS (SELECT term, count(*) AS c_t FROM tt GROUP BY term),
        |tot AS (SELECT (SELECT count(*) FROM tt) AS t,
        |  (SELECT count(*) FROM u) AS r,
        |  (SELECT count(DISTINCT term) FROM
        |    (SELECT term FROM tt UNION SELECT term FROM u)) AS v),
        |q AS (SELECT u.doc_id,
        |  CAST(floor((coalesce(ct.c_t, 0) + 1) * (tot.r + tot.v)
        |      * 1048576.0 / ((cr.c_r + 1) * (tot.t + tot.v)) + 0.5)
        |    AS BIGINT) AS q
        |  FROM u JOIN cr USING (term) LEFT JOIN ct USING (term), tot)
        |SELECT doc_id, count(*) AS n_tok,
        |  CAST(floor(CAST(sum(q) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
        |    AS dsir_q20
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // leakage-safe split: assignment keyed by the duplicate CLUSTER's
    // min-id representative, so a near-dup pair can never straddle
    // train and test (doc-level hashing leaks such pairs ~2·p·(1−p) of
    // the time). Oracle recomputes the jaccard components RECURSIVEly
    // and the salted-md5 assignment over coalesce(cluster, doc_id)
    ("llm_split_leakage_safe",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val clusters = Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(docs, "text", "doc_id",
            k = 5, maxDf = 5, minJaccard = 0.5).select(col("a"), col("b")))
        Sampling.datasetSplitByCluster(docs, col("doc_id"), clusters,
            fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id"))
      }): Q,
      Some("""WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM toks)),
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM sh a JOIN dfreq USING (shingle) JOIN sh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND dfreq.df <= 5),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        |  FROM sh a JOIN sh b USING (shingle)
        |  JOIN cand ON cand.a = a.doc_id AND cand.b = b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (SELECT i.a, i.b FROM inter i
        |  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE 1.0 * i.c / (sa.n + sb.n - i.c) >= 0.5),
        |nodes AS (SELECT a AS n FROM jpairs UNION SELECT b FROM jpairs),
        |dedges AS (SELECT a AS lo, b AS hi FROM jpairs
        |  UNION ALL SELECT b, a FROM jpairs),
        |cc(n, label) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.hi, cc.label FROM cc JOIN dedges e ON cc.n = e.lo
        |  WHERE cc.label < e.hi),
        |labels AS (SELECT n AS doc_id, min(label) AS cluster FROM cc
        |  GROUP BY n)
        |SELECT doc_id,
        |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
        |    ELSE 'test' END AS split
        |FROM (SELECT d.doc_id,
        |  ('0x' || substr(md5('split|'
        |    || CAST(coalesce(l.cluster, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT
        |    % 10000 AS b
        |  FROM documents d LEFT JOIN labels l USING (doc_id))
        |ORDER BY doc_id""".stripMargin)),

    // benchmark decontamination: train docs sharing any word 8-gram
    // with the held-out test split. The split is the deterministic
    // salted-md5 assignment above, so the oracle recomputes split +
    // shingling + overlap end-to-end; 8-grams (not the published 13)
    // because the synthetic docs average ~54 tokens
    ("llm_decontaminate",
      ((s: SparkSession, d: String) => {
        val sp = Sampling.datasetSplit(Tables.documents(s, d), col("doc_id"),
          fractions = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        Dedup.decontaminate(sp.filter(col("split") === "train"),
            sp.filter(col("split") === "test"), "text", "doc_id", k = 8)
          .orderBy(col("doc_id"))
      }): Q,
      Some("""WITH sp AS (SELECT doc_id, text,
        |  CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM (SELECT doc_id, text,
        |    ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 10000 AS b FROM documents)),
        |toks AS (SELECT doc_id, split, string_split(text, ' ') AS t FROM sp
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (SELECT DISTINCT doc_id, split,
        |    array_to_string(t[i:i+7], ' ') AS shingle
        |  FROM (SELECT doc_id, split, t, unnest(generate_series(1, len(t)-7)) AS i
        |        FROM toks))
        |SELECT tr.doc_id,
        |  count(DISTINCT tr.shingle) AS n_hit_shingles,
        |  count(DISTINCT te.doc_id) AS n_bench_docs
        |FROM sh tr JOIN sh te ON tr.shingle = te.shingle
        |WHERE tr.split = 'train' AND te.split = 'test'
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin)),

    ("llm_sample_stratified",
      ((s: SparkSession, d: String) =>
        Sampling.stratifiedSample(Tables.events(s, d), col("event_id"),
            col("event_type"), rates = Map("purchase" -> 0.5),
            defaultRate = 0.1)
          .select(col("event_id"), col("event_type"))
          .orderBy(col("event_id"))): Q,
      Some("""SELECT event_id, event_type FROM (
        |  SELECT event_id, event_type,
        |    ('0x' || substr(md5('sample|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 10000 AS b
        |  FROM events)
        |WHERE b < CASE WHEN event_type = 'purchase' THEN 5000 ELSE 1000 END
        |ORDER BY event_id""".stripMargin)),

    // static mixture reweighting: per-source integer epoch counts from
    // target weights (upweight src0/src3, default share elsewhere),
    // then the exploded upsampled corpus. The one double product is
    // two exact-rounded IEEE ops, recomputed identically in SQL (the
    // literals are CAST to DOUBLE so DuckDB doesn't use DECIMAL).
    ("llm_mixture_upsample",
      ((s: SparkSession, d: String) =>
        Sampling.mixtureUpsample(
            Tables.documents(s, d).select("doc_id", "source", "n_chars"),
            "source", col("n_chars"),
            weights = Map("src0" -> 0.2, "src3" -> 0.1),
            defaultWeight = 0.04)
          .select(col("doc_id"), col("source"), col("epoch"))
          .orderBy(col("doc_id"), col("epoch"))): Q,
      Some("""WITH bysrc AS (SELECT source, sum(n_chars) AS src_size
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(src_size) AS total_size FROM bysrc),
        |plan AS (SELECT source, greatest(1, CAST(ceil(
        |    CASE WHEN source = 'src0' THEN CAST(0.2 AS DOUBLE)
        |      WHEN source = 'src3' THEN CAST(0.1 AS DOUBLE)
        |      ELSE CAST(0.04 AS DOUBLE) END
        |    * total_size / src_size) AS BIGINT)) AS epochs
        |  FROM bysrc, tot)
        |SELECT doc_id, source,
        |  unnest(generate_series(0, epochs - 1)) AS epoch
        |FROM documents JOIN plan USING (source)
        |ORDER BY doc_id, epoch""".stripMargin)),

    // exact heavy hitters: one map-side-combined aggregation, total
    // (count, token) tie-break so the top-k set is deterministic
    ("llm_heavy_hitters",
      ((s: SparkSession, d: String) =>
        TextAnalysis.topTokens(Tables.documents(s, d), "text", k = 25)
          .orderBy(col("n").desc, col("token"))): Q,
      Some("""SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 25""".stripMargin)),

    // count-min sketch estimates for the exact top-25: 4 lanes from
    // one md5 digest (the minhash lane reconstruction), width-256
    // registers, point estimate = min over lanes — every count exact
    // integer, so the oracle replays registers AND estimates verbatim
    ("llm_cms_counts",
      ((s: SparkSession, d: String) =>
        TextAnalysis.cmsTokenEstimates(Tables.documents(s, d), "text",
          width = 256, k = 25)): Q,
      Some(cmsCountsSql)),

    // the STREAMED count-min sketch: three micro-batches each land
    // their own exact partial registers in a batch_id= partition
    // (exactly-once is LOAD-BEARING for the SUM-merge, unlike the
    // HLL's idempotent max); assembly sum-merges the sink and probes —
    // graded against llm_cms_counts' SQL VERBATIM, the
    // merge-equals-single-pass guarantee made executable
    ("llm_cms_streamed",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        withStreamShuffle(s) { streamTempRun("graft-cms-stream") { base =>
          val srcDir = sharedTranches(d, "docs-012-v1") { sd =>
            streamedTranches(sd,
              Seq(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
                docs.filter(pmod(col("doc_id"), lit(3)) === 1),
                docs.filter(pmod(col("doc_id"), lit(3)) === 2)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            docs.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.cmsStream(src, "text",
            s"$base/regs", s"$base/ck", width = 256).start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          TextAnalysis.cmsFromRegisters(
            s.read.parquet(s"$base/regs").drop("batch_id", "src_batch"),
            docs, "text", width = 256, k = 25)
        } }.orderBy(col("n").desc, col("token"))
      }): Q,
      Some(cmsCountsSql)),

    // within-document repetition signals over word 2-grams: integer
    // counts plus two IEEE-exact basis-point ratios (same cents-trick
    // rounding as every other bp column)
    ("llm_text_repetition",
      ((s: SparkSession, d: String) =>
        TextAnalysis.repetitionSignals(Tables.documents(s, d), "text",
            "doc_id", k = 2)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
        |        FROM toks)),
        |pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(floor(10000.0 * sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c)
        |    + 0.5) AS BIGINT) AS dup_gram_bp,
        |  CAST(floor(10000.0 * max(c) / sum(c) + 0.5) AS BIGINT) AS top_gram_bp
        |FROM pg GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // TF-IDF salient terms, rational idf (N+1)/(df+1) so every step is
    // exact-rounded IEEE arithmetic the oracle reproduces bit-for-bit
    // (see TextAnalysis.tfidfTopTerms scaladoc for the ln caveat)
    ("llm_text_tfidf",
      ((s: SparkSession, d: String) =>
        TextAnalysis.tfidfTopTerms(Tables.documents(s, d), "text",
            "doc_id", k = 3)
          .orderBy(col("doc_id"), col("rank"))): Q,
      Some("""WITH tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |  tf * (n.n + 1) / (df + 1) AS score FROM tf JOIN dfq USING (term)
        |  CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY score DESC, term) AS rank FROM s)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // sample prep: overlapping token chunks (64-token windows, stride
    // 48) — the chunk itself is fingerprinted with md5 so the oracle
    // compares exact chunk CONTENT, not just counts
    ("llm_chunk_docs",
      ((s: SparkSession, d: String) =>
        Chunking.chunkDocuments(Tables.documents(s, d), "text", "doc_id",
            chunkTokens = 64, overlap = 16)
          .select(col("doc_id"), col("chunk_id"),
            size(col("chunk")).cast("long").as("n_chunk_tokens"),
            md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_id"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |n AS (SELECT doc_id, t, len(t) AS n FROM toks),
        |c AS (SELECT doc_id, t,
        |  unnest(generate_series(0, 1 + (greatest(n - 64, 0) + 47) // 48 - 1))
        |    AS chunk_id
        |  FROM n)
        |SELECT doc_id, chunk_id,
        |  CAST(len(t[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT)
        |    AS n_chunk_tokens,
        |  md5(array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' '))
        |    AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // sample prep: greedy in-order packing into 2048-token context
    // bins, sharded (8 shards) so the running sum stays partitioned at
    // scale; integer-exact so the oracle recomputes the assignment
    ("llm_pack_sequences",
      ((s: SparkSession, d: String) =>
        Chunking.packSequences(
            Tables.documents(s, d)
              .select(col("doc_id"),
                TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
                pmod(col("doc_id"), lit(8)).as("shard")),
            tokenCount = col("n_tokens"), budget = 2048L,
            order = Seq(col("doc_id")), shard = Seq(col("shard")))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
            col("cum_tokens"), col("bin"), col("bin_offset"))
          .orderBy(col("doc_id"))): Q,
      Some("""WITH n AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |  FROM n)
        |SELECT doc_id, shard, n_tokens, cum_tokens,
        |  CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum_tokens - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin)),

    // int64-range assumption: the oracle's CAST(sum(cents) AS BIGINT)
    // errors loudly in DuckDB if a session's cent sum ever exceeded
    // int64 (Spark's non-ANSI sum would silently wrap) — unreachable at
    // any test scale, and a loud error beats a silent divergence
    ("llm_sessionize",
      ((s: SparkSession, d: String) =>
        Sessionize.sessions(Tables.events(s, d), "user_id", "ts_us",
            order = Seq(col("ts_us"), col("event_id")),
            gapMicros = 1800000000L, valueCol = "value")
          .orderBy(col("user_id"), col("session_id"))): Q,
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |l AS (SELECT *, lag(ts_us) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
        |s AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
        |    THEN 1 ELSE 0 END) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM l)
        |SELECT user_id, session_id, min(ts_us) AS session_start_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    ("llm_multimodal_bytes",
      ((s: SparkSession, d: String) =>
        Multimodal.asBinary(Tables.documents(s, d), "text", "payload")
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("byte_len"),
            md5(col("payload")).as("content_md5"))
          .orderBy(col("doc_id"))): Q,
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // embedding-space corpus clustering: nearest-centroid assignment
    // (a narrow projection) + per-cluster stats (nLists-row aggregate
    // broadcast back); centroids rebuilt in SQL from the splitmix
    // literals like the IVF row
    ("llm_cluster_assign",
      ((s: SparkSession, d: String) =>
        Similarity.clusterStats(Tables.embeddings(s, d), "vec_id",
            "embedding", nLists = 8)
          .select(col("vec_id"), col("list_id"),
            floor(col("c_score") * 1000000 + 0.5).cast("long").as("c_score_e6"),
            col("cluster_n"), col("cluster_min_id"))
          .orderBy(col("vec_id"))): Q,
      Some(s"""WITH emb AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |pre AS (SELECT vec_id, ${ivfScoresSql(nLists = 8, dim = 64)} AS cs
        |  FROM emb),
        |corp AS (SELECT vec_id, list_position(cs, list_max(cs)) - 1 AS list_id,
        |  list_max(cs) AS c_score FROM pre),
        |st AS (SELECT list_id, count(*) AS cluster_n,
        |  min(vec_id) AS cluster_min_id FROM corp GROUP BY list_id)
        |SELECT vec_id, list_id,
        |  CAST(floor(c_score * 1000000 + 0.5) AS BIGINT) AS c_score_e6,
        |  cluster_n, cluster_min_id
        |FROM corp JOIN st USING (list_id) ORDER BY vec_id""".stripMargin)),

    // markup stripping over planted id-derived HTML (the synthetic
    // corpus has no '<'): comments → tags → entity decode (&amp; last)
    // → whitespace collapse, cleaned bytes md5-verified end-to-end
    ("llm_strip_markup",
      ((s: SparkSession, d: String) =>
        TextAnalysis.stripMarkup(
            TextAnalysis.withPlantedMarkup(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      // the plant/strip fragments are spliced AFTER stripMargin — their
      // multi-line bodies contain `||` continuations that stripMargin
      // would otherwise eat as margin characters
      Some("""WITH p AS (__PLANT__),
        |c AS (SELECT doc_id, text, __STRIP__ AS clean FROM p)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '<[^<>]+>')) AS BIGINT) AS n_tags,
        |  CAST(length(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin
        .replace("__PLANT__", plantMarkupCte("documents"))
        .replace("__STRIP__", stripSqlExpr("text")))),

    // composite C4/Gopher quality gate over planted generation-loop
    // repetition: every signal integer-exact, the verdict a bitmask
    // both engines compute from the same basis points
    ("llm_quality_gate",
      ((s: SparkSession, d: String) =>
        TextAnalysis.qualityGate(
            TextAnalysis.withPlantedRepetition(Tables.documents(s, d), "text",
              "doc_id", every = 6),
            "text", "doc_id", k = 2)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH src AS (${plantRepetitionCte("documents")}),
        |${gateCtesSql}
        |SELECT doc_id, n_tokens, ttr_bp, punct_bp, stopword_bp, mean_tok_len_c,
        |  dup_gram_bp, reasons, reasons = 0 AS keep
        |FROM v ORDER BY doc_id""".stripMargin)),

    // model-based quality filter: hashed unigram+bigram features,
    // broadcast (bucket -> weight) model, exact integer logit sums.
    // The stand-in weights are md5-derived so the oracle replays
    // hashing, lookup and scores verbatim — trained weights would be
    // exactly as replayable (the model is data, not code)
    ("llm_quality_classifier",
      ((s: SparkSession, d: String) =>
        TextAnalysis.classifierScore(Tables.documents(s, d), "text",
            "doc_id", TextAnalysis.standInWeights(s, 262144), 262144)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH ${classifierCtesSql("documents", 262144)}
        |SELECT feats.doc_id, count(*) AS n_feats,
        |  CAST(sum(w.w_e6) AS BIGINT) AS logit_e6,
        |  CAST(sum(w.w_e6) AS BIGINT) >= 0 AS keep
        |FROM feats JOIN w USING (bucket)
        |GROUP BY feats.doc_id ORDER BY feats.doc_id""".stripMargin)),

    // supervised Naive Bayes TRAINING under the oracle: planted
    // boilerplate labels, hashed uni+bigram class counts, and
    // log-likelihood-ratio weights from the fixed-point integer log2
    // (16 shift-and-square rounds, replayed as a generated CTE chain)
    ("llm_nb_train",
      ((s: SparkSession, d: String) =>
        TextAnalysis.naiveBayesModel(
            Dedup.withPlantedBoilerplate(Tables.documents(s, d),
              "text", "doc_id"),
            "text", "doc_id",
            label = when(pmod(col("doc_id"), lit(3)) === 0, 1L)
              .otherwise(-1L),
            width = 1024)
          .orderBy(col("bucket"))): Q,
      Some(s"""WITH ${nbCtes(1024)}
        |SELECT bucket, CAST(cnt_pos AS BIGINT) AS cnt_pos,
        |  CAST(cnt_neg AS BIGINT) AS cnt_neg, w_q FROM model
        |ORDER BY bucket""".stripMargin)),

    // ...and the train-and-classify composition: model broadcast back
    // over the feature stream, per-doc score + class-prior log ratio.
    // The planted labels are perfectly recovered (spec asserts it)
    ("llm_nb_classify",
      ((s: SparkSession, d: String) =>
        TextAnalysis.naiveBayesClassify(
            Dedup.withPlantedBoilerplate(Tables.documents(s, d),
              "text", "doc_id"),
            "text", "doc_id",
            label = when(pmod(col("doc_id"), lit(3)) === 0, 1L)
              .otherwise(-1L),
            width = 1024)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH ${nbCtes(1024)},
        |prior AS (SELECT a.q - b.q AS prior_q
        |  FROM (SELECT q FROM lg WHERE k = 'np') a,
        |       (SELECT q FROM lg WHERE k = 'nn') b),
        |sums AS (SELECT o.doc_id, CAST(SUM(m.w_q) AS BIGINT) AS sw
        |  FROM occ o JOIN model m USING (bucket) GROUP BY 1)
        |SELECT c.doc_id, c.y,
        |  CAST(p.prior_q + COALESCE(s.sw, 0) AS BIGINT) AS score_q,
        |  p.prior_q + COALESCE(s.sw, 0) >= 0 AS keep
        |FROM corpus c LEFT JOIN sums s USING (doc_id) CROSS JOIN prior p
        |ORDER BY doc_id""".stripMargin)),

    // ...and the INCREMENTAL form: per-batch count partials
    // SUM-merged from an exactly-once sink, model assembled at
    // scoring time — graded against llm_nb_classify's SQL VERBATIM
    ("llm_nb_classify_streamed",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val planted = Dedup.withPlantedBoilerplate(docs, "text", "doc_id")
        val label = when(pmod(col("doc_id"), lit(3)) === 0, 1L)
          .otherwise(-1L)
        withStreamShuffle(s) { streamTempRun("graft-nb-stream") { base =>
          val srcDir = sharedTranches(d, "nb-planted-201-v1") { sd =>
            streamedTranches(sd,
              Seq(planted.filter(pmod(col("doc_id"), lit(3)) === 2),
                planted.filter(pmod(col("doc_id"), lit(3)) === 0),
                planted.filter(pmod(col("doc_id"), lit(3)) === 1)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            planted.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.nbCountStream(src, "text",
            "doc_id", label, width = 1024,
            s"$base/counts", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          val counts = s.read.parquet(s"$base/counts")
            .drop("batch_id", "src_batch")
          TextAnalysis.nbScore(planted, "text", "doc_id", label,
            TextAnalysis.nbModelFromCounts(counts, s, 1024),
            TextAnalysis.nbPriorFromCounts(counts), 1024)
        } }.orderBy(col("doc_id"))
      }): Q,
      Some(s"""WITH ${nbCtes(1024)},
        |prior AS (SELECT a.q - b.q AS prior_q
        |  FROM (SELECT q FROM lg WHERE k = 'np') a,
        |       (SELECT q FROM lg WHERE k = 'nn') b),
        |sums AS (SELECT o.doc_id, CAST(SUM(m.w_q) AS BIGINT) AS sw
        |  FROM occ o JOIN model m USING (bucket) GROUP BY 1)
        |SELECT c.doc_id, c.y,
        |  CAST(p.prior_q + COALESCE(s.sw, 0) AS BIGINT) AS score_q,
        |  p.prior_q + COALESCE(s.sw, 0) >= 0 AS keep
        |FROM corpus c LEFT JOIN sums s USING (doc_id) CROSS JOIN prior p
        |ORDER BY doc_id""".stripMargin)),

    // vocabulary coverage: top-1000 words by exact count (bytewise
    // tie-break — a deterministic boundary), per-doc OOV fraction in
    // exact basis points (integral division). The vocab returns as a
    // broadcast; zero-token docs keep a zero row
    ("llm_vocab_coverage",
      ((s: SparkSession, d: String) =>
        TextAnalysis.vocabCoverage(Tables.documents(s, d), "text",
            "doc_id", vocabSize = 1000)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH t AS (SELECT doc_id,
        |    unnest(string_split(trim(text), ' ')) AS w FROM documents),
        |tok AS (SELECT doc_id, w FROM t WHERE w <> ''),
        |vc AS (SELECT w FROM tok GROUP BY w
        |  ORDER BY count(*) DESC, w LIMIT 1000),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_oov
        |  FROM tok LEFT JOIN vc v ON tok.w = v.w GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
        |  CAST(CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0
        |    ELSE (p.n_oov * 10000) // p.n_tokens END AS BIGINT) AS oov_bp
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // BPE tokenizer training: 6 merge rounds over the word-frequency
    // table — per round, exact weighted pair counts, argmax with the
    // (count DESC, pair lexicographic) tie-break, greedy left-to-right
    // merge. The oracle replays every round and matches the merge
    // table by hash — the trained artifact itself is graded, like the
    // IVF trainer row
    ("llm_bpe_train",
      ((s: SparkSession, d: String) =>
        Bpe.trainTable(Tables.documents(s, d), "text", rounds = 6)
          .orderBy(col("merge_round"))): Q,
      Some(s"""WITH ${bpeTrainCtes(6)}
        SELECT * FROM (${(1 to 6).map(r =>
          s"""SELECT CAST($r AS BIGINT) AS merge_round, x AS lhs,
            y AS rhs, c AS pair_count FROM m$r""")
          .mkString("\n          UNION ALL ")})
        ORDER BY merge_round""")),

    // BPE encoding: the trained 6-merge table applied to every
    // document as a pure projection (a codegen'd replace chain — no
    // shuffle); the oracle re-trains AND re-encodes end-to-end. Docs
    // with no countable words keep a zero row on both sides
    ("llm_bpe_encode",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Bpe.encode(docs, "text", "doc_id",
            Bpe.train(docs, "text", rounds = 6))
          .orderBy(col("doc_id"))
      }): Q,
      Some(s"""WITH ${bpeTrainCtes(6)},
  enc AS (SELECT doc_id, ${bpeMergeChainSql(6, "w")} AS s
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
          FROM documents) WHERE w <> '' AND NOT contains(w, chr(1))),
  ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      CAST(sum(len(string_split(trim(s, chr(1)), chr(1)||chr(1))))
        AS BIGINT) AS n_bpe_tokens
    FROM enc GROUP BY doc_id)
  SELECT d.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
    CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
  FROM documents d LEFT JOIN ag a USING (doc_id)
  ORDER BY d.doc_id""")),

    // BPE round trip: encodeTokens emits the actual subword SEQUENCE
    // (word-initial ▁ marker, the SentencePiece convention) and
    // decode inverts it — per doc the token count must match the
    // SQL-replayed merge chain AND the decoded text must hash-equal
    // the single-space word normalization of the original: the
    // tokenizer's losslessness is itself under the gate
    ("llm_bpe_roundtrip",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val enc = Bpe.encodeTokens(docs, "text", "doc_id",
          Bpe.train(docs, "text", rounds = 6))
        enc.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            md5(Bpe.decode(col("toks")).cast("binary")).as("decoded_md5"))
          .orderBy(col("doc_id"))
      }): Q,
      Some(s"""WITH ${bpeTrainCtes(6)},
  enc AS (SELECT doc_id, ${bpeMergeChainSql(6, "w")} AS s
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
          FROM documents) WHERE w <> '' AND NOT contains(w, chr(1))),
  ag AS (SELECT doc_id,
      CAST(sum(len(string_split(trim(s, chr(1)), chr(1)||chr(1))))
        AS BIGINT) AS n_toks
    FROM enc GROUP BY doc_id)
  SELECT d.doc_id, CAST(coalesce(a.n_toks, 0) AS BIGINT) AS n_toks,
    md5(array_to_string(list_filter(string_split(trim(d.text), ' '),
      w -> w <> '' AND NOT contains(w, chr(1))), ' ')) AS decoded_md5
  FROM documents d LEFT JOIN ag a USING (doc_id)
  ORDER BY d.doc_id""")),

    // token co-occurrence mining by PMI: in-doc distinct-token pairs
    // generated row-locally (posting-list trick), pmi_q as the exact
    // difference of two fixed-point logs — top-50 association pairs
    ("llm_cooccurrence_pmi",
      ((s: SparkSession, d: String) =>
        TextAnalysis.cooccurrencePmi(Tables.documents(s, d), "text",
          "doc_id", minDf = 20L, topK = 50)): Q,
      Some(s"""WITH toks AS (SELECT doc_id,
        |  list_sort(list_distinct(string_split(trim(text), ' ')))[1:64]
        |    AS t FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |dfa AS (SELECT a, CAST(count(*) AS BIGINT) AS df_a
        |  FROM (SELECT doc_id, unnest(t) AS a FROM toks) GROUP BY a),
        |prs AS (SELECT t[i] AS a, t[j] AS b,
        |    CAST(count(*) AS BIGINT) AS df_ab
        |  FROM (SELECT t, i, unnest(generate_series(i + 1, len(t))) AS j
        |    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |          FROM toks))
        |  GROUP BY 1, 2 HAVING count(*) >= 20),
        |vals AS (SELECT 'n|' || prs.a || '|' || prs.b AS k,
        |    nn.n * prs.df_ab AS x
        |    FROM prs, nn
        |  UNION ALL
        |  SELECT 'd|' || prs.a || '|' || prs.b, fa.df_a * fb.df_a
        |    FROM prs JOIN dfa fa ON fa.a = prs.a
        |    JOIN dfa fb ON fb.a = prs.b),
        |$log2ChainSql
        |SELECT p.a, p.b, p.df_ab, fa.df_a, fb.df_a AS df_b,
        |  ln.q - ld.q AS pmi_q
        |FROM prs p JOIN dfa fa ON fa.a = p.a
        |  JOIN dfa fb ON fb.a = p.b
        |  JOIN lg ln ON ln.k = 'n|' || p.a || '|' || p.b
        |  JOIN lg ld ON ld.k = 'd|' || p.a || '|' || p.b
        |ORDER BY pmi_q DESC, p.a, p.b LIMIT 50""".stripMargin)),

    // modified n-gram precision (the clipped-count BLEU/ROUGE core)
    // over (candidate, reference) pairs: boilerplate-injected
    // candidates score < 10000 bp, clean ones exactly 10000 — exact
    // integer clipping, no libm brevity penalty (lengths reported)
    ("llm_eval_ngram_precision",
      ((s: SparkSession, d: String) =>
        TextAnalysis.ngramPrecision(
            Tables.documents(s, d).select(col("doc_id"),
              when(pmod(col("doc_id"), lit(3)) === 0,
                concat(lit(Dedup.BoilerplateBanner + " "), col("text")))
                .otherwise(col("text")).as("cand"),
              col("text").as("ref")),
            "doc_id", "cand", "ref", maxN = 2)
          .orderBy(col("doc_id"), col("n"))): Q,
      Some(s"""WITH pr AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN '${Dedup.BoilerplateBanner} ' || text ELSE text END AS cand,
        |  text AS ref FROM documents),
        |cgr AS (SELECT doc_id, n, array_to_string(t[i:i+n-1], ' ') AS g
        |  FROM (SELECT doc_id, t, n,
        |      unnest(generate_series(1, len(t) - n + 1)) AS i
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, 2)) AS n
        |      FROM (SELECT doc_id, string_split(trim(cand), ' ') AS t
        |            FROM pr))
        |    WHERE len(t) >= n)),
        |cg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS c_cand
        |  FROM cgr GROUP BY 1, 2, 3),
        |rgr AS (SELECT doc_id, n, array_to_string(t[i:i+n-1], ' ') AS g
        |  FROM (SELECT doc_id, t, n,
        |      unnest(generate_series(1, len(t) - n + 1)) AS i
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, 2)) AS n
        |      FROM (SELECT doc_id, string_split(trim(ref), ' ') AS t
        |            FROM pr))
        |    WHERE len(t) >= n)),
        |rg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS c_ref
        |  FROM rgr GROUP BY 1, 2, 3),
        |cl AS (SELECT cg.doc_id, cg.n,
        |    CAST(sum(cg.c_cand) AS BIGINT) AS cand_grams,
        |    CAST(sum(least(cg.c_cand, coalesce(rg.c_ref, 0))) AS BIGINT)
        |      AS clipped
        |  FROM cg LEFT JOIN rg USING (doc_id, n, g)
        |  GROUP BY 1, 2),
        |lens AS (SELECT doc_id,
        |  CAST(len(string_split(trim(cand), ' ')) AS BIGINT) AS len_cand,
        |  CAST(len(string_split(trim(ref), ' ')) AS BIGINT) AS len_ref
        |  FROM pr)
        |SELECT c.doc_id, c.n, c.cand_grams, c.clipped,
        |  CAST(floor(10000.0 * c.clipped / c.cand_grams + 0.5) AS BIGINT)
        |    AS p_bp,
        |  l.len_cand, l.len_ref
        |FROM cl c JOIN lens l USING (doc_id)
        |ORDER BY doc_id, n""".stripMargin)),

    // index-accelerated substring search: the query's trigrams
    // AND-intersect over the posting index, only survivors pay the
    // exact contains() verification — and the ORACLE IS THE FULL
    // SCAN, so index+verify ≡ scan is the graded contract
    ("llm_trigram_search",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val idx = TextAnalysis.trigramIndex(docs, "text", "doc_id")
        TextAnalysis.trigramSearch(docs, "text", "doc_id", idx,
            "hash join")
          .orderBy(col("doc_id"))
      }): Q,
      Some("""SELECT doc_id FROM documents
        |WHERE contains(text, 'hash join')
        |ORDER BY doc_id""".stripMargin)),

    // suffix-array construction by prefix doubling: 7 distributed
    // sort-rank passes give every (doc, pos) its global rank in
    // lexicographic suffix order (truncated at 128 tokens) — the
    // exact-substring-dedup primitive, every pass replayed by a
    // dense_rank CTE
    ("llm_suffix_ranks",
      ((s: SparkSession, d: String) =>
        Dedup.suffixRanks(Tables.documents(s, d), "text", "doc_id",
            rounds = 7)
          .orderBy(col("doc_id"), col("pos"))): Q,
      Some(s"""WITH ${suffixRanksSql(7)}
        |SELECT doc_id, pos, r AS rank FROM sr7
        |ORDER BY doc_id, pos""".stripMargin)),

    // ...and its payoff: longest repeated token-substrings — adjacent
    // suffixes in suffix-array order, LCP walked down the doubling
    // tables (7 keyed join-levels, no per-token comparison), clamped
    // by remaining lengths; the oracle replays ranks, ordering, walk
    // and clamp end-to-end
    ("llm_longest_repeats",
      ((s: SparkSession, d: String) =>
        Dedup.longestRepeats(Tables.documents(s, d), "text", "doc_id",
            rounds = 7, minLcp = 2L, topK = 20)
          .orderBy(col("lcp").desc, col("a_id"), col("a_pos"),
            col("b_id"), col("b_pos"))): Q,
      Some(s"""WITH ${suffixRanksSql(7)},
        |sx AS (SELECT doc_id, pos, r,
        |  CAST(dense_rank() OVER (ORDER BY r, doc_id, pos) AS BIGINT)
        |    AS sidx FROM sr7),
        |w7 AS (SELECT a.doc_id AS a_id, a.pos AS a_pos,
        |    b.doc_id AS b_id, b.pos AS b_pos, CAST(0 AS BIGINT) AS h
        |  FROM sx a JOIN sx b ON b.sidx = a.sidx + 1)
        |${(6 to 0 by -1).map { k =>
            s""",w$k AS (SELECT w.a_id, w.a_pos, w.b_id, w.b_pos,
            |  w.h + CASE WHEN ra.r IS NOT NULL AND ra.r = rb.r
            |    THEN ${1 << k} ELSE 0 END AS h
            |  FROM w${k + 1} w
            |  LEFT JOIN sr$k ra ON ra.doc_id = w.a_id
            |    AND ra.pos = w.a_pos + w.h
            |  LEFT JOIN sr$k rb ON rb.doc_id = w.b_id
            |    AND rb.pos = w.b_pos + w.h)""".stripMargin
          }.mkString("\n")},
        |lens AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        |  FROM documents)
        |SELECT w.a_id, w.a_pos, w.b_id, w.b_pos,
        |  least(w.h, la.len - w.a_pos, lb.len - w.b_pos) AS lcp
        |FROM w0 w JOIN lens la ON la.doc_id = w.a_id
        |  JOIN lens lb ON lb.doc_id = w.b_id
        |WHERE least(w.h, la.len - w.a_pos, lb.len - w.b_pos) >= 2
        |ORDER BY lcp DESC, w.a_id, w.a_pos, w.b_id, w.b_pos
        |LIMIT 20""".stripMargin)),

    // ...and the INCREMENTAL index: per-batch postings accumulate in
    // an exactly-once sink (replay harmless — postings distinct), the
    // accumulated index answers the same search, graded against the
    // full-scan SQL verbatim
    ("llm_trigram_search_streamed",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        withStreamShuffle(s) { streamTempRun("graft-trigram-stream") { base =>
          val srcDir = sharedTranches(d, "docs-201-v1") { sd =>
            streamedTranches(sd,
              Seq(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
                docs.filter(pmod(col("doc_id"), lit(3)) === 0),
                docs.filter(pmod(col("doc_id"), lit(3)) === 1)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            docs.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.trigramIndexStream(src,
            "text", "doc_id", s"$base/idx", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          val idx = s.read.parquet(s"$base/idx")
            .drop("batch_id", "src_batch")
          TextAnalysis.trigramSearch(docs, "text", "doc_id", idx,
            "hash join")
        } }.orderBy(col("doc_id"))
      }): Q,
      Some("""SELECT doc_id FROM documents
        |WHERE contains(text, 'hash join')
        |ORDER BY doc_id""".stripMargin)),

    // unigram-LM (SentencePiece-family) tokenizer: Viterbi-segment
    // every distinct word under coarse integer surprisal costs
    // (bitlen-based floor-log2 + 20-bit md5 jitter — no libm), the
    // oracle replaying the DP as Bellman-Ford relaxation in a
    // RECURSIVE CTE and the argmin via arg_min over the jitter-unique
    // costs. Grades the segmentation itself
    ("llm_unigram_segment",
      ((s: SparkSession, d: String) => {
        val words = Unigram.wordCounts(Tables.documents(s, d),
          "text", "doc_id")
        Unigram.viterbiSegment(words,
            Unigram.pieceCosts(Unigram.seedPieces(words, 4, 100L)), 4)
          .orderBy(col("word"))
      }): Q,
      Some(s"""WITH RECURSIVE $unigramCtes
        |SELECT b.word, w.freq, b.cost,
        |  CAST(len(string_split(ltrim(b.path, ';'), ';')) AS BIGINT)
        |    AS n_pieces,
        |  ltrim(b.path, ';') AS seg
        |FROM best b JOIN wf w USING (word) ORDER BY word""".stripMargin)),

    // ...and the one-round hard-EM re-fit: piece counts over the best
    // segmentations (frequency-weighted), unused seed pieces pruned —
    // the trained artifact graded end-to-end like the BPE/IVF trainers
    ("llm_unigram_train",
      ((s: SparkSession, d: String) =>
        Unigram.train(Tables.documents(s, d), "text", "doc_id",
            maxPieceLen = 4, minCount = 100L, iters = 1)
          .orderBy(col("piece"))): Q,
      Some(s"""WITH RECURSIVE $unigramCtes
        |SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(ltrim(b.path, ';'), ';')) AS piece,
        |    w.freq
        |  FROM best b JOIN wf w USING (word))
        |GROUP BY piece ORDER BY piece""".stripMargin)),

    // incremental exact dedup: a re-ingested batch (every 10th doc,
    // shifted ids) probed against the corpus digest index through the
    // Bloom-prefiltered scan; the prefilter cannot change the answer
    // (exact join confirms), so the oracle is the plain text join
    ("llm_dedup_exact_incremental",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        Dedup.exactIncremental(batch,
            Dedup.exactIndex(docs, "text", "doc_id"), "text", "doc_id")
          .orderBy(col("new_id"))
      }): Q,
      Some("""WITH b AS (SELECT doc_id + 100000 AS new_id, text
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT b.new_id, min(d.doc_id) AS dup_of,
        |  count(*) AS n_index_dupes
        |FROM b JOIN documents d ON d.text = b.text
        |GROUP BY b.new_id ORDER BY new_id""".stripMargin)),

    // deterministic training order: salted 64-bit md5 order key,
    // per-shard dense positions — "shuffle" as a reproducible
    // computation; the oracle rebuilds key, shard and rank exactly
    // deterministic curriculum: short-to-long token-count bands within
    // each shard (equal-count integer banding), salted-md5 shuffle
    // inside each band — hash, rank, band and position all replayed
    ("llm_curriculum_order",
      ((s: SparkSession, d: String) =>
        Sampling.curriculumOrder(
            Tables.documents(s, d).select(col("doc_id"),
              TextAnalysis.tokenCount(col("text")).cast("long")
                .as("n_tokens")),
            col("doc_id"), col("n_tokens"), nBuckets = 4, shards = 8)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH h AS (SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id, text,
        |    ('0x' || substr(md5('curr|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('curr|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM documents)),
        |s AS (SELECT doc_id, n_tokens, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h),
        |r AS (SELECT doc_id, n_tokens, order_key, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY n_tokens, doc_id) AS BIGINT) AS rk,
        |  CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n
        |  FROM s),
        |b AS (SELECT doc_id, n_tokens, order_key, shard,
        |  (rk - 1) * 4 // n AS bucket FROM r)
        |SELECT doc_id, n_tokens, order_key, shard, bucket,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY bucket, order_key, doc_id) AS BIGINT) - 1 AS pos
        |FROM b ORDER BY doc_id""".stripMargin)),

    ("llm_shuffle_order",
      ((s: SparkSession, d: String) =>
        Sampling.shuffleOrder(Tables.documents(s, d).select(col("doc_id")),
            col("doc_id"), shards = 8)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH h AS (SELECT doc_id,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM documents)),
        |s AS (SELECT doc_id, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h)
        |SELECT doc_id, order_key, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
        |    AS pos
        |FROM s ORDER BY doc_id""".stripMargin)),

    // shard export manifest — the loader-side integrity artifact: per
    // shard, count + position bounds + an ORDER-SENSITIVE digest of
    // the comma-joined ids in read order, so a loader verifies each
    // shard file is complete, ordered, untampered; the oracle
    // re-derives the shuffle and digests the same id strings
    ("llm_shard_manifest",
      ((s: SparkSession, d: String) =>
        Sampling.shardManifest(
            Sampling.shuffleOrder(Tables.documents(s, d)
              .select(col("doc_id")), col("doc_id"), shards = 8),
            col("doc_id"))
          .orderBy(col("shard"))): Q,
      Some("""WITH h AS (SELECT doc_id,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM documents)),
        |s AS (SELECT doc_id, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h),
        |p AS (SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
        |    AS pos FROM s)
        |SELECT shard, count(*) AS n,
        |  min(pos) AS min_pos, max(pos) AS max_pos,
        |  md5(string_agg(
        |    CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) || ':'
        |      || CAST(doc_id AS VARCHAR), ',' ORDER BY pos))
        |    AS ids_md5
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin)),

    // cross-set semantic decontamination at the gate banding (32×12):
    // the eval set is the planted jittered copies, so every 20th train
    // vector is contaminated by construction; band keys, candidates
    // and reranked hits all recomputed in SQL from the splitmix planes
    ("llm_decontaminate_semantic",
      ((s: SparkSession, d: String) => {
        val base = Tables.embeddings(s, d)
        val eval = Similarity.withPlantedDups(base, "vec_id", "embedding",
            every = 20)
          .filter(col("vec_id") >= 1000000L)
        Similarity.semanticDecontaminate(base, eval, "vec_id", "embedding",
            threshold = 0.8, bands = 32, rowsPerBand = 12)
          .select(col("vec_id"), col("n_eval_hits"),
            floor(col("max_cos") * 1000000 + 0.5).cast("long").as("max_cos_e6"))
          .orderBy(col("vec_id"))
      }): Q,
      Some(semanticDecontSql(threshold = 0.8, bands = 32, rowsPerBand = 12,
        dim = 64, plantedEvery = 20))),

    // margin-based bitext mining (ratio margin over cross-set banded
    // candidates): source = even vec_ids, target = odd vec_ids plus
    // jittered copies of every 10th even vector planted at id+1000001
    // — each planted pair must surface as its source's best match at a
    // margin far above the hub-deflating 1.06 threshold
    ("llm_bitext_margin",
      ((s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val srcSide = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding"))
        val planted = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
          .select((col("vec_id") + lit(1000001L)).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast("double") * (lit(1.0) +
                lit(0.02) * (pmod(i, lit(5)).cast("double") - lit(2.0))))
              .as("embedding"))
        val tgtSide = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("embedding"))
          .unionByName(planted)
        Similarity.marginMining(srcSide, tgtSide, "vec_id", "embedding",
            k = 4, marginThresholdE6 = 1060000L,
            bands = 16, rowsPerBand = 8)
          .orderBy(col("src_id"))
      }): Q,
      Some(marginMiningSql(k = 4, thresholdE6 = 1060000L, bands = 16,
        rowsPerBand = 8, dim = 64))),

    // the curation report card: per-(source, lang) doc/token counts
    // before and after the quality gate — gate verdicts recomputed by
    // the shared CTE chain over the PLAIN corpus (the short/ttr/
    // stopword rules fire naturally), then one grouped rollup
    ("llm_corpus_report",
      ((s: SparkSession, d: String) =>
        TextAnalysis.corpusReport(Tables.documents(s, d), "text", "doc_id",
            dims = Seq("source", "lang"))
          .orderBy(col("source"), col("lang"))): Q,
      Some(s"""WITH src AS (SELECT doc_id, text FROM documents),
        |${gateCtesSql}
        |SELECT d.source, d.lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN v.reasons = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(v.n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(CASE WHEN v.reasons = 0 THEN v.n_tokens ELSE 0 END)
        |    AS BIGINT) AS sum_kept_tokens,
        |  CAST(floor(10000.0 * sum(CASE WHEN v.reasons = 0 THEN 1 ELSE 0 END)
        |    / count(*) + 0.5) AS BIGINT) AS kept_bp
        |FROM v JOIN documents d USING (doc_id)
        |GROUP BY d.source, d.lang ORDER BY d.source, d.lang""".stripMargin)),

    // truncation-loss report — the context-length sizing table: per
    // candidate window, docs over it and the tokens a hard truncation
    // would drop, exact integers; prices max_seq_len choices before
    // committing a training run
    ("llm_truncation_report",
      ((s: SparkSession, d: String) =>
        TextAnalysis.truncationReport(Tables.documents(s, d), "text",
            "doc_id", lengths = Seq(16, 64, 256))
          .orderBy(col("ctx_len"))): Q,
      Some("""WITH n AS (SELECT CAST(len(string_split(trim(text), ' '))
        |    AS BIGINT) AS n_tok FROM documents),
        |t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM n),
        |l AS (SELECT CAST(unnest([16, 64, 256]) AS BIGINT) AS ctx_len)
        |SELECT l.ctx_len,
        |  CAST(sum(CASE WHEN n.n_tok > l.ctx_len THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs_over,
        |  CAST(sum(CASE WHEN n.n_tok > l.ctx_len
        |    THEN n.n_tok - l.ctx_len ELSE 0 END) AS BIGINT) AS tokens_lost,
        |  t.total AS tokens_total,
        |  CAST(floor(10000.0 * sum(CASE WHEN n.n_tok > l.ctx_len
        |    THEN n.n_tok - l.ctx_len ELSE 0 END) / t.total + 0.5)
        |    AS BIGINT) AS lost_bp
        |FROM l CROSS JOIN n CROSS JOIN t
        |GROUP BY l.ctx_len, t.total ORDER BY l.ctx_len""".stripMargin)),

    // the pipeline's drop-forensics companion: one row per INPUT doc
    // with the gate reason bitmask, the keeper it duplicated, and the
    // final verdict — every removal attributable. Same shared SQL
    // fragments as the pipeline row
    ("llm_curation_audit",
      ((s: SparkSession, d: String) =>
        Curation.audit(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id")
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH d0 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 924000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |pm AS (__PM__),
        |pp AS (__PP__),
        |pr AS (${plantRepetitionCte("pp")}),
        |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
        |${gateCtesSql},
        |kept AS (SELECT s.doc_id, md5(s.text) AS clean_md5
        |  FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0),
        |keepers AS (SELECT clean_md5, min(doc_id) AS keeper FROM kept
        |  GROUP BY clean_md5),
        |dup AS (SELECT k.doc_id,
        |  CASE WHEN kp.keeper != k.doc_id THEN kp.keeper END AS dup_of
        |  FROM kept k JOIN keepers kp USING (clean_md5))
        |SELECT v.doc_id, v.reasons, v.reasons = 0 AS keep, d.dup_of,
        |  (v.reasons = 0 AND d.dup_of IS NULL) AS survived
        |FROM v LEFT JOIN dup d USING (doc_id)
        |ORDER BY v.doc_id""".stripMargin
        .replace("__PM__", plantMarkupCte("d0"))
        .replace("__PP__", plantPiiCte("pm"))
        .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text"))))),

    // the end-to-end curation pipeline as ONE query: markup strip →
    // PII redact → quality gate → exact dedup (on the cleaned text,
    // where the planted +924000 copies become true duplicates) →
    // deterministic shuffle. Every stage's SQL fragment is the shared
    // one its per-operator row uses — the oracle replays the entire
    // composition
    ("llm_curation_pipeline",
      ((s: SparkSession, d: String) =>
        Curation.pipeline(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id", shards = 8)
          .orderBy(col("doc_id"))): Q,
      Some(curationPipelineSql)),

    // classifier-gated curation: the published two-stage filter shape
    // (heuristic gate first, the broadcast-model classifier on its
    // survivors) as ONE composition — rejected docs and their planted
    // copies never reach the digest keeper. The oracle replays plants
    // -> clean -> gate -> feature hashing -> logits -> keeper ->
    // shuffle end-to-end
    ("llm_curation_classified",
      ((s: SparkSession, d: String) =>
        Curation.pipelineClassified(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id",
            TextAnalysis.standInWeights(s, 262144), 262144, shards = 8)
          .orderBy(col("doc_id"))): Q,
      Some(curationClassifiedSql)),

    // the STREAMED curation path itself under the DuckDB oracle: the
    // query function runs curationStream over three micro-batches in
    // WORST-CASE arrival order (the planted +924000 copies arrive
    // before their bases, so first-arrival keeps the copy), then
    // reconcile re-keys to the global min-id keeper and shuffleOrder
    // assembles — and the ORACLE IS llm_curation_pipeline's SQL
    // VERBATIM: stream → reconcile → assembly must equal the batch
    // pipeline end-to-end under arrival orders the batch never sees
    ("llm_curation_streamed",
      ((s: SparkSession, d: String) => {
        withStreamShuffle(s) { streamTempRun("graft-streamed") { base =>
          // three tranches, copies FIRST = the arrival order that breaks
          // a first-arrival keeper without reconcile; one AvailableNow
          // run with maxFilesPerTrigger=1 turns the three drops into
          // three micro-batches (FileStreamSource orders by mtime, which
          // streamedTranches pins per file). Persisted across the three
          // tranche writes on a cache miss: the plant chain is
          // regex-heavy and each coalesce(1) write would re-derive it
          // from parquet; released as soon as the files are down (the
          // stream reads the FILES, not this frame)
          val srcDir = sharedTranches(d, "curation-planted-v1") { sd =>
            val planted = Curation.withPlantedEverything(
                Tables.documents(s, d), "text", "doc_id")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            streamedTranches(sd,
              Seq(planted.filter(col("doc_id") >= 924000L),
                planted.filter(col("doc_id") < 924000L &&
                  pmod(col("doc_id"), lit(2)) === 0),
                planted.filter(col("doc_id") < 924000L &&
                  pmod(col("doc_id"), lit(2)) === 1)))
            planted.unpersist(blocking = false)
          }
          // schema from the cached tranche footers — a plant-chain
          // .schema probe would eagerly run its min/max id scan on
          // every invocation, clawing back the cache-hit saving
          val srcSchema = s.read.parquet(srcDir).schema
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            srcSchema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.curationStream(src, "text",
            "doc_id", s"$base/surv", s"$base/index", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          // compactSurvivors: the assembly-time sink compaction runs
          // INSIDE the graded path, so the oracle also proves the
          // compacted read is byte-equal to the batch pipeline
          Sampling.shuffleOrder(
              Curation.reconcile(s, s"$base/surv", s"$base/index", "doc_id",
                compactSurvivors = true),
              col("doc_id"), shards = 8)
            .select(col("doc_id"), col("clean_md5"), col("order_key"),
              col("shard"), col("pos"))
        } }.orderBy(col("doc_id"))
      }): Q,
      Some(curationPipelineSql)),

    // the near-dup-aware curation pipeline (C4/RefinedWeb shape):
    // exact keeper first, then n-gram-Jaccard connected components over
    // the cleaned surviving text collapse fuzzy clusters to their
    // min-id representative. The oracle replays the full composition —
    // plants, clean, gate, exact keeper, jaccard pairs, RECURSIVE
    // min-label components, shuffle — from the same shared fragments
    // the per-operator rows use
    ("llm_curation_neardup",
      ((s: SparkSession, d: String) =>
        Curation.pipelineNearDup(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id", shards = 8)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH RECURSIVE d0 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 924000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |pm AS (__PM__),
        |pp AS (__PP__),
        |pr AS (${plantRepetitionCte("pp")}),
        |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
        |${gateCtesSql},
        |kept AS (SELECT s.doc_id, s.text, md5(s.text) AS clean_md5
        |  FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY clean_md5),
        |es AS (SELECT k.doc_id, k.text, k.clean_md5 FROM kept k
        |  JOIN keepers USING (doc_id)),
        |jt AS (SELECT doc_id, string_split(text, ' ') AS t FROM es
        |  WHERE len(string_split(text, ' ')) >= 5),
        |jsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM jt)),
        |jdf AS (SELECT shingle, count(*) AS df FROM jsh GROUP BY shingle),
        |jcand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM jsh a JOIN jdf USING (shingle) JOIN jsh b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND jdf.df <= 5),
        |jsizes AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
        |jinter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        |  FROM jsh a JOIN jsh b USING (shingle)
        |  JOIN jcand ON jcand.a = a.doc_id AND jcand.b = b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (SELECT i.a, i.b FROM jinter i
        |  JOIN jsizes sa ON sa.doc_id = i.a JOIN jsizes sb ON sb.doc_id = i.b
        |  WHERE 1.0 * i.c / (sa.n + sb.n - i.c) >= 0.5),
        |nodes AS (SELECT a AS n FROM jpairs UNION SELECT b FROM jpairs),
        |dedges AS (SELECT a AS lo, b AS hi FROM jpairs
        |  UNION ALL SELECT b, a FROM jpairs),
        |cc(n, label) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.hi, cc.label FROM cc JOIN dedges e ON cc.n = e.lo
        |  WHERE cc.label < e.hi),
        |labels AS (SELECT n AS doc_id, min(label) AS cluster FROM cc
        |  GROUP BY n),
        |surv AS (SELECT e.doc_id, e.clean_md5 FROM es e
        |  LEFT JOIN labels l USING (doc_id)
        |  WHERE l.doc_id IS NULL OR l.cluster = e.doc_id),
        |h AS (SELECT doc_id, clean_md5,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id, clean_md5,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM surv)),
        |sh2 AS (SELECT doc_id, clean_md5, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h)
        |SELECT doc_id, clean_md5, order_key, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
        |    AS pos
        |FROM sh2 ORDER BY doc_id""".stripMargin
        .replace("__PM__", plantMarkupCte("d0"))
        .replace("__PP__", plantPiiCte("pm"))
        .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text"))))),

    // the FLEET near-dup curation config, oracle-graded: same
    // composition as llm_curation_neardup but the pair stage is banded
    // MinHash-LSH candidates (one (band, sig) equi-join over 8-hash
    // sketches — no posting lists over raw shingles, no maxDf recall
    // cliff) + exact Jaccard rerank. The oracle rebuilds the minhash
    // bands exactly as llm_dedup_minhash_lsh does — over the cleaned
    // exact-surviving text — then reranks, clusters (RECURSIVE
    // min-label CC) and shuffles with the same shared fragments
    ("llm_curation_neardup_lsh",
      ((s: SparkSession, d: String) =>
        Curation.pipelineNearDup(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id", shards = 8,
            pairSource = Curation.lshPairSource(shingleK = 5, numPerms = 8,
              bands = 4, minJaccard = 0.5))
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH RECURSIVE d0 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 924000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |pm AS (__PM__),
        |pp AS (__PP__),
        |pr AS (${plantRepetitionCte("pp")}),
        |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
        |${gateCtesSql},
        |kept AS (SELECT s.doc_id, s.text, md5(s.text) AS clean_md5
        |  FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY clean_md5),
        |es AS (SELECT k.doc_id, k.text, k.clean_md5 FROM kept k
        |  JOIN keepers USING (doc_id)),
        |jt AS (SELECT doc_id, string_split(text, ' ') AS t FROM es
        |  WHERE len(string_split(text, ' ')) >= 5),
        |jsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |        FROM jt)),
        |jmd AS (SELECT doc_id, md5('0|' || shingle) AS m0,
        |  md5('1|' || shingle) AS m1 FROM jsh),
        |jmh AS (SELECT doc_id,
        |  min(('0x' || substr(m0, 1, 8))::BIGINT) AS h0,
        |  min(('0x' || substr(m0, 9, 8))::BIGINT) AS h1,
        |  min(('0x' || substr(m0, 17, 8))::BIGINT) AS h2,
        |  min(('0x' || substr(m0, 25, 8))::BIGINT) AS h3,
        |  min(('0x' || substr(m1, 1, 8))::BIGINT) AS h4,
        |  min(('0x' || substr(m1, 9, 8))::BIGINT) AS h5,
        |  min(('0x' || substr(m1, 17, 8))::BIGINT) AS h6,
        |  min(('0x' || substr(m1, 25, 8))::BIGINT) AS h7
        |  FROM jmd GROUP BY doc_id),
        |jbands AS (
        |  SELECT doc_id, 0 AS band,
        |    md5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS sig FROM jmh
        |  UNION ALL SELECT doc_id, 1,
        |    md5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM jmh
        |  UNION ALL SELECT doc_id, 2,
        |    md5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM jmh
        |  UNION ALL SELECT doc_id, 3,
        |    md5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM jmh),
        |jcand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        |  FROM jbands l JOIN jbands r ON l.band = r.band AND l.sig = r.sig
        |    AND l.doc_id < r.doc_id),
        |jsizes AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
        |jinter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
        |  FROM jsh a JOIN jsh b USING (shingle)
        |  JOIN jcand ON jcand.a = a.doc_id AND jcand.b = b.doc_id
        |  GROUP BY 1, 2),
        |jpairs AS (SELECT i.a, i.b FROM jinter i
        |  JOIN jsizes sa ON sa.doc_id = i.a JOIN jsizes sb ON sb.doc_id = i.b
        |  WHERE 1.0 * i.c / (sa.n + sb.n - i.c) >= 0.5),
        |nodes AS (SELECT a AS n FROM jpairs UNION SELECT b FROM jpairs),
        |dedges AS (SELECT a AS lo, b AS hi FROM jpairs
        |  UNION ALL SELECT b, a FROM jpairs),
        |cc(n, label) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.hi, cc.label FROM cc JOIN dedges e ON cc.n = e.lo
        |  WHERE cc.label < e.hi),
        |labels AS (SELECT n AS doc_id, min(label) AS cluster FROM cc
        |  GROUP BY n),
        |surv AS (SELECT e.doc_id, e.clean_md5 FROM es e
        |  LEFT JOIN labels l USING (doc_id)
        |  WHERE l.doc_id IS NULL OR l.cluster = e.doc_id),
        |h AS (SELECT doc_id, clean_md5,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id, clean_md5,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM surv)),
        |sh2 AS (SELECT doc_id, clean_md5, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h)
        |SELECT doc_id, clean_md5, order_key, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
        |    AS pos
        |FROM sh2 ORDER BY doc_id""".stripMargin
        .replace("__PM__", plantMarkupCte("d0"))
        .replace("__PP__", plantPiiCte("pm"))
        .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text"))))),

    // epoch assembly as ONE plan: survivors → deterministic shuffle →
    // greedy context-window packing in the training read order (pos
    // within shard). The rank window and the running-sum window share
    // one exchange on `shard` — no global sort at any corpus size. The
    // oracle replays the composition from the shared pipeline and
    // pack fragments
    ("llm_epoch_assembly",
      ((s: SparkSession, d: String) =>
        Curation.epochAssembly(
            Curation.withPlantedEverything(Tables.documents(s, d), "text",
              "doc_id"),
            "text", "doc_id", shards = 8, budget = 2048L)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH d0 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 924000, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |pm AS (__PM__),
        |pp AS (__PP__),
        |pr AS (${plantRepetitionCte("pp")}),
        |src AS (SELECT doc_id, __CLEAN__ AS text FROM pr),
        |${gateCtesSql},
        |kept AS (SELECT s.doc_id, s.text, md5(s.text) AS clean_md5
        |  FROM src s JOIN v USING (doc_id) WHERE v.reasons = 0),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY clean_md5),
        |surv AS (SELECT k.doc_id, k.text, k.clean_md5 FROM kept k
        |  JOIN keepers USING (doc_id)),
        |h AS (SELECT doc_id, text, clean_md5,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS order_key
        |  FROM (SELECT doc_id, text, clean_md5,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM surv)),
        |sh AS (SELECT doc_id, text, clean_md5, order_key,
        |  ((order_key % 8) + 8) % 8 AS shard FROM h),
        |p AS (SELECT doc_id, clean_md5, order_key, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id) - 1
        |    AS pos,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM sh),
        |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens FROM p)
        |SELECT doc_id, clean_md5, order_key, shard, pos, n_tokens,
        |  cum_tokens,
        |  CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin,
        |  CAST((cum_tokens - n_tokens) % 2048 AS BIGINT) AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin
        .replace("__PM__", plantMarkupCte("d0"))
        .replace("__PP__", plantPiiCte("pm"))
        .replace("__CLEAN__", redactSqlExpr(stripSqlExpr("text"))))),

    // token-budget sampling — the form real mixture specs take ("N
    // tokens of web, M of code"): rank per source by salted md5, keep
    // the rank-prefix whose cumulative tokens stay under the source's
    // budget (overshoot ≤ 1 document — packSequences' boundary
    // convention). Budgets bind at every test SF (per-source corpora
    // are ≥ 1100 tokens), so the selection is non-vacuous everywhere;
    // the oracle replays the whole ranked prefix sum exactly
    ("llm_token_budget_sample",
      ((s: SparkSession, d: String) =>
        Sampling.tokenBudgetSample(
            Tables.documents(s, d).select(col("doc_id"), col("source"),
              col("text")),
            col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")),
            budgets = Map("src0" -> 400L, "src1" -> 800L),
            defaultBudget = 600L)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("cum_tokens"))
          .orderBy(col("doc_id"))): Q,
      Some("""WITH n AS (SELECT doc_id, source,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id, source, text,
        |    ('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS lo
        |  FROM documents)),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |  FROM n)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens - n_tokens <
        |  CASE source WHEN 'src0' THEN 400 WHEN 'src1' THEN 800 ELSE 600 END
        |ORDER BY doc_id""".stripMargin)),

    // exact-substring dedup spans (the "repeated >= L-token sequence
    // keeps one occurrence" pipeline pass): 20-token grams hashed with
    // the shared md5-derived 64-bit hash, df >= 2 grams keep their
    // minimum (doc, pos) occurrence, all other occurrences merge into
    // maximal per-document cut spans. The oracle recomputes the gram
    // hashes, the packed-integer keeper min, and the interval merge
    // windows exactly
    ("llm_repeated_spans",
      ((s: SparkSession, d: String) =>
        Dedup.repeatedSpans(Tables.documents(s, d), "text", "doc_id",
            gramLen = 20)
          .orderBy(col("doc_id"), col("span_start"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 20),
        |g AS (SELECT doc_id, i AS pos,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id, i,
        |    ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(gram), 9, 8))::BIGINT AS lo
        |  FROM (SELECT doc_id, i, array_to_string(t[i:i+19], ' ') AS gram
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-19)) AS i
        |          FROM toks)))),
        |d AS (SELECT h, count(*) AS df, min(doc_id * 1048576 + pos) AS keep
        |  FROM g GROUP BY h),
        |m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)
        |  WHERE d.df >= 2 AND g.doc_id * 1048576 + g.pos != d.keep),
        |x AS (SELECT doc_id, pos, max(pos + 20) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS pme FROM m),
        |f AS (SELECT doc_id, pos,
        |  CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END AS ns FROM x),
        |sp AS (SELECT doc_id, pos, CAST(sum(ns) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS span_id FROM f)
        |SELECT doc_id, span_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 20 AS BIGINT) AS span_end
        |FROM sp GROUP BY doc_id, span_id
        |ORDER BY doc_id, span_start""".stripMargin)),

    // the SUFFIX-ARRAY cut pass — exact-substring dedup's apply step
    // at any window length (the endgame the SA exists for): window
    // identity via the sparse-table rank-pair trick (level-4 ranks at
    // pos and pos+8 decide 24-token windows), canonical-occurrence
    // keep rule, span merge and cut as in the gram pass; the oracle
    // replays the 4 doubling rounds, the rank-pair keying, and the
    // reassembly end-to-end
    ("llm_sa_repeats_cut",
      ((s: SparkSession, d: String) =>
        Dedup.cutLongRepeats(Tables.documents(s, d), "text", "doc_id",
            minLen = 24)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH ${suffixRanksSql(4)},
        |atoks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM atoks),
        |ky AS (SELECT a.doc_id, a.pos + 1 AS pos, a.r AS ra, b.r AS rb
        |  FROM sr4 a JOIN sr4 b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 8
        |  JOIN lens l ON l.doc_id = a.doc_id
        |  WHERE a.pos + 24 <= l.len),
        |d AS (SELECT ra, rb, count(*) AS df,
        |    min(doc_id * 1048576 + pos) AS keep
        |  FROM ky GROUP BY ra, rb),
        |m AS (SELECT ky.doc_id, ky.pos FROM ky JOIN d USING (ra, rb)
        |  WHERE d.df >= 2 AND ky.doc_id * 1048576 + ky.pos != d.keep),
        |x AS (SELECT doc_id, pos, max(pos + 24) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS pme FROM m),
        |f AS (SELECT doc_id, pos,
        |  CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END AS ns FROM x),
        |sp AS (SELECT doc_id, pos, CAST(sum(ns) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS span_id FROM f),
        |spans AS (SELECT doc_id, min(pos) AS span_start,
        |  max(pos) + 24 AS span_end
        |  FROM sp GROUP BY doc_id, span_id),
        |tpos AS (SELECT doc_id, t[p] AS tok, p
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p
        |        FROM atoks)),
        |cut AS (SELECT p.doc_id,
        |  string_agg(p.tok, ' ' ORDER BY p.p) AS txt,
        |  count(*) AS n_kept
        |  FROM tpos p
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = p.doc_id
        |    AND p.p >= s.span_start AND p.p < s.span_end)
        |  GROUP BY p.doc_id)
        |SELECT a.doc_id, md5(coalesce(c.txt, '')) AS cut_md5,
        |  CAST(len(a.t) - coalesce(c.n_kept, 0) AS BIGINT) AS n_tokens_cut
        |FROM atoks a LEFT JOIN cut c USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin)),

    // the apply step of exact-substring dedup: every cut span removed,
    // surviving tokens rejoined and digested — one row per input doc
    // (uniform digest convention for untouched docs). The oracle
    // rebuilds the spans, then reassembles each document from its
    // uncovered token positions with a correlated NOT EXISTS
    ("llm_repeated_spans_cut",
      ((s: SparkSession, d: String) =>
        Dedup.cutRepeatedSpans(Tables.documents(s, d), "text", "doc_id",
            gramLen = 20)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH atoks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, t FROM atoks WHERE len(t) >= 20),
        |g AS (SELECT doc_id, i AS pos,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id, i,
        |    ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(gram), 9, 8))::BIGINT AS lo
        |  FROM (SELECT doc_id, i, array_to_string(t[i:i+19], ' ') AS gram
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-19)) AS i
        |          FROM toks)))),
        |d AS (SELECT h, count(*) AS df, min(doc_id * 1048576 + pos) AS keep
        |  FROM g GROUP BY h),
        |m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)
        |  WHERE d.df >= 2 AND g.doc_id * 1048576 + g.pos != d.keep),
        |x AS (SELECT doc_id, pos, max(pos + 20) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS pme FROM m),
        |f AS (SELECT doc_id, pos,
        |  CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END AS ns FROM x),
        |sp AS (SELECT doc_id, pos, CAST(sum(ns) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS span_id FROM f),
        |spans AS (SELECT doc_id, min(pos) AS span_start,
        |  max(pos) + 20 AS span_end
        |  FROM sp GROUP BY doc_id, span_id),
        |pos AS (SELECT doc_id, t[p] AS tok, p
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p
        |        FROM atoks)),
        |cut AS (SELECT p.doc_id,
        |  string_agg(p.tok, ' ' ORDER BY p.p) AS txt,
        |  count(*) AS n_kept
        |  FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = p.doc_id
        |    AND p.p >= s.span_start AND p.p < s.span_end)
        |  GROUP BY p.doc_id)
        |SELECT a.doc_id, md5(coalesce(c.txt, '')) AS cut_md5,
        |  CAST(len(a.t) - coalesce(c.n_kept, 0) AS BIGINT) AS n_tokens_cut
        |FROM atoks a LEFT JOIN cut c USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin)),

    // BM25 top-k retrieval: every 100th document's distinct tokens form
    // a query probing the corpus inverted index. Rational Okapi
    // constants (k1=6/5, b=3/4) reduce both factors to single IEEE
    // divides of exact integers, and per-term scores are quantized
    // BEFORE the per-doc sum, so the oracle replays ranking bit-for-bit
    // (see TextAnalysis.bm25TopK scaladoc)
    ("llm_retrieval_bm25",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val qs = Dedup.tokenize(docs.filter(col("doc_id") % 100 === 0),
            "text", "doc_id")
          .select(col("doc_id").as("query_id"), explode(col("toks")).as("term"))
        TextAnalysis.bm25TopK(docs, "text", "doc_id", qs, k = 10)
          .orderBy(col("query_id"), col("rank"))
      }): Q,
      Some(bm25Sql)),

    // the BM25 index maintained INCREMENTALLY: three micro-batches land
    // their own (doc, term, tf) partitions exactly-once, every global
    // statistic (df, dl, N, total) derives from the accumulated index
    // at scoring time — graded against the batch row's SQL VERBATIM
    ("llm_retrieval_bm25_streamed",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        withStreamShuffle(s) { streamTempRun("graft-bm25-stream") { base =>
          val srcDir = sharedTranches(d, "docs-012-v1") { sd =>
            streamedTranches(sd,
              Seq(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
                docs.filter(pmod(col("doc_id"), lit(3)) === 1),
                docs.filter(pmod(col("doc_id"), lit(3)) === 2)))
          }
          val src = graft.streaming.Streaming.fileStream(s, srcDir,
            docs.schema, maxFilesPerTrigger = 1)
          val q = graft.streaming.Streaming.bm25IndexStream(src, "text",
            "doc_id", s"$base/index", s"$base/ck").start()
          try q.awaitTermination() finally if (q.isActive) q.stop()
          val qs = Dedup.tokenize(docs.filter(col("doc_id") % 100 === 0),
              "text", "doc_id")
            .select(col("doc_id").as("query_id"),
              explode(col("toks")).as("term"))
          TextAnalysis.bm25FromIndex(
            s.read.parquet(s"$base/index").drop("batch_id", "src_batch"),
            "doc_id", qs, k = 10)
        } }.orderBy(col("query_id"), col("rank"))
      }): Q,
      Some(bm25Sql)),

    // concat-and-cut window assembly: documents laid end-to-end per
    // shard, the token stream cut into 2048-token context windows, one
    // row per (document, window) overlap — the index map a training
    // loader materializes windows from. All exact integer arithmetic
    // on the per-shard running sum (see Chunking.concatChunks)
    ("llm_concat_chunk",
      ((s: SparkSession, d: String) =>
        Chunking.concatChunks(
            Tables.documents(s, d).select(col("doc_id"),
              TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
              pmod(col("doc_id"), lit(8)).as("shard")),
            tokenCount = col("n_tokens"), window = 2048L,
            order = Seq(col("doc_id")), shard = Seq(col("shard")))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
            col("cum_tokens"), col("win_id"), col("win_from"),
            col("doc_from"), col("doc_to"))
          .orderBy(col("doc_id"), col("win_id"))): Q,
      Some("""WITH n AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens
        |  FROM n WHERE n_tokens > 0),
        |s AS (SELECT *, cum_tokens - n_tokens AS strt FROM c),
        |w AS (SELECT doc_id, shard, n_tokens, cum_tokens, strt,
        |  unnest(generate_series(strt // 2048, (cum_tokens - 1) // 2048))
        |    AS win_id
        |  FROM s)
        |SELECT doc_id, shard, n_tokens, cum_tokens,
        |  CAST(win_id AS BIGINT) AS win_id,
        |  CAST(greatest(win_id * 2048, strt) - win_id * 2048 AS BIGINT)
        |    AS win_from,
        |  CAST(greatest(win_id * 2048, strt) - strt AS BIGINT) AS doc_from,
        |  CAST(least(win_id * 2048 + 2048, cum_tokens) - strt AS BIGINT)
        |    AS doc_to
        |FROM w ORDER BY doc_id, win_id""".stripMargin)),

    // content-defined chunking (LBFS/FastCDC at token granularity):
    // boundaries where the md5-64 of the 4-token window ending at p is
    // = 0 (mod 8), chunks rejoined and digested, then the
    // shift-tolerant duplication profile — planted prefix-shifted
    // copies land at dup_bp near 10000 (every chunk after the first
    // boundary re-synchronizes) where whole-document digests and
    // fixed-offset chunking both see nothing
    ("llm_chunk_cdc",
      ((s: SparkSession, d: String) =>
        Chunking.cdcDupProfile(
            Chunking.withPlantedShifted(Tables.documents(s, d),
              "text", "doc_id"),
            "text", "doc_id", k = 4, modulus = 8)
          .orderBy(col("doc_id"))): Q,
      Some(s"""WITH p0 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000,
        |    '${graft.llm.Chunking.ShiftPrefix} ' || text
        |  FROM documents WHERE doc_id % 9 = 0),
        |${cdcChunksCte("p0", "chunks", k = 4, m = 8)},
        |shared AS (SELECT chunk_md5 FROM
        |  (SELECT DISTINCT doc_id, chunk_md5 FROM chunks)
        |  GROUP BY chunk_md5 HAVING count(*) >= 2),
        |fl AS (SELECT c.doc_id, c.n_chunk_tokens,
        |  s.chunk_md5 IS NOT NULL AS dup
        |  FROM chunks c LEFT JOIN shared s USING (chunk_md5)),
        |agg AS (SELECT doc_id,
        |  CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(sum(CASE WHEN dup THEN n_chunk_tokens ELSE 0 END) AS BIGINT)
        |    AS dup_tokens
        |  FROM fl GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_chunks, n_dup_chunks, dup_tokens,
        |  CAST(floor(10000.0 * dup_tokens / n_tokens + 0.5) AS BIGINT)
        |    AS dup_bp
        |FROM agg ORDER BY doc_id""".stripMargin)),

    // adaptive per-language quality floor: each language's ttr floor
    // comes from its OWN distribution (the histogram-sketch p25 lower
    // bound) — the CCNet/Gopher per-language-threshold practice,
    // replayed sketch-and-gate by the oracle
    ("llm_quality_floor_adaptive",
      ((s: SparkSession, d: String) =>
        TextAnalysis.adaptiveQualityFloor(Tables.documents(s, d),
            "text", "doc_id", "lang")
          .orderBy(col("doc_id"))): Q,
      Some("""WITH q AS (SELECT doc_id, lang,
        |  len(string_split(trim(text), ' ')) AS n_tokens,
        |  CAST(floor(10000.0 * len(list_distinct(string_split(trim(text), ' ')))
        |    / len(string_split(trim(text), ' ')) + 0.5) AS BIGINT) AS ttr_bp
        |  FROM documents),
        |b AS (SELECT lang,
        |  least(greatest((ttr_bp - 0) * 100 // 10000, 0), 99) AS bin
        |  FROM q),
        |hist AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY lang, bin),
        |c AS (SELECT lang, bin, n,
        |  CAST(sum(n) OVER (PARTITION BY lang ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum,
        |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS total
        |  FROM hist),
        |fl AS (SELECT lang,
        |  0 + min(CASE WHEN cum >= (total * 1 + 3) // 4 THEN bin END)
        |    * 100 AS floor_c
        |  FROM c GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.n_tokens, q.ttr_bp, f.floor_c,
        |  q.ttr_bp >= f.floor_c AS keep
        |FROM q JOIN fl f USING (lang) ORDER BY q.doc_id""".stripMargin)),

    // corpus-diff keyness (the "Fightin' Words" odds-ratio family,
    // log-free so the ranking is exact): top-25 terms distinctive of
    // the English vs the German sub-corpus in each direction. The
    // synthetic corpus draws both langs from one token pool, so the
    // natural signal is a mild frequency tilt — every 3rd document
    // additionally gains two side-specific jargon tokens (the
    // planted-signal protocol), which must dominate the head of each
    // side's ranking while the tail exercises the smoothing; every
    // ratio factor is an exact integer
    ("llm_corpus_diff",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        def planted(lang: String, jargon: String) = docs
          .filter(col("lang") === lang)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(col("text"), lit(" " + jargon))).otherwise(col("text")))
        TextAnalysis.corpusDiff(
            planted("en", "senate congress"),
            planted("de", "bundestag kanzler"), "text", "doc_id", topK = 25)
          .orderBy(col("side"), col("score_e6").desc, col("term"))
      }): Q,
      Some("""WITH ta AS (SELECT unnest(string_split(trim(
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' senate congress'
        |      ELSE text END), ' ')) AS term,
        |  0 AS s FROM documents WHERE lang = 'en'),
        |tb AS (SELECT unnest(string_split(trim(
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' bundestag kanzler'
        |      ELSE text END), ' ')) AS term,
        |  1 AS s FROM documents WHERE lang = 'de'),
        |u AS (SELECT * FROM ta UNION ALL SELECT * FROM tb),
        |vocab AS (SELECT term,
        |  CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u WHERE term != '' GROUP BY term),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
        |  CAST(sum(n_b) AS BIGINT) AS tot_b,
        |  CAST(count(*) AS BIGINT) AS v FROM vocab),
        |sc AS (SELECT term, n_a, n_b,
        |  (n_a + 1.0) * (tot_b + v - n_b - 1.0) AS oa,
        |  (n_b + 1.0) * (tot_a + v - n_a - 1.0) AS ob
        |  FROM vocab, tot),
        |pa AS (SELECT 'a' AS side, term, n_a, n_b,
        |  CAST(floor(1000000.0 * oa / ob + 0.5) AS BIGINT) AS score_e6
        |  FROM sc ORDER BY score_e6 DESC, term LIMIT 25),
        |pb AS (SELECT 'b' AS side, term, n_a, n_b,
        |  CAST(floor(1000000.0 * ob / oa + 0.5) AS BIGINT) AS score_e6
        |  FROM sc ORDER BY score_e6 DESC, term LIMIT 25)
        |SELECT * FROM pa UNION ALL SELECT * FROM pb
        |ORDER BY side, score_e6 DESC, term""".stripMargin)),

    // incremental shift-tolerant dedup: every 10th document re-arrives
    // with a new header (the re-crawl shape) at id+4000000 — exact
    // whole-document digests all miss, the CDC chunk-index probe must
    // recover dup_of = the original for every batch doc
    ("llm_chunk_cdc_incremental",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + lit(4000000L)).as("doc_id"),
            concat(lit(graft.llm.Chunking.ShiftPrefix + " "), col("text"))
              .as("text"))
        val index = graft.llm.Chunking.contentDefinedChunks(docs,
            "text", "doc_id", k = 4, modulus = 8)
          .select(col("doc_id"), col("chunk_md5"))
        graft.llm.Chunking.cdcIncremental(batch, index, "text", "doc_id",
            k = 4, modulus = 8, minSharedBp = 5000L)
          .orderBy(col("doc_id"))
      }): Q,
      Some(s"""WITH corp AS (SELECT doc_id, text FROM documents),
        |bat AS (SELECT doc_id + 4000000 AS doc_id,
        |  '${graft.llm.Chunking.ShiftPrefix} ' || text AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |${cdcChunksCte("corp", "cchunks", k = 4, m = 8)},
        |${cdcChunksCte("bat", "bchunks", k = 4, m = 8)},
        |idx AS (SELECT DISTINCT doc_id AS corpus_id, chunk_md5
        |  FROM cchunks),
        |hits AS (SELECT DISTINCT b.doc_id, i.corpus_id, b.chunk_id,
        |  b.n_chunk_tokens
        |  FROM bchunks b JOIN idx i USING (chunk_md5)
        |  WHERE i.corpus_id != b.doc_id),
        |pair AS (SELECT doc_id, corpus_id,
        |  CAST(count(*) AS BIGINT) AS n_shared_chunks,
        |  CAST(sum(n_chunk_tokens) AS BIGINT) AS shared_tokens
        |  FROM hits GROUP BY doc_id, corpus_id),
        |tot AS (SELECT doc_id, CAST(sum(n_chunk_tokens) AS BIGINT)
        |    AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM bchunks GROUP BY doc_id),
        |sc AS (SELECT p.doc_id, p.corpus_id AS dup_of, t.n_chunks,
        |  p.n_shared_chunks, p.shared_tokens, t.n_tokens,
        |  CAST(floor(10000.0 * p.shared_tokens / t.n_tokens + 0.5)
        |    AS BIGINT) AS shared_bp,
        |  row_number() OVER (PARTITION BY p.doc_id
        |    ORDER BY p.shared_tokens DESC, p.corpus_id) AS rn
        |  FROM pair p JOIN tot t USING (doc_id))
        |SELECT doc_id, dup_of, n_chunks, n_shared_chunks, shared_tokens,
        |  n_tokens, shared_bp
        |FROM sc WHERE rn = 1 AND shared_bp >= 5000
        |ORDER BY doc_id""".stripMargin)),

    // UniMax language-balanced allocation: half the corpus's tokens
    // distributed over languages ascending by size, each capped at 2
    // epochs — the sequential driver loop replayed as a RECURSIVE CTE
    // stepping the same (fair share = floor(rem / remaining), cap,
    // subtract) integers in size-then-name order
    ("llm_mixture_unimax",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val tc = TextAnalysis.tokenCount(col("text")).cast("long")
        val total = docs.agg(sum(tc).as("t")).head.getLong(0)
        Sampling.unimaxAllocation(docs, "lang", tc,
            budget = total / 2, epochCap = 2L)
          .orderBy(col("lang"))
      }): Q,
      Some("""WITH RECURSIVE sizes AS (SELECT lang,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS sz
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(sz) // 2 AS BIGINT) AS b FROM sizes),
        |ord AS (SELECT lang, sz,
        |  CAST(row_number() OVER (ORDER BY sz, lang) AS BIGINT) AS rn
        |  FROM sizes),
        |nl AS (SELECT CAST(count(*) AS BIGINT) AS l FROM ord),
        |a(rn, lang, sz, alloc, rem) AS (
        |  SELECT o.rn, o.lang, o.sz,
        |    least(o.sz * 2, t.b // (nl.l - o.rn + 1)),
        |    t.b - least(o.sz * 2, t.b // (nl.l - o.rn + 1))
        |  FROM ord o, tot t, nl WHERE o.rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.lang, o.sz,
        |    least(o.sz * 2, a.rem // (nl.l - o.rn + 1)),
        |    a.rem - least(o.sz * 2, a.rem // (nl.l - o.rn + 1))
        |  FROM a JOIN ord o ON o.rn = a.rn + 1 CROSS JOIN nl)
        |SELECT lang, sz, CAST(alloc AS BIGINT) AS alloc_tokens,
        |  CAST(alloc * 1000000 // sz AS BIGINT) AS epochs_e6
        |FROM a ORDER BY lang""".stripMargin)),

    // per-document cross-corpus duplication profile: share of gram
    // occurrences appearing in >= 2 documents + widest gram spread —
    // the dedup-audit forensic; grams travel as the same 64-bit md5
    // hashes the span/boilerplate rows use, rebuilt verbatim in SQL
    ("llm_text_crossdup",
      ((s: SparkSession, d: String) =>
        TextAnalysis.crossDocDuplication(Tables.documents(s, d), "text",
            "doc_id", k = 5, minDf = 2)
          .orderBy(col("doc_id"))): Q,
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id,
        |  (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |    * 4294967296 + lo AS h
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(md5(gram), 9, 8))::BIGINT AS lo
        |  FROM (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
        |          FROM toks)))),
        |occ AS (SELECT doc_id, h, count(*) AS c FROM g GROUP BY 1, 2),
        |dfreq AS (SELECT h, count(*) AS df FROM occ GROUP BY h)
        |SELECT occ.doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(floor(10000.0 * sum(CASE WHEN df >= 2 THEN c ELSE 0 END)
        |    / sum(c) + 0.5) AS BIGINT) AS dup_bp,
        |  CAST(max(df) AS BIGINT) AS max_gram_df
        |FROM occ JOIN dfreq USING (h)
        |GROUP BY occ.doc_id ORDER BY occ.doc_id""".stripMargin)),

    // temperature-scaled mixture (T = 2): shares ∝ √size — sqrt is the
    // one power IEEE requires correctly rounded (identical hardware op
    // in both engines), and the weight quantizes to an integer BEFORE
    // the normalizing sum, so allocation is exact integer arithmetic
    ("llm_mixture_temperature",
      ((s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val tc = TextAnalysis.tokenCount(col("text")).cast("long")
        val total = docs.agg(sum(tc).as("t")).head.getLong(0)
        Sampling.temperatureAllocation(docs, "lang", tc,
            budget = total / 2, sqrtSteps = 1)
          .orderBy(col("lang"))
      }): Q,
      Some("""WITH sizes AS (SELECT lang,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS sz
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(sz) // 2 AS BIGINT) AS b FROM sizes),
        |qw AS (SELECT lang, sz,
        |  CAST(floor(sqrt(CAST(sz AS DOUBLE)) * 1048576 + 0.5) AS BIGINT)
        |    AS q
        |  FROM sizes),
        |tq AS (SELECT CAST(sum(q) AS BIGINT) AS tq FROM qw)
        |SELECT lang, sz, q,
        |  CAST(q * tot.b // tq.tq AS BIGINT) AS alloc_tokens,
        |  CAST((q * tot.b // tq.tq) * 1000000 // sz AS BIGINT) AS epochs_e6
        |FROM qw CROSS JOIN tot CROSS JOIN tq ORDER BY lang""".stripMargin))
  )
}
