package graft.sources

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._

/** Per-dimension coordinate bounds of one scan partition. */
sealed trait DimBounds extends Serializable
/** Numeric (double/float/int) coordinate bounds. */
final case class NumBounds(min: Double, max: Double) extends DimBounds
/** Long / timestamp-microseconds coordinate bounds — kept in Long so
  * microsecond epochs (> 2^53) prune exactly.
  */
final case class LongBounds(min: Long, max: Long) extends DimBounds
/** String coordinate bounds, min/max under UTF-8 BINARY byte order —
  * the order Spark's default UTF8_BINARY collation compares in (see
  * [[Utf8Order]]).
  */
final case class StrBounds(min: String, max: String) extends DimBounds

object StrBounds {
  /** Bounds of `v[start, start+len)` in UTF-8 binary order — the one
    * implementation both block-bounds builders share. Coordinates are
    * never null, so a null here is a loud contract error.
    */
  def of(v: Array[String], start: Int, len: Int): StrBounds =
    Utf8Order.minMax(v, start, len) match {
      case Some((mn, mx)) => StrBounds(mn, mx)
      case None => throw new IllegalArgumentException(
        "null or empty string coordinate slice")
    }
}

/** String comparison in UTF-8 unsigned-byte order — bit-identical to
  * Spark's `UTF8String.binaryCompare` (string literals reach Spark
  * through `UTF8String.fromString`, i.e. the same
  * `getBytes(StandardCharsets.UTF_8)` encoding, so even the unpaired-
  * surrogate replacement path matches). `String.compareTo` would
  * compare UTF-16 code units instead, which disagrees with Spark
  * outside the BMP — the reason string ordering used to stay residual.
  * Non-binary (ICU) collations never reach the source as bare
  * attribute filters: the collation cast on the column defeats V1
  * filter translation, so every pushed string comparison IS binary.
  */
object Utf8Order {
  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(bytes(a), bytes(b))

  /** Byte-prefix test == `UTF8String.startsWith` semantics. */
  def startsWith(s: String, prefix: String): Boolean = {
    val sb = bytes(s); val pb = bytes(prefix)
    pb.length <= sb.length &&
      java.util.Arrays.equals(sb, 0, pb.length, pb, 0, pb.length)
  }

  /** The smallest string strictly greater than EVERY string with this
    * prefix, in byte order: increment the last non-0xFF byte and drop
    * the tail. None when the prefix is all 0xFF bytes (or empty) — no
    * finite successor exists.
    */
  def prefixSuccessor(prefix: String): Option[String] = {
    val pb = bytes(prefix)
    var i = pb.length - 1
    while (i >= 0 && pb(i) == -1) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(pb, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(new String(out, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  /** Re-encode for successor comparisons: the successor string was
    * built byte-wise (ISO-8859-1 round-trip), so compare it byte-wise
    * against the same encoding.
    */
  def compareRaw(aIso: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      aIso.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), bytes(b))

  /** Cached-bytes min/max of `v[start, start+len)` — ONE UTF-8 encode
    * per element (a comparator-side encode would pay 4n); None when
    * any element is null (the all-values-known stats rule) or the
    * slice is empty.
    */
  def minMax(v: Array[String], start: Int,
      len: Int): Option[(String, String)] = {
    if (len <= 0) return None
    var mn = v(start)
    if (mn == null) return None
    var mx = mn
    var mnB = bytes(mn); var mxB = mnB
    var i = 1
    while (i < len) {
      val x = v(start + i)
      if (x == null) return None
      val xb = bytes(x)
      if (java.util.Arrays.compareUnsigned(xb, mnB) < 0) { mn = x; mnB = xb }
      if (java.util.Arrays.compareUnsigned(xb, mxB) > 0) { mx = x; mxB = xb }
      i += 1
    }
    Some((mn, mx))
  }
}

/** Min/max zone-map partition pruning: decide whether a pushed filter
  * PROVABLY excludes a partition given its per-dimension coordinate bounds.
  *
  * Re-expression of the reference's pruning semantics
  * (src/lib.rs:205-477 `filter_excludes_partition`): ops =,<,<=,>,>=,IN,
  * recursive AND/OR; everything else — including NOT and unknown
  * expressions — is conservative (never excludes). String dims prune
  * too, in UTF-8 binary order ([[StrBounds]]/[[Utf8Order]]) including
  * `LIKE 'p%'` prefix regions — beyond the reference, which skips
  * string bounds entirely (df.py:447-450). Spark re-applies all
  * filters row-level after the scan (filters are kept as residual), so
  * pruning only ever has to be sound, not complete.
  */
object ZoneMapPruning {

  /** True iff `filter` proves no row of a partition with `bounds` matches. */
  def excludes(filter: Filter, bounds: Map[String, DimBounds]): Boolean =
    filter match {
      case And(l, r) => excludes(l, bounds) || excludes(r, bounds)
      case Or(l, r) => excludes(l, bounds) && excludes(r, bounds)
      case EqualTo(a, v) =>
        cmp(a, v, bounds).exists { case (lo, hi) => lo > 0 || hi < 0 }
      case GreaterThan(a, v) => // col > v excluded iff max <= v
        cmp(a, v, bounds).exists { case (_, hi) => hi <= 0 }
      case GreaterThanOrEqual(a, v) =>
        cmp(a, v, bounds).exists { case (_, hi) => hi < 0 }
      case LessThan(a, v) => // col < v excluded iff min >= v
        cmp(a, v, bounds).exists { case (lo, _) => lo >= 0 }
      case LessThanOrEqual(a, v) =>
        cmp(a, v, bounds).exists { case (lo, _) => lo > 0 }
      case In(a, vs) =>
        vs.nonEmpty && vs.forall(v =>
          cmp(a, v, bounds).exists { case (lo, hi) => lo > 0 || hi < 0 })
      case IsNull(a) =>
        // dimension coordinates are never null; data vars have no bounds
        bounds.contains(a)
      case StringStartsWith(a, p) if p.nonEmpty =>
        // excluded iff the whole bound range sits before the prefix
        // region (max < p) or at/after its successor (min >= succ(p))
        bounds.get(a).exists {
          case StrBounds(mn, mx) =>
            Utf8Order.compare(mx, p) < 0 ||
              Utf8Order.prefixSuccessor(p)
                .exists(s => Utf8Order.compareRaw(s, mn) <= 0)
          case _ => false
        }
      case _ => false // Not / IsNotNull / unknown: conservative
    }

  /** True iff `filter` proves EVERY row of a partition with `bounds`
    * matches — the containment dual of `excludes`, used by the
    * metadata-count rewrite (a partition fully inside the predicate
    * region contributes its exact row count without being read).
    * Conservative: anything unprovable from bounds returns false.
    */
  def includes(filter: Filter, bounds: Map[String, DimBounds]): Boolean =
    filter match {
      case And(l, r) => includes(l, bounds) && includes(r, bounds)
      case Or(l, r) => includes(l, bounds) || includes(r, bounds)
      case EqualTo(a, v) =>
        cmp(a, v, bounds).exists { case (lo, hi) => lo == 0 && hi == 0 }
      case GreaterThan(a, v) => // all rows > v iff min > v
        cmp(a, v, bounds).exists { case (lo, _) => lo > 0 }
      case GreaterThanOrEqual(a, v) =>
        cmp(a, v, bounds).exists { case (lo, _) => lo >= 0 }
      case LessThan(a, v) =>
        cmp(a, v, bounds).exists { case (_, hi) => hi < 0 }
      case LessThanOrEqual(a, v) =>
        cmp(a, v, bounds).exists { case (_, hi) => hi <= 0 }
      case In(a, vs) => // provable only for a constant axis equal to a member
        vs.exists(v =>
          cmp(a, v, bounds).exists { case (lo, hi) => lo == 0 && hi == 0 })
      case IsNotNull(a) => bounds.contains(a) // dim coords are never null
      case StringStartsWith(a, p) if p.nonEmpty =>
        // every row matches iff the whole range lies inside the prefix
        // region: min >= p and max < succ(p)
        bounds.get(a).exists {
          case StrBounds(mn, mx) =>
            Utf8Order.compare(mn, p) >= 0 &&
              Utf8Order.prefixSuccessor(p)
                .exists(s => Utf8Order.compareRaw(s, mx) > 0)
          case _ => false
        }
      case _ => false
    }

  /** (sign(min - v), sign(max - v)) when the column has bounds and the
    * literal converts; None -> cannot prune on this predicate.
    */
  private def cmp(attr: String, value: Any,
      bounds: Map[String, DimBounds]): Option[(Int, Int)] =
    bounds.get(attr).flatMap {
      case NumBounds(min, max) =>
        toDouble(value).map(v =>
          (java.lang.Double.compare(min, v), java.lang.Double.compare(max, v)))
      case LongBounds(min, max) =>
        toLong(value).map(v =>
          (java.lang.Long.compare(min, v), java.lang.Long.compare(max, v)))
      case StrBounds(min, max) =>
        value match {
          case s: String =>
            Some((Utf8Order.compare(min, s), Utf8Order.compare(max, s)))
          case _ => None
        }
    }

  private def toDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  private def toLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
    case d: java.time.Duration => // timedelta coords are micros
      Some(d.getSeconds * 1000000L + d.getNano / 1000)
    case _ => None
  }
}
