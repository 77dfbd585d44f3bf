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

/** Min/max zone-map partition pruning: decide whether a pushed filter
  * PROVABLY excludes a partition given its per-dimension coordinate bounds.
  *
  * Re-expression of the reference's pruning semantics
  * (src/lib.rs:205-477 `filter_excludes_partition`): ops =,<,<=,>,>=,IN,
  * recursive AND/OR; everything else — including NOT and unknown
  * expressions — is conservative (never excludes). String dims carry no
  * bounds (reference df.py:447-450). Spark re-applies all filters
  * row-level after the scan (filters are kept as residual), so pruning
  * only ever has to be sound, not complete.
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
      case _ => false // Not / IsNotNull / string ops / unknown: conservative
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
