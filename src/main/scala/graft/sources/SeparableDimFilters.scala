package graft.sources

import graft.grid._
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._

/** Separable-exact dimension predicates: conjunction trees in which every
  * leaf references exactly one dimension — ops `=,<,<=,>,>=,IN,
  * IS [NOT] NULL` plus `NOT` of any such subtree (OR allowed only within
  * a single dim). String dims participate with ALL of these ops plus
  * `LIKE 'p%'` prefixes: comparisons run in UTF-8 unsigned-byte order
  * ([[Utf8Order]]), bit-identical to Spark's default UTF8_BINARY
  * collation (`String.compareTo`'s UTF-16 unit order would disagree
  * outside the BMP, which is why ordering used to stay residual —
  * non-binary collations never arrive as bare attribute filters, so
  * every pushed comparison IS binary). `NOT` is exact here (unlike the
  * conservative zone-map NOT) because predicates are evaluated against
  * the actual coordinate values, where complement is complement.
  * For these trees the scan claims EXACT pushdown — each dimension gets
  * an independent surviving-index list, and the cross product of the
  * lists IS the matching cell set (the grid is dense):
  *
  *   - the reader enumerates only matching cells (no post-scan filter,
  *     no wasted pivot work);
  *   - planning drops any block where some dim's list is empty;
  *   - COUNT(*) under such a filter = product of per-dim list sizes, and
  *     MIN/MAX(dim) = extrema of that dim's list — pure metadata, no
  *     partition opened, chunk alignment irrelevant.
  *
  * Anything else (cross-dim OR, data-variable predicates, contains/
  * ends-with patterns) stays residual: Spark re-applies it row-level,
  * exactly the reference's Inexact contract (lib.rs:548-565). The
  * reference cannot prune string dims at all (df.py:447-450 skips
  * their bounds); exact index-list evaluation is a beyond-reference
  * win for station-style tables.
  */
object SeparableDimFilters {

  /** The single dim this filter (sub)tree references, if the tree is
    * separable-exact over that dim alone.
    */
  private def soleDim(f: Filter, schema: GridSchema,
      groupDims: Seq[String]): Option[String] = {
    def isStr(d: String): Boolean =
      schema.dim(d).coords.isInstanceOf[StringCoords]
    def dimOf(attr: String): Option[String] =
      if (groupDims.contains(attr)) Some(attr) else None
    // ordering + equality ops: string dims compare in UTF-8 binary
    // order (Utf8Order), numeric/time dims through litOk conversion
    def ordDim(attr: String, v: Any): Option[String] =
      dimOf(attr).filter(d =>
        if (isStr(d)) v.isInstanceOf[String] else litOk(v))
    def eqDim(attr: String, v: Any): Option[String] = ordDim(attr, v)
    f match {
      case And(l, r) => for {
        a <- soleDim(l, schema, groupDims)
        b <- soleDim(r, schema, groupDims) if a == b
      } yield a
      case Or(l, r) => for {
        a <- soleDim(l, schema, groupDims)
        b <- soleDim(r, schema, groupDims) if a == b
      } yield a
      case Not(c) => soleDim(c, schema, groupDims)
      case EqualTo(a, v) => eqDim(a, v)
      case GreaterThan(a, v) => ordDim(a, v)
      case GreaterThanOrEqual(a, v) => ordDim(a, v)
      case LessThan(a, v) => ordDim(a, v)
      case LessThanOrEqual(a, v) => ordDim(a, v)
      case In(a, vs) => dimOf(a).filter(d =>
        if (isStr(d)) vs.forall(_.isInstanceOf[String])
        else vs.forall(litOk))
      case StringStartsWith(a, _) => dimOf(a).filter(isStr)
      case IsNotNull(a) => dimOf(a)
      case IsNull(a) => dimOf(a)
      case _ => None
    }
  }

  private def litOk(v: Any): Boolean = v match {
    case _: java.lang.Number => true
    case _: java.sql.Timestamp => true
    case _: java.time.Instant => true
    case _: java.time.Duration => true
    case _ => false
  }

  /** True iff the whole filter is a conjunction of single-dim subtrees
    * (possibly over different dims) that `evalDim` can evaluate exactly.
    */
  def isSeparable(f: Filter, schema: GridSchema,
      groupDims: Seq[String]): Boolean = f match {
    case And(l, r) =>
      isSeparable(l, schema, groupDims) && isSeparable(r, schema, groupDims)
    case other => soleDim(other, schema, groupDims).isDefined
  }

  /** Collect the top-level conjuncts of `filters` grouped by dim. */
  private def conjunctsByDim(filters: Seq[Filter], schema: GridSchema,
      groupDims: Seq[String]): Map[String, Seq[Filter]] = {
    def split(f: Filter): Seq[Filter] = f match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    filters.flatMap(split)
      .flatMap(c => soleDim(c, schema, groupDims).map(_ -> c))
      .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2) }
  }

  /** Does coordinate value at `idx` of `dim` satisfy `f`? `f` must be a
    * single-dim separable subtree over `dim`. `value` is the coordinate
    * as Double (numeric axes), Long (time/duration/long axes) or String.
    */
  private def eval(f: Filter, value: Any): Boolean = {
    def cmpTo(lit: Any): Option[Int] = (value, lit) match {
      case (d: java.lang.Double, n: java.lang.Number) =>
        Some(java.lang.Double.compare(d, n.doubleValue()))
      case (l: java.lang.Long, t: java.sql.Timestamp) =>
        Some(java.lang.Long.compare(l, DateTimeUtils.fromJavaTimestamp(t)))
      case (l: java.lang.Long, i: java.time.Instant) =>
        Some(java.lang.Long.compare(l, DateTimeUtils.instantToMicros(i)))
      case (l: java.lang.Long, d: java.time.Duration) =>
        Some(java.lang.Long.compare(l,
          d.getSeconds * 1000000L + d.getNano / 1000))
      case (l: java.lang.Long, n: java.lang.Number) =>
        Some(java.lang.Long.compare(l, n.longValue()))
      // strings: UTF-8 binary order, == Spark's UTF8_BINARY collation
      case (s: String, t: String) => Some(Utf8Order.compare(s, t))
      case _ => None
    }
    f match {
      case And(l, r) => eval(l, value) && eval(r, value)
      case Or(l, r) => eval(l, value) || eval(r, value)
      // exact complement: evaluated on real coordinate values, so NOT
      // is sound here (only zone-map NOT must stay conservative)
      case Not(c) => !eval(c, value)
      case EqualTo(_, v) => cmpTo(v).contains(0)
      case GreaterThan(_, v) => cmpTo(v).exists(_ > 0)
      case GreaterThanOrEqual(_, v) => cmpTo(v).exists(_ >= 0)
      case LessThan(_, v) => cmpTo(v).exists(_ < 0)
      case LessThanOrEqual(_, v) => cmpTo(v).exists(_ <= 0)
      case In(_, vs) => vs.exists(v => cmpTo(v).contains(0))
      case StringStartsWith(_, p) => value match {
        // byte-prefix test == UTF8String.startsWith semantics
        case s: String => Utf8Order.startsWith(s, p)
        case _ => false
      }
      case IsNotNull(_) => true // dim coordinates are never null
      case IsNull(_) => false
      case _ => false // unreachable for separable trees; fail closed
    }
  }

  private def coordValue(coords: CoordArray, i: Int): Any =
    coords match {
      case DoubleCoords(v) => Double.box(v(i))
      case FloatCoords(v) => Double.box(v(i).toDouble)
      case IntCoords(v) => Double.box(v(i).toDouble)
      case LongCoords(v) => Long.box(v(i))
      case TimeCoords(v) => Long.box(v(i))
      case DurationCoords(v) => Long.box(v(i))
      case StringCoords(v) => v(i)
    }

  /** Dims that carry at least one separable conjunct in `filters` —
    * the dims whose surviving-index lists actually filter anything.
    */
  def predicatedDims(filters: Seq[Filter], schema: GridSchema,
      groupDims: Seq[String]): Set[String] =
    conjunctsByDim(filters, schema, groupDims).keySet

  /** Per-dim surviving ABSOLUTE coordinate indices within
    * [start, start+len) under the conjunction of all separable filters.
    * Dims without predicates survive in full.
    */
  def survivingIndices(filters: Seq[Filter], schema: GridSchema,
      groupDims: Seq[String], dim: String, start: Int,
      len: Int): Array[Int] = {
    val preds = conjunctsByDim(filters, schema, groupDims)
      .getOrElse(dim, Seq.empty)
    val coords = schema.dim(dim).coords
    if (preds.isEmpty) Array.range(start, start + len)
    else Array.range(start, start + len).filter(i =>
      preds.forall(p => eval(p, coordValue(coords, i))))
  }
}
