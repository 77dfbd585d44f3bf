package graft.sources

import graft.grid._
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._

/** Separable-exact dimension predicates: conjunction trees in which every
  * leaf references exactly one non-string dimension with ops
  * `=,<,<=,>,>=,IN,IS [NOT] NULL` (OR allowed only within a single dim).
  * For these the scan can claim EXACT pushdown — each dimension gets an
  * independent surviving-index list, and the cross product of the lists
  * IS the matching cell set (the grid is dense):
  *
  *   - the reader enumerates only matching cells (no post-scan filter,
  *     no wasted pivot work);
  *   - planning drops any block where some dim's list is empty;
  *   - COUNT(*) under such a filter = product of per-dim list sizes, and
  *     MIN/MAX(dim) = extrema of that dim's list — pure metadata, no
  *     partition opened, chunk alignment irrelevant.
  *
  * Anything else (cross-dim OR, NOT, data-variable predicates, string
  * dims) stays residual: Spark re-applies it row-level, exactly the
  * reference's Inexact contract (lib.rs:548-565).
  */
object SeparableDimFilters {

  /** The single non-string dim this filter (sub)tree references, if the
    * tree is separable-exact over that dim alone.
    */
  private def soleDim(f: Filter, schema: GridSchema,
      groupDims: Seq[String]): Option[String] = {
    def dimOf(attr: String): Option[String] =
      if (groupDims.contains(attr) &&
        !schema.dim(attr).coords.isInstanceOf[StringCoords]) Some(attr)
      else None
    f match {
      case And(l, r) => for {
        a <- soleDim(l, schema, groupDims)
        b <- soleDim(r, schema, groupDims) if a == b
      } yield a
      case Or(l, r) => for {
        a <- soleDim(l, schema, groupDims)
        b <- soleDim(r, schema, groupDims) if a == b
      } yield a
      case EqualTo(a, v) if litOk(v) => dimOf(a)
      case GreaterThan(a, v) if litOk(v) => dimOf(a)
      case GreaterThanOrEqual(a, v) if litOk(v) => dimOf(a)
      case LessThan(a, v) if litOk(v) => dimOf(a)
      case LessThanOrEqual(a, v) if litOk(v) => dimOf(a)
      case In(a, vs) if vs.forall(litOk) => dimOf(a)
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
    * single-dim separable subtree over `dim`.
    */
  private def eval(f: Filter, value: Either[Double, Long]): Boolean = {
    def cmpTo(lit: Any): Option[Int] = (value, lit) match {
      case (Left(d), n: java.lang.Number) =>
        Some(java.lang.Double.compare(d, n.doubleValue()))
      case (Right(l), t: java.sql.Timestamp) =>
        Some(java.lang.Long.compare(l, DateTimeUtils.fromJavaTimestamp(t)))
      case (Right(l), i: java.time.Instant) =>
        Some(java.lang.Long.compare(l, DateTimeUtils.instantToMicros(i)))
      case (Right(l), d: java.time.Duration) =>
        Some(java.lang.Long.compare(l,
          d.getSeconds * 1000000L + d.getNano / 1000))
      case (Right(l), n: java.lang.Number) =>
        Some(java.lang.Long.compare(l, n.longValue()))
      case _ => None
    }
    f match {
      case And(l, r) => eval(l, value) && eval(r, value)
      case Or(l, r) => eval(l, value) || eval(r, value)
      case EqualTo(_, v) => cmpTo(v).contains(0)
      case GreaterThan(_, v) => cmpTo(v).exists(_ > 0)
      case GreaterThanOrEqual(_, v) => cmpTo(v).exists(_ >= 0)
      case LessThan(_, v) => cmpTo(v).exists(_ < 0)
      case LessThanOrEqual(_, v) => cmpTo(v).exists(_ <= 0)
      case In(_, vs) => vs.exists(v => cmpTo(v).contains(0))
      case IsNotNull(_) => true // dim coordinates are never null
      case IsNull(_) => false
      case _ => false // unreachable for separable trees; fail closed
    }
  }

  private def coordValue(coords: CoordArray, i: Int): Either[Double, Long] =
    coords match {
      case DoubleCoords(v) => Left(v(i))
      case FloatCoords(v) => Left(v(i).toDouble)
      case IntCoords(v) => Left(v(i).toDouble)
      case LongCoords(v) => Right(v(i))
      case TimeCoords(v) => Right(v(i))
      case DurationCoords(v) => Right(v(i))
      case StringCoords(_) => throw new IllegalStateException(
        "string dims are never separable-pushed")
    }

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
