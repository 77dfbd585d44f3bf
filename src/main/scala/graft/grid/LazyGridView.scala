package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lazy N-D view over a registered grid table — the reverse pivot's lazy
  * strategy (SURVEY §2A A12; reference ds.py:210-376 `SQLBackendArray`):
  * each indexer access derives a `filter(...).select(...)` DataFrame, so
  * the engine's zone-map pruning reads only the chunks the indexer
  * touches; materialization happens per access, never for the whole grid.
  *
  * Outer-indexing semantics as in the reference: int -> point, slice ->
  * contiguous range, int-array -> IN-list of coordinate values
  * (ds.py:293-376). Dims indexed at full extent emit no predicate at all
  * (ds.py's full-extent omission), keeping plans minimal.
  *
  * Coordinate extents come either from the registered store directly
  * (`fromStore` — the reference's pure-scan fast path, ds.py:435-505) or
  * from per-dim `SELECT DISTINCT d ORDER BY d` discovery queries
  * (`discoverCoords` — ds.py:530-543).
  */
final class LazyGridView(
    df: DataFrame,
    dims: Seq[(String, IndexedSeq[Any])],
    varCols: Seq[String]) {

  import LazyGridView._

  def dimNames: Seq[String] = dims.map(_._1)
  def shape: Seq[Int] = dims.map(_._2.size)

  /** Dense sub-grid for the given per-dim indexers (missing dims = full
    * extent). Triggers exactly one filtered scan.
    */
  def select(indexers: Map[String, Indexer]): GridResultData = {
    val selectedCoords: Seq[(String, IndexedSeq[Any])] = dims.map {
      case (name, coords) =>
        name -> (indexers.get(name) match {
          case None | Some(FullExtent) => coords
          case Some(Point(i)) => IndexedSeq(coords(i))
          case Some(Slice(from, until)) => coords.slice(from, until)
          case Some(Points(is)) => is.map(coords(_)).toIndexedSeq
        })
    }
    // IN-lists for every partial dim: correct for descending axes and
    // prunes identically to BETWEEN via the In zone-map rule
    val predicates: Seq[Column] = dims.zip(selectedCoords).flatMap {
      case ((name, full), (_, sel)) =>
        if (sel.size == full.size) None // full extent: no predicate
        else if (sel.size == 1) Some(col(name) === lit(sel.head))
        else Some(col(name).isin(sel: _*))
    }
    val filtered = predicates.foldLeft(df)((d, p) => d.filter(p))
      .select((dimNames ++ varCols).map(col): _*)
    GridResult.toGridWithTemplate(filtered, dimNames,
      selectedCoords.toMap, fillValue = Double.NaN)
  }

}

object LazyGridView {

  sealed trait Indexer
  case object FullExtent extends Indexer
  final case class Point(i: Int) extends Indexer
  final case class Slice(from: Int, until: Int) extends Indexer
  final case class Points(is: Seq[Int]) extends Indexer

  /** Fast path: coordinate extents straight from the registered store
    * (no discovery queries; preserves descending axis order).
    */
  def fromStore(df: DataFrame, store: GridStore, groupDims: Seq[String],
      varCols: Seq[String]): LazyGridView =
    new LazyGridView(df,
      groupDims.map { d =>
        val c = store.schema.dim(d).coords
        d -> (0 until c.size).map(externalCoord(c, _)).toIndexedSeq
      },
      varCols)

  /** Discovery path: per-dim DISTINCT queries against the DataFrame. */
  def discoverCoords(df: DataFrame, groupDims: Seq[String],
      varCols: Seq[String]): LazyGridView =
    new LazyGridView(df,
      groupDims.map { d =>
        d -> df.select(d).distinct().orderBy(d).collect()
          .map(_.get(0)).toIndexedSeq
      },
      varCols)

  /** External (Row-level) coordinate value at index i. */
  private[graft] def externalCoord(c: CoordArray, i: Int): Any = c match {
    case DoubleCoords(v) => v(i)
    case FloatCoords(v) => v(i)
    case IntCoords(v) => v(i)
    case LongCoords(v) => v(i)
    case TimeCoords(v) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(v(i))
    case DurationCoords(v) => // micros -> external java.time.Duration
      java.time.Duration.ofSeconds(v(i) / 1000000L,
        (v(i) % 1000000L) * 1000L)
    case StringCoords(v) => v(i)
  }
}
