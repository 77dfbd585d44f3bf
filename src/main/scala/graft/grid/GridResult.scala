package graft.grid

import org.apache.spark.sql.{DataFrame, Row}

import scala.collection.mutable

/** Reverse pivot (eager): scatter a SQL result back into a dense N-D grid —
  * the Spark analogue of the reference's `to_dataset`
  * (xarray_sql/ds.py:150-207,379-432 `_materialize` /
  * `_scatter_batches_to_ndarray`).
  *
  * Semantics preserved from the reference:
  *   - the chosen `dims` columns become axes; coordinate order is
  *     first-appearance order, so `ORDER BY level DESC` carries through
  *     (ds.py:405-412, tests/test_ds.py:180-202);
  *   - remaining columns become dense double arrays (C-order over the dim
  *     axes), prefilled with NaN for cells the result does not cover;
  *   - duplicate cells (same dim-value tuple twice) are an error
  *     (ds.py:800-805).
  */
final case class GridResultData(
    dims: Seq[(String, IndexedSeq[Any])],
    vars: Map[String, Array[Double]]) {
  def shape: Seq[Int] = dims.map(_._2.size)
  def cellCount: Int = shape.product

  /** Value of `name` at the given per-dim coordinate indices. */
  def apply(name: String, idx: Int*): Double = {
    require(idx.length == dims.length)
    var flat = 0
    var k = 0
    while (k < idx.length) { flat = flat * dims(k)._2.size + idx(k); k += 1 }
    vars(name)(flat)
  }
}

object GridResult {

  /** Reverse pivot against a template's coordinate arrays: the result is
    * reindexed onto the FULL template grid (cells the query filtered away
    * keep `fillValue`) and the template's coordinate order is preserved —
    * the reference's `sparsity="template"` + `fill_value` semantics
    * (ds.py:676-684; int + NaN upcasts are the caller's choice of fill).
    * Rows whose dim values are not on the template grid are an error.
    */
  def toGridWithTemplate(df: DataFrame, dims: Seq[String],
      template: Map[String, IndexedSeq[Any]],
      fillValue: Double = Double.NaN): GridResultData =
    scatter(df, dims, Some(dims.map(template(_))), fillValue)

  def toGrid(df: DataFrame, dims: Seq[String]): GridResultData =
    scatter(df, dims, None, Double.NaN)

  private def scatter(df: DataFrame, dims: Seq[String],
      templateCoords: Option[Seq[IndexedSeq[Any]]],
      fillValue: Double): GridResultData = {
    val schema = df.schema
    val dimIdx = dims.map(schema.fieldIndex)
    val varCols = schema.fieldNames.filterNot(dims.contains).toSeq
    val varIdx = varCols.map(schema.fieldIndex)

    val rows: Array[Row] = df.collect()

    // template coords if given, else first-appearance coordinate order
    val coordIndex: Seq[mutable.LinkedHashMap[Any, Int]] = templateCoords match {
      case Some(tc) =>
        tc.map { coords =>
          val m = mutable.LinkedHashMap.empty[Any, Int]
          coords.foreach(v => m.put(v, m.size))
          m
        }
      case None =>
        val ms = dims.map(_ => mutable.LinkedHashMap.empty[Any, Int])
        rows.foreach { r =>
          dimIdx.zip(ms).foreach { case (ci, m) =>
            val v = r.get(ci)
            if (!m.contains(v)) m.put(v, m.size)
          }
        }
        ms
    }
    if (templateCoords.isDefined) rows.foreach { r =>
      dims.indices.foreach { k =>
        require(coordIndex(k).contains(r.get(dimIdx(k))),
          s"value ${r.get(dimIdx(k))} of dim ${dims(k)} not on the template grid")
      }
    }
    val shape = coordIndex.map(_.size)
    val n = shape.product
    val data = varCols.map(_ -> Array.fill(n)(fillValue)).toMap
    val seen = new Array[Boolean](math.max(n, 1))

    rows.foreach { r =>
      var flat = 0
      var k = 0
      while (k < dims.length) {
        flat = flat * shape(k) + coordIndex(k)(r.get(dimIdx(k)))
        k += 1
      }
      require(!seen(flat),
        s"duplicate cell for dim tuple ${dims.map(d => r.get(schema.fieldIndex(d))).mkString(",")}")
      seen(flat) = true
      varCols.indices.foreach { vi =>
        val v = r.get(varIdx(vi))
        if (v != null)
          data(varCols(vi))(flat) = v match {
            case d: Double => d
            case f: Float => f.toDouble
            case i: Int => i.toDouble
            case l: Long => l.toDouble
            case x: java.math.BigDecimal => x.doubleValue()
            case other => throw new IllegalArgumentException(
              s"non-numeric result column ${varCols(vi)}: $other")
          }
      }
    }
    GridResultData(
      dims.zip(coordIndex.map(_.keys.toIndexedSeq)),
      data)
  }
}
