package graft.grid

/** Array-backed store: full C-order data arrays held in memory — the
  * bridge from a reverse-pivoted `GridResultData` back into the engine
  * (grid -> SQL -> grid -> store round trips). `readVar` serves arbitrary
  * aligned slices by strided copy.
  */
final case class ArrayGridStore(schema: GridSchema,
    data: Map[String, Array[Double]]) extends GridStore {

  def readVar(name: String, ranges: Seq[(Int, Int)]): AnyRef = {
    val v = schema.vars.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown var $name"))
    val full = data(name)
    val dimSizes = v.dims.map(d => schema.dim(d).size).toArray
    val lens = ranges.map(_._2).toArray
    val starts = ranges.map(_._1).toArray
    val n = lens.product
    val out = new Array[Double](n)
    val idx = new Array[Int](lens.length)
    var i = 0
    while (i < n) {
      var rem = i
      var flat = 0
      var k = 0
      // decompose i into block-local indices (C-order) and rebuild the
      // flat index into the full array
      k = lens.length - 1
      while (k >= 0) { idx(k) = rem % lens(k); rem /= lens(k); k -= 1 }
      k = 0
      while (k < lens.length) {
        flat = flat * dimSizes(k) + (starts(k) + idx(k)); k += 1
      }
      out(i) = full(flat)
      i += 1
    }
    out
  }
}

object ArrayGridStore {

  /** Lift a reverse-pivot result back into a queryable store. Coordinate
    * types are inferred from the scattered values; all data variables are
    * doubles (the reverse pivot's representation).
    */
  def fromResult(res: GridResultData): ArrayGridStore = {
    val dims = res.dims.map { case (name, coords) =>
      DimDef(name, coordsOf(name, coords))
    }
    val varDefs = res.vars.keys.toSeq.sorted.map(v =>
      VarDef(v, dims.map(_.name), GDouble))
    ArrayGridStore(GridSchema(dims, varDefs), res.vars)
  }

  /** Template metadata recovery (reference ds.py:72-147): coordinates and
    * data come from the reverse-pivot result, while dataset attrs, and
    * per-dim / per-var attrs + calendar/units, are restored from the
    * template schema — the round trip keeps the xarray metadata SQL
    * cannot carry. (Data arrays stay doubles, the reverse pivot's
    * representation; attrs record the original encoding.)
    */
  def fromResult(res: GridResultData, template: GridSchema): ArrayGridStore = {
    val dims = res.dims.map { case (name, coords) =>
      val t = template.dims.find(_.name == name)
      DimDef(name, coordsOf(name, coords),
        calendar = t.flatMap(_.calendar), units = t.flatMap(_.units),
        attrs = t.map(_.attrs).getOrElse(Map.empty))
    }
    val varDefs = res.vars.keys.toSeq.sorted.map { v =>
      val t = template.vars.find(_.name == v)
      VarDef(v, dims.map(_.name), GDouble,
        attrs = t.map(_.attrs).getOrElse(Map.empty))
    }
    ArrayGridStore(GridSchema(dims, varDefs, template.attrs), res.vars)
  }

  private def coordsOf(name: String, values: IndexedSeq[Any]): CoordArray =
    values.headOption match {
      case Some(_: java.lang.Double) =>
        DoubleCoords(values.map(_.asInstanceOf[Double]).toArray)
      case Some(_: java.lang.Float) =>
        FloatCoords(values.map(_.asInstanceOf[Float]).toArray)
      case Some(_: java.lang.Integer) =>
        IntCoords(values.map(_.asInstanceOf[Int]).toArray)
      case Some(_: java.lang.Long) =>
        LongCoords(values.map(_.asInstanceOf[Long]).toArray)
      case Some(t: java.sql.Timestamp) =>
        TimeCoords(values.map(v =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp])).toArray)
      case Some(_: java.time.Duration) =>
        DurationCoords(values.map { v =>
          val d = v.asInstanceOf[java.time.Duration]
          d.getSeconds * 1000000L + d.getNano / 1000
        }.toArray)
      case Some(_: String) =>
        StringCoords(values.map(_.asInstanceOf[String]).toArray)
      case other => throw new IllegalArgumentException(
        s"cannot infer coord type of dim $name from $other")
    }
}
