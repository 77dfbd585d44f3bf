package graft.grid

/** Deterministic synthetic grid fixtures mirroring the reference's test
  * datasets (FIXTURES.md; reference tests/conftest.py). Every value law is
  * a pure function of global indices so tests can recompute expectations
  * directly and executors regenerate chunk data locally.
  */
object Fixtures {

  /** Microseconds for `2013-01-01 + k * stepHours`. */
  def hourlyMicros(startDay: Long, k: Int, stepHours: Int): Long =
    (startDay * 86400L + k.toLong * stepHours * 3600L) * 1000000L

  /** Value law of the canonical air grid (FIXTURES.md §1). */
  final case class AirLaw(latOf: Int => Double) extends GridFun {
    def apply(idx: Array[Int]): Double = {
      val t = idx(0); val i = idx(1); val j = idx(2)
      280.0 + 25.0 * math.sin(2 * math.Pi * t / 12.0) -
        0.5 * math.abs(latOf(i)) + ((t * 73 + i * 31 + j * 7) % 17) * 0.1
    }
  }

  /** `air_small`: 12 x 11 x 10 (time, lat desc 75->50, lon asc) grid. */
  def airSmall: SyntheticGridStore = {
    val time = TimeCoords((0 until 12).map(hourlyMicros(15706, _, 6)).toArray)
    val lat = DoubleCoords((0 until 11).map(i => 75.0 - 2.5 * i).toArray)
    val lon = DoubleCoords((0 until 10).map(j => 200.0 + 2.5 * j).toArray)
    val latOf = (i: Int) => 75.0 - 2.5 * i
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lat", lat), DimDef("lon", lon)),
        Seq(VarDef("air", Seq("time", "lat", "lon"), GDouble))),
      Map("air" -> AirLaw(latOf)))
  }

  final case class LinearLaw(a: Double, b: Double, c: Double, base: Double)
    extends GridFun {
    def apply(idx: Array[Int]): Double =
      base + a * idx(0) + b * idx(1) + c * idx(2)
  }

  /** Integer-index grid with an exactly-representable linear value law —
    * the oracle can recompute it in SQL with bit-identical doubles.
    * dims: t (int 0..23), lat (75 - 2.5 i, 12), lon (200 + 2.5 j, 10).
    */
  def linearGrid: SyntheticGridStore = {
    val t = IntCoords((0 until 24).toArray)
    val lat = DoubleCoords((0 until 12).map(i => 75.0 - 2.5 * i).toArray)
    val lon = DoubleCoords((0 until 10).map(j => 200.0 + 2.5 * j).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("t", t), DimDef("lat", lat), DimDef("lon", lon)),
        Seq(VarDef("air", Seq("t", "lat", "lon"), GDouble))),
      Map("air" -> LinearLaw(1.0, 2.0, 3.0, 200.0)))
  }

  /** base + sum(coef(k) * idx(k)) over any rank. */
  final case class AffineLaw(base: Double, coef: Seq[Double]) extends GridFun {
    def apply(idx: Array[Int]): Double = {
      var s = base
      var k = 0
      while (k < idx.length) { s += coef(k) * idx(k); k += 1 }
      s
    }
  }

  /** [[linearGrid]] restricted to global t in [t0, t1): the value law
    * keeps GLOBAL indices (the local t index is shifted into the base),
    * so slices written/appended separately reassemble the exact full
    * grid. The append-ingest fixture.
    */
  def linearGridSlice(t0: Int, t1: Int): SyntheticGridStore = {
    val t = IntCoords((t0 until t1).toArray)
    val lat = DoubleCoords((0 until 12).map(i => 75.0 - 2.5 * i).toArray)
    val lon = DoubleCoords((0 until 10).map(j => 200.0 + 2.5 * j).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("t", t), DimDef("lat", lat), DimDef("lon", lon)),
        Seq(VarDef("air", Seq("t", "lat", "lon"), GDouble))),
      Map("air" -> LinearLaw(1.0, 2.0, 3.0, 200.0 + t0)))
  }

  /** 2-D (lat, lon) land-mask fixture sharing [[linearGrid]]'s spatial
    * coordinates: cell (i, j) is land (1.0) iff (3i + j) % 5 < 3 —
    * integer arithmetic the oracle replays exactly. The second dataset
    * of the grid-x-grid join query (apply a static mask to a time
    * cube), the reference's multi-dataset registration shape
    * (sql.py:105-125 registers many datasets into one context).
    */
  def maskGrid: SyntheticGridStore = {
    val lat = DoubleCoords((0 until 12).map(i => 75.0 - 2.5 * i).toArray)
    val lon = DoubleCoords((0 until 10).map(j => 200.0 + 2.5 * j).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("lat", lat), DimDef("lon", lon)),
        Seq(VarDef("mask", Seq("lat", "lon"), GDouble))),
      Map("mask" -> MaskLaw))
  }

  case object MaskLaw extends GridFun {
    def apply(idx: Array[Int]): Double =
      if ((3 * idx(0) + idx(1)) % 5 < 3) 1.0 else 0.0
  }

  /** Non-Gregorian (360_day) calendar fixture: one CF year of daily int64
    * offsets ("days since 2000-01-01", calendar=360_day) x 4 latitudes.
    * Dyadic value law -> bit-identical recomputation in the oracle.
    * Mirrors the reference's 360_day test dataset (tests/test_sql.py:252-325).
    */
  def cal360Grid: SyntheticGridStore = {
    val time = LongCoords((0L until 360L).toArray)
    val lat = DoubleCoords((0 until 4).map(i => 10.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(
          DimDef("time", time, calendar = Some("360_day"),
            units = Some("days since 2000-01-01")),
          DimDef("lat", lat)),
        Seq(VarDef("temp", Seq("time", "lat"), GDouble))),
      Map("temp" -> AffineLaw(100.0, Seq(0.5, 3.0))))
  }

  /** Julian-calendar fixture: 120 daily int64 offsets ("days since
    * 1900-01-01", calendar=julian) x 4 latitudes. The ref year 1900 is
    * the discriminating case — a leap year in the julian reckoning but
    * NOT in the Gregorian one — so `cftime('1900-03-01')` = 31+29 = 60
    * exercises the julian leap arithmetic end-to-end (a Gregorian
    * bridge would give 59 and shift every row). Mirrors the
    * reference's julian coverage (xarray_sql/cftime.py:33-47,
    * tests/test_sql.py:252-325). Dyadic value law for oracle parity.
    */
  def julianGrid: SyntheticGridStore = {
    val time = LongCoords((0L until 120L).toArray)
    val lat = DoubleCoords((0 until 4).map(i => 10.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(
          DimDef("time", time, calendar = Some("julian"),
            units = Some("days since 1900-01-01")),
          DimDef("lat", lat)),
        Seq(VarDef("temp", Seq("time", "lat"), GDouble))),
      Map("temp" -> AffineLaw(100.0, Seq(0.5, 3.0))))
  }

  /** Noleap-calendar fixture: 120 daily offsets ("days since
    * 2000-01-01", calendar=noleap) x 4 latitudes, bridged onto the
    * real timeline as timestamps (the GregorianLike tier,
    * reference cftime.py:33-47). The year 2000 is a REAL leap year
    * with no Feb 29 in the noleap reckoning, so offset 59 decodes to
    * 2000-03-01 — the discriminator that catches a naive
    * epoch + 86400*offset bridge (which would land on Feb 29 and
    * shift the Mar-1 filter boundary by a row). Dyadic value law for
    * oracle parity.
    */
  def noleapGrid: SyntheticGridStore = {
    val micros = (0L until 120L).map(o => graft.time.CfCalendar
      .offsetToMicros(o, "days since 2000-01-01", "noleap")).toArray
    val lat = DoubleCoords((0 until 4).map(i => 10.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(
          DimDef("time", TimeCoords(micros), calendar = Some("noleap"),
            units = Some("days since 2000-01-01")),
          DimDef("lat", lat)),
        Seq(VarDef("temp", Seq("time", "lat"), GDouble))),
      Map("temp" -> AffineLaw(100.0, Seq(0.5, 3.0))))
  }

  /** Nonzero-UTC-offset CF units end-to-end: hourly offsets whose
    * reference instant is LOCAL +01:00 ("hours since 2000-01-01
    * 00:00:00 +01:00" = 1999-12-31T23:00Z after the cftime-style
    * tz-aware->UTC fold) — the CMIP/CORDEX archive shape that was a
    * loud reject before round 12. Dyadic value law for oracle parity.
    */
  def cfOffsetGrid: SyntheticGridStore = {
    val units = "hours since 2000-01-01 00:00:00 +01:00"
    val micros = (0L until 96L).map(o => graft.time.CfCalendar
      .offsetToMicros(o, units, "standard")).toArray
    val lat = DoubleCoords((0 until 4).map(i => 10.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(
          DimDef("time", TimeCoords(micros),
            calendar = Some("standard"), units = Some(units)),
          DimDef("lat", lat)),
        Seq(VarDef("temp", Seq("time", "lat"), GDouble))),
      Map("temp" -> AffineLaw(100.0, Seq(0.5, 3.0))))
  }

  /** All-leap-calendar fixture: 119 daily offsets ("days since
    * 2000-01-01", calendar=all_leap) x 4 latitudes, bridged onto the
    * real timeline (GregorianLike tier, reference cftime.py:33-47).
    * The offsets span all_leap year 2001 (366..485) MINUS offset 425 —
    * all_leap's 2001-02-29, which does not exist on the real timeline
    * and would throw at decode (CfTimeSpec pins the throw). Because
    * the skipped calendar day exactly cancels the real timeline's
    * missing Feb 29, the surviving coordinates decode to 119
    * CONSECUTIVE real days from 2001-01-01 — while a naive
    * epoch + 86400*offset bridge shifts every offset >= 426 one day
    * late, mispairing time with the index-keyed value law. Dyadic
    * value law for oracle parity.
    */
  def allLeapGrid: SyntheticGridStore = {
    val offsets = (366L until 486L).filterNot(_ == 425L)
    val micros = offsets.map(o => graft.time.CfCalendar
      .offsetToMicros(o, "days since 2000-01-01", "all_leap")).toArray
    val lat = DoubleCoords((0 until 4).map(i => 10.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(
          DimDef("time", TimeCoords(micros), calendar = Some("all_leap"),
            units = Some("days since 2000-01-01")),
          DimDef("lat", lat)),
        Seq(VarDef("temp", Seq("time", "lat"), GDouble))),
      Map("temp" -> AffineLaw(100.0, Seq(0.5, 3.0))))
  }

  /** Station fixture: a string-coordinate dimension (8 stations) x 10
    * daily timestamps. String dims are queryable but carry no pruning
    * bounds (reference df.py:447-450; station table in
    * tests/test_sql.py:137-152). Dyadic value law for oracle parity.
    */
  def stationGrid: SyntheticGridStore = {
    val station = StringCoords((0 until 8).map(i => s"st_$i").toArray)
    val time = TimeCoords((0 until 10).map(k => (18262L + k) * 86400000000L).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("station", station), DimDef("time", time)),
        Seq(VarDef("reading", Seq("station", "time"), GDouble))),
      Map("reading" -> AffineLaw(100.0, Seq(7.0, 0.25))))
  }

  /** [[stationGrid]] plus a STRING data variable — the shape zarr-python
    * 3 writes with `data_type: "string"` + the vlen-utf8 codec. quality
    * cycles good/ok/bad by (i + t) % 3 (pure index arithmetic the
    * oracle replays exactly); reading keeps the dyadic numeric law.
    */
  final case class StationQualityStore() extends GridStore {
    val schema: GridSchema = GridSchema(
      Seq(
        DimDef("station", StringCoords((0 until 8).map(i => s"st_$i").toArray)),
        DimDef("time",
          TimeCoords((0 until 10).map(k => (18262L + k) * 86400000000L).toArray))),
      Seq(
        VarDef("quality", Seq("station", "time"), GString),
        VarDef("reading", Seq("station", "time"), GDouble)))

    private val labels = Array("good", "ok", "bad")

    def readVar(name: String, ranges: Seq[(Int, Int)]): AnyRef = {
      val Seq((i0, ni), (t0, nt)) = ranges
      name match {
        case "quality" =>
          val out = new Array[String](ni * nt)
          for (i <- 0 until ni; t <- 0 until nt)
            out(i * nt + t) = labels((i0 + i + t0 + t) % 3)
          out
        case "reading" =>
          val out = new Array[Double](ni * nt)
          for (i <- 0 until ni; t <- 0 until nt)
            out(i * nt + t) = 100.0 + 7.0 * (i0 + i) + 0.25 * (t0 + t)
          out
        case other =>
          throw new IllegalArgumentException(s"unknown var $other")
      }
    }
  }

  def stationQualityGrid: StationQualityStore = StationQualityStore()

  /** STRING data variable with per-25-step-chunk-CONSTANT values
    * ("g0".."g3") over time(100) x lat(5) — each chunk's stats collapse
    * to exact (gk, gk) bounds, so string predicates prune through the
    * value-stats sidecar (the string analogue of [[pruneGrid]]) — plus
    * a numeric `reading` (t + 10i, integer-exact) so string-filtered
    * metadata SUMs have something to sum.
    */
  final case class GradeStore() extends GridStore {
    val schema: GridSchema = GridSchema(
      Seq(
        DimDef("time", TimeCoords((0 until 100).map(k =>
          (18262L + k) * 86400000000L).toArray)),
        DimDef("lat", DoubleCoords((0 until 5).map(10.0 * _).toArray))),
      Seq(
        VarDef("grade", Seq("time", "lat"), GString),
        VarDef("reading", Seq("time", "lat"), GDouble)))
    def readVar(name: String, ranges: Seq[(Int, Int)]): AnyRef = {
      val Seq((t0, nt), (i0, ni)) = ranges
      name match {
        case "grade" =>
          val out = new Array[String](nt * ni)
          for (t <- 0 until nt; i <- 0 until ni)
            out(t * ni + i) = s"g${(t0 + t) / 25}"
          out
        case "reading" =>
          val out = new Array[Double](nt * ni)
          for (t <- 0 until nt; i <- 0 until ni)
            out(t * ni + i) = (t0 + t) + 10.0 * (i0 + i)
          out
        case other => throw new IllegalArgumentException(s"unknown var $other")
      }
    }
  }

  def gradeGrid: GradeStore = GradeStore()

  /** Forecast-skill fixture: init time (4 x 6-hourly from 2021-01-01) x
    * prediction lead (6 x 6-hour day-time intervals) — the reference's
    * `prediction_timedelta` coordinate
    * (benchmarks/geospatial/05_forecast_skill.py:158-171).
    */
  def forecastGrid: SyntheticGridStore = {
    val time = TimeCoords((0 until 4).map(hourlyMicros(18628L, _, 6)).toArray)
    val lead = DurationCoords(
      (0 until 6).map(l => l * 6L * 3600L * 1000000L).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lead", lead)),
        Seq(VarDef("fc", Seq("time", "lead"), GDouble))),
      Map("fc" -> AffineLaw(10.0, Seq(1.0, 0.25))))
  }

  final case class PruneLaw() extends GridFun {
    def apply(idx: Array[Int]): Double = idx(0) * 10.0 + idx(1)
  }

  /** Pruning fixture (FIXTURES.md §4): time = 100 daily steps from
    * 2020-01-01, lat = 5 points -90..90; chunks time=25 -> 4 partitions.
    */
  def pruneGrid: SyntheticGridStore = {
    val day0 = 18262L // 2020-01-01 in days since epoch
    val time = TimeCoords((0 until 100).map(k => (day0 + k) * 86400000000L).toArray)
    val lat = DoubleCoords((0 until 5).map(i => -90.0 + 45.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lat", lat)),
        Seq(VarDef("temperature", Seq("time", "lat"), GDouble))),
      Map("temperature" -> PruneLaw()))
  }

  /** scale * idx(0)² — a variable NONLINEAR in the leading dim, for
    * correlation/trend fixtures where a linear law would degenerate to
    * |r| = 1.
    */
  final case class QuadLaw(scale: Double) extends GridFun {
    def apply(idx: Array[Int]): Double = scale * idx(0) * idx(0)
  }

  final case class TwoVarLaw(scale: Double) extends GridFun {
    def apply(idx: Array[Int]): Double = scale * (idx(0) * 5 + idx(1))
  }

  /** Projection fixture (FIXTURES.md §5): two co-dimensional variables;
    * asserts single-variable SELECT never reads the other.
    */
  def twoVarGrid: SyntheticGridStore = {
    val time = TimeCoords((0 until 10).map(k => (18262L + k) * 86400000000L).toArray)
    val lat = DoubleCoords((0 until 5).map(i => -90.0 + 45.0 * i).toArray)
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lat", lat)),
        Seq(
          VarDef("temperature", Seq("time", "lat"), GDouble),
          VarDef("precipitation", Seq("time", "lat"), GDouble))),
      Map("temperature" -> TwoVarLaw(1.0), "precipitation" -> TwoVarLaw(0.5)))
  }

  /** Hand-author a FOREIGN zarr v2 tree with a raw `<M8[ns]` datetime64
    * time coordinate (what plain zarr-python emits for a numpy
    * datetime64 array — no CF units attribute) and an f8 data variable:
    * time[24] hourly from 2021-01-01, temp = 15 + 0.5*k, chunks t=6.
    * Exercises the M8 decode (ns -> µs), TimeCoords surfacing and
    * zone-map pruning on a tree this engine did not write.
    */
  def writeM8Tree(root: String): Unit = {
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    GridIO.writeString(s"$root/.zgroup", """{"zarr_format":2}""", conf)
    GridIO.mkdirs(s"$root/time", conf)
    GridIO.writeString(s"$root/time/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[24],"dtype":"<M8[ns]",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/time/.zattrs",
      """{"_ARRAY_DIMENSIONS":["time"]}""", conf)
    val tb = java.nio.ByteBuffer.allocate(24 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val epoch2021ns = 1609459200L * 1000000000L
    (0 until 24).foreach(k => tb.putLong(epoch2021ns + k * 3600L * 1000000000L))
    GridIO.write(s"$root/time/0", tb.array(), conf)
    GridIO.mkdirs(s"$root/temp", conf)
    GridIO.writeString(s"$root/temp/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[6],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/temp/.zattrs",
      """{"_ARRAY_DIMENSIONS":["time"]}""", conf)
    (0 until 4).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(6 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach(j => vb.putDouble(15.0 + 0.5 * (c * 6 + j)))
      GridIO.write(s"$root/temp/$c", vb.array(), conf)
    }
    ZarrGridStore.consolidate(root, conf)
  }

  /** [[writeM8Tree]] plus an `obs` data variable of dtype `<M8[ns]`
    * (a timestamp-valued OBSERVATION column, chunks t=6) with NaT —
    * numpy's missing-time marker, Long.MinValue — at hours where
    * k % 7 == 3. Exercises the NaT -> SQL NULL surface on data
    * variables (coordinate NaT stays a loud error).
    */
  def writeM8NatTree(root: String): Unit = {
    writeM8Tree(root)
    val conf = GridIO.driverConf()
    GridIO.mkdirs(s"$root/obs", conf)
    GridIO.writeString(s"$root/obs/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[6],"dtype":"<M8[ns]",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/obs/.zattrs",
      """{"_ARRAY_DIMENSIONS":["time"]}""", conf)
    val epoch2021ns = 1609459200L * 1000000000L
    (0 until 4).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(6 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach { j =>
        val k = c * 6 + j
        vb.putLong(if (k % 7 == 3) Long.MinValue
        else epoch2021ns + k * 3600L * 1000000000L + 90L * 1000000000L)
      }
      GridIO.write(s"$root/obs/$c", vb.array(), conf)
    }
    ZarrGridStore.consolidate(root, conf)
  }

  /** rioxarray-style tree: t[6] axis, temp(t) = 15+k with a
    * grid_mapping attr, and the ubiquitous 0-d `spatial_ref` CRS
    * variable (int64 4326 + crs_wkt attr) — the shape practically
    * every georeferenced zarr archive has.
    */
  def writeRioTree(root: String): Unit = {
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    GridIO.writeString(s"$root/.zgroup", """{"zarr_format":2}""", conf)
    GridIO.mkdirs(s"$root/t", conf)
    GridIO.writeString(s"$root/t/.zarray",
      """{"zarr_format":2,"shape":[6],"chunks":[6],"dtype":"<i8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/t/.zattrs",
      """{"_ARRAY_DIMENSIONS":["t"]}""", conf)
    val tb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(k => tb.putLong(k.toLong))
    GridIO.write(s"$root/t/0", tb.array(), conf)
    GridIO.mkdirs(s"$root/temp", conf)
    GridIO.writeString(s"$root/temp/.zarray",
      """{"zarr_format":2,"shape":[6],"chunks":[3],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/temp/.zattrs",
      """{"_ARRAY_DIMENSIONS":["t"],"grid_mapping":"spatial_ref"}""",
      conf)
    (0 until 2).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 3).foreach(j => vb.putDouble(15.0 + c * 3 + j))
      GridIO.write(s"$root/temp/$c", vb.array(), conf)
    }
    GridIO.mkdirs(s"$root/spatial_ref", conf)
    GridIO.writeString(s"$root/spatial_ref/.zarray",
      """{"zarr_format":2,"shape":[],"chunks":[],"dtype":"<i8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/spatial_ref/.zattrs",
      """{"_ARRAY_DIMENSIONS":[],
        |"crs_wkt":"GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"]]"}"""
        .stripMargin, conf)
    val sb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.putLong(4326L)
    GridIO.write(s"$root/spatial_ref/0", sb.array(), conf)
    ZarrGridStore.consolidate(root, conf)
  }

  /** Foreign tree with a numpy-bool (`|b1`) mask variable over the
    * same t[24] axis as [[writeM8Tree]]'s layout: mask = 1 where
    * k % 3 == 0, plus f8 temp = 15 + 0.5*k. The land/sea-mask shape.
    */
  def writeBoolMaskTree(root: String): Unit = {
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    GridIO.writeString(s"$root/.zgroup", """{"zarr_format":2}""", conf)
    GridIO.mkdirs(s"$root/t", conf)
    GridIO.writeString(s"$root/t/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[24],"dtype":"<i8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/t/.zattrs",
      """{"_ARRAY_DIMENSIONS":["t"]}""", conf)
    val tb = java.nio.ByteBuffer.allocate(24 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(k => tb.putLong(k.toLong))
    GridIO.write(s"$root/t/0", tb.array(), conf)
    GridIO.mkdirs(s"$root/mask", conf)
    GridIO.writeString(s"$root/mask/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[6],"dtype":"|b1",
        |"compressor":null,"fill_value":false,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/mask/.zattrs",
      """{"_ARRAY_DIMENSIONS":["t"]}""", conf)
    (0 until 4).foreach { c =>
      val mb = new Array[Byte](6)
      (0 until 6).foreach(j =>
        mb(j) = if ((c * 6 + j) % 3 == 0) 1.toByte else 0.toByte)
      GridIO.write(s"$root/mask/$c", mb, conf)
    }
    GridIO.mkdirs(s"$root/temp", conf)
    GridIO.writeString(s"$root/temp/.zarray",
      """{"zarr_format":2,"shape":[24],"chunks":[6],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/temp/.zattrs",
      """{"_ARRAY_DIMENSIONS":["t"]}""", conf)
    (0 until 4).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(6 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach(j => vb.putDouble(15.0 + 0.5 * (c * 6 + j)))
      GridIO.write(s"$root/temp/$c", vb.array(), conf)
    }
    ZarrGridStore.consolidate(root, conf)
  }

  /** Foreign tree with a CF-ENCODED time DATA variable (what xarray's
    * to_zarr emits for a datetime64 data var): `obs` is int64
    * "seconds since 2021-01-01" offsets with `_FillValue` -999 at
    * hours where k % 7 == 3, over an int `t` axis 0..23; `temp` f8.
    */
  def writeCfTimeVarTree(root: String): Unit = {
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    GridIO.writeString(s"$root/.zgroup", """{"zarr_format":2}""", conf)
    def arr(name: String, dtype: String, chunks: Int, attrs: String): Unit = {
      GridIO.mkdirs(s"$root/$name", conf)
      GridIO.writeString(s"$root/$name/.zarray",
        s"""{"zarr_format":2,"shape":[24],"chunks":[$chunks],
           |"dtype":"$dtype","compressor":null,"fill_value":null,
           |"order":"C","filters":null}""".stripMargin, conf)
      GridIO.writeString(s"$root/$name/.zattrs", attrs, conf)
    }
    arr("t", "<i8", 24, """{"_ARRAY_DIMENSIONS":["t"]}""")
    val tb = java.nio.ByteBuffer.allocate(24 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 24).foreach(k => tb.putLong(k.toLong))
    GridIO.write(s"$root/t/0", tb.array(), conf)
    arr("obs", "<i8", 6,
      """{"_ARRAY_DIMENSIONS":["t"],
        |"units":"seconds since 2021-01-01","_FillValue":-999}"""
        .stripMargin)
    (0 until 4).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(6 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach { j =>
        val k = c * 6 + j
        vb.putLong(if (k % 7 == 3) -999L else k * 3600L + 90L)
      }
      GridIO.write(s"$root/obs/$c", vb.array(), conf)
    }
    arr("temp", "<f8", 6, """{"_ARRAY_DIMENSIONS":["t"]}""")
    (0 until 4).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(6 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 6).foreach(j => vb.putDouble(15.0 + 0.5 * (c * 6 + j)))
      GridIO.write(s"$root/temp/$c", vb.array(), conf)
    }
    ZarrGridStore.consolidate(root, conf)
  }

  /** Hand-author a foreign zarr v2 tree with a `<u8` (uint64) data
    * variable: i[10] int64 coordinate, cnt = 2^40 + 3*i — values past
    * Int but comfortably below Long.Max (the overflow guard is pinned
    * separately in the spec with a high-bit value).
    */
  def writeU8Tree(root: String): Unit = {
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    GridIO.writeString(s"$root/.zgroup", """{"zarr_format":2}""", conf)
    GridIO.mkdirs(s"$root/i", conf)
    GridIO.writeString(s"$root/i/.zarray",
      """{"zarr_format":2,"shape":[10],"chunks":[10],"dtype":"<i8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/i/.zattrs",
      """{"_ARRAY_DIMENSIONS":["i"]}""", conf)
    val ib = java.nio.ByteBuffer.allocate(10 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 10).foreach(k => ib.putLong(k.toLong))
    GridIO.write(s"$root/i/0", ib.array(), conf)
    GridIO.mkdirs(s"$root/cnt", conf)
    GridIO.writeString(s"$root/cnt/.zarray",
      """{"zarr_format":2,"shape":[10],"chunks":[5],"dtype":"<u8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":null}""".stripMargin, conf)
    GridIO.writeString(s"$root/cnt/.zattrs",
      """{"_ARRAY_DIMENSIONS":["i"]}""", conf)
    (0 until 2).foreach { c =>
      val vb = java.nio.ByteBuffer.allocate(5 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 5).foreach(j =>
        vb.putLong((1L << 40) + 3L * (c * 5 + j)))
      GridIO.write(s"$root/cnt/$c", vb.array(), conf)
    }
    ZarrGridStore.consolidate(root, conf)
  }

  /** Mixed-dims fixture (FIXTURES.md §8): surface var over (time, lat) +
    * pressure var over (time, lat, level) — registers as two tables.
    */
  def mixedDims: SyntheticGridStore = {
    val time = TimeCoords((0 until 2).map(k => (18262L + k) * 86400000000L).toArray)
    val lat = DoubleCoords(Array(0.0, 10.0, 20.0))
    val level = IntCoords(Array(500, 1000))
    SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lat", lat), DimDef("level", level)),
        Seq(
          VarDef("t2m", Seq("time", "lat"), GDouble),
          VarDef("pressure", Seq("time", "lat", "level"), GDouble))),
      Map("t2m" -> TwoVarLaw(2.0), "pressure" -> PruneLaw()))
  }
}
