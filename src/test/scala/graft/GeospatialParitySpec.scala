package graft

import graft.grid._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scala re-expression of the reference's geospatial benchmark suite
  * (benchmarks/geospatial/01..09), run as a correctness suite over the
  * grid DSv2 source — each case asserts against a directly computed
  * expectation, mirroring the reference's assert-vs-array discipline
  * (benchmarks/geospatial/_harness.py:205-243).
  *
  * Value laws are linear in the grid indices so expectations are closed
  * form, and — for the regrid/warp cases — bilinear interpolation of a
  * linear law is EXACT, so those compare with == rather than tolerance.
  */
class GeospatialParitySpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private lazy val ctx = new XarrayContext(spark)

  import GeospatialParitySpec._

  private def registerTwoVar(name: String): DataFrame = {
    val time = TimeCoords((0 until 8).map(Fixtures.hourlyMicros(15706, _, 1)).toArray)
    val y = DoubleCoords((0 until 6).map(i => 50.0 - 0.25 * i).toArray)
    val x = DoubleCoords((0 until 5).map(j => 10.0 + 0.25 * j).toArray)
    val schema = GridSchema(
      Seq(DimDef("time", time), DimDef("y", y), DimDef("x", x)),
      Seq(VarDef("nir", Seq("time", "y", "x"), GDouble),
        VarDef("red", Seq("time", "y", "x"), GDouble)))
    val store = SyntheticGridStore(schema,
      Map("nir" -> Lin(100, 1, 2, 3), "red" -> Lin(50, 2, 1, 1)))
    ctx.dataFrame(name, store, Map("time" -> 4), Seq("time", "y", "x"))
  }

  test("01 NDVI: per-pixel arithmetic over two variables") {
    val df = registerTwoVar("geo01")
    val got = df.select(col("time"), col("y"), col("x"),
      ((col("nir") - col("red")) / (col("nir") + col("red"))).as("ndvi"))
      .collect()
    assert(got.length == 8 * 6 * 5)
    got.foreach { r =>
      val nir = 100 + 1 * tIdx(r.getTimestamp(0).getTime) +
        2 * yIdx(r.getDouble(1)) + 3 * xIdx(r.getDouble(2))
      val red = 50 + 2 * tIdx(r.getTimestamp(0).getTime) +
        1 * yIdx(r.getDouble(1)) + 1 * xIdx(r.getDouble(2))
      assert(r.getDouble(3) == (nir - red).toDouble / (nir + red))
    }
  }

  test("02 climatology: GROUP BY hour-of-day mean") {
    val df = registerTwoVar("geo02")
    val got = df.groupBy(hour(col("time")).as("h"))
      .agg(avg("nir").as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // law is linear in t; each hour h occurs once (8 hourly steps)
    for (t <- 0 until 8) {
      val expected = (0 until 6).flatMap(i => (0 until 5).map(j =>
        (100 + t + 2 * i + 3 * j).toDouble)).sum / 30.0
      assert(got(t) == expected, s"hour $t")
    }
  }

  test("03 zonal mean: GROUP BY latitude profile") {
    val df = registerTwoVar("geo03")
    val got = df.groupBy(col("y")).agg(avg("red").as("m")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (i <- 0 until 6) {
      val expected = (0 until 8).flatMap(t => (0 until 5).map(j =>
        (50 + 2 * t + i + j).toDouble)).sum / 40.0
      assert(got(50.0 - 0.25 * i) == expected, s"lat index $i")
    }
  }

  test("04 anomaly: climatology CTE joined back (value - group mean)") {
    val df = registerTwoVar("geo04")
    val clim = df.groupBy("y", "x").agg(avg("nir").as("m"))
    val anom = df.join(clim, Seq("y", "x"))
      .select(col("time"), col("y"), col("x"),
        (col("nir") - col("m")).as("anom"))
      .collect()
    // linear in t with mean over t=0..7 -> anomaly = t - 3.5 exactly
    anom.foreach { r =>
      assert(r.getDouble(3) == tIdx(r.getTimestamp(0).getTime) - 3.5)
    }
  }

  test("05 forecast skill: join on valid = init + lead, RMSE by lead") {
    import spark.implicits._
    // forecasts: init time i (4 hourly), lead L in {1,2} hours;
    // truth: time t (6 hourly). forecast = truth(init+lead) + 0.5*L
    val truth = (0 until 6).map(t => (Fixtures.hourlyMicros(15706, t, 1),
      (20 + t).toDouble)).toDF("t_us", "truth")
    val fc = (for (i <- 0 until 4; l <- Seq(1, 2)) yield {
      val validT = 20 + i + l
      (Fixtures.hourlyMicros(15706, i, 1), l.toLong * 3600000000L,
        validT + 0.5 * l)
    }).toDF("init_us", "lead_us", "fc")
    val rmse = fc.join(truth, col("t_us") === col("init_us") + col("lead_us"))
      .groupBy(col("lead_us"))
      .agg(sqrt(avg((col("fc") - col("truth")) * (col("fc") - col("truth"))))
        .as("rmse"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // error = 0.5 * L by construction
    assert(rmse(3600000000L) == 0.5)
    assert(rmse(7200000000L) == 1.0)
  }

  test("06 zonal stats: raster x vector range join (broadcast NL join)") {
    val df = registerTwoVar("geo06")
    val regions = spark.createDataFrame(Seq(
      ("north", 49.9, 50.1), // y in {50.0}
      ("south", 48.5, 49.8)  // y in {48.75..49.75} = indices 1..5
    )).toDF("region", "y_min", "y_max")
    val joined = df.join(broadcast(regions),
      col("y").between(col("y_min"), col("y_max")))
      .groupBy("region").agg(count(lit(1)).as("cnt"), avg("nir").as("m"))
    val got = joined.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("north")._1 == 8L * 1 * 5)
    assert(got("south")._1 == 8L * 5 * 5)
    val expNorth = (for (t <- 0 until 8; j <- 0 until 5)
      yield (100 + t + 0 + 3 * j).toDouble).sum / 40.0
    assert(got("north")._2 == expNorth)
    val plan = joined.queryExecution.executedPlan
    joined.collect()
    assert(collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, s"expected broadcast NL join:\n$plan")
  }

  test("07 reprojection: struct-returning UDF with field access") {
    // affine stand-in for a CRS transform (thread-safe, deterministic);
    // the reference wraps PROJ the same single-call way (07_reproject_udf)
    val reproject = udf((x: Double, y: Double) =>
      (0.001 * x + 2.0, 0.001 * y - 1.0))
      .asNondeterministic() // mirror PROJ-call opacity; value still fixed
    val df = registerTwoVar("geo07")
      .withColumn("p", reproject(col("x"), col("y")))
      .select(col("x"), col("y"), col("p._1").as("lon"), col("p._2").as("lat"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == 0.001 * r.getDouble(0) + 2.0)
      assert(r.getDouble(3) == 0.001 * r.getDouble(1) - 1.0)
    }
  }

  test("08 regrid: bilinear weight-table join reproduces exact interpolation") {
    import spark.implicits._
    // source: 1-D profile v(i) = 10 + 4*i at coords s(i) = i (0..9)
    val src = (0 until 10).map(i => (i.toDouble, (10 + 4 * i).toDouble))
      .toDF("s", "v")
    // targets at fractional positions; 2 weights per target (linear interp)
    val targets = Seq(0.25, 3.5, 7.75)
    val weights = targets.flatMap { t =>
      val i0 = math.floor(t).toInt
      val f = t - i0
      Seq((t, i0.toDouble, 1.0 - f), (t, (i0 + 1).toDouble, f))
    }.toDF("tgt", "s", "w")
    val got = weights.join(src, "s")
      .groupBy("tgt").agg(sum(col("v") * col("w")).as("vi"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // linear law -> interpolation is exact: v(t) = 10 + 4 t
    targets.foreach(t => assert(got(t) == 10 + 4 * t, s"target $t"))
  }

  test("09 warp: reproject UDF into weight join (composition)") {
    import spark.implicits._
    // source profile in projected coordinate u: v(u) = 3 u, u = 0..9
    val src = (0 until 10).map(u => (u.toDouble, 3.0 * u)).toDF("u", "v")
    // target pixels in lon; inverse transform lon -> u = 4 * (lon - 2)
    val toU = udf((lon: Double) => 4.0 * (lon - 2.0))
    val targets = Seq(2.1, 2.8, 3.6).toDF("lon")
      .withColumn("u_pos", toU(col("lon")))
    // stencil weights from the fractional position (floor/ceil)
    val stencil = targets
      .withColumn("u0", floor(col("u_pos")))
      .withColumn("f", col("u_pos") - col("u0"))
      .select(col("lon"),
        explode(array(
          struct(col("u0").as("u"), (lit(1.0) - col("f")).as("w")),
          struct((col("u0") + 1).as("u"), col("f").as("w")))).as("sw"))
      .select(col("lon"), col("sw.u").cast("double").as("u"), col("sw.w").as("w"))
    val got = stencil.join(src, "u")
      .groupBy("lon").agg(sum(col("v") * col("w")).as("vi"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // exact for the linear law: v(lon) = 3 * 4 * (lon - 2)
    Seq(2.1, 2.8, 3.6).foreach { lon =>
      assert(math.abs(got(lon) - 12.0 * (lon - 2.0)) < 1e-9, s"lon $lon")
    }
  }
}

object GeospatialParitySpec {
  /** law = base + a*t + b*i + c*j over (time, y, x) indices. */
  final case class Lin(base: Int, a: Int, b: Int, c: Int) extends GridFun {
    def apply(idx: Array[Int]): Double =
      (base + a * idx(0) + b * idx(1) + c * idx(2)).toDouble
  }
  // index recovery from coordinate values used by the fixtures
  def tIdx(ms: Long): Int =
    ((ms - Fixtures.hourlyMicros(15706, 0, 1) / 1000) / 3600000L).toInt
  def yIdx(y: Double): Int = math.round((50.0 - y) / 0.25).toInt
  def xIdx(x: Double): Int = math.round((x - 10.0) / 0.25).toInt
}
