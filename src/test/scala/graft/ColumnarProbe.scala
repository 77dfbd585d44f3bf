package graft

import graft.grid._
import org.apache.spark.sql.functions._

/** Ad-hoc throughput probe: columnar vs row-mode grid scan on the same
  * 10^7-cell grid. Row mode is forced by a separable dim filter that
  * keeps 999/1000 time steps (enumerating readers are row-based), so
  * both paths read ~the same cells. Run with
  * `sbt "Test/runMain graft.ColumnarProbe"`; numbers land in
  * docs/DESIGN_NOTES.md.
  */
object ColumnarProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val time = TimeCoords((0 until 1000).map(k =>
      (18262L + k) * 86400000000L).toArray)
    val lat = DoubleCoords((0 until 100).map(i => -90.0 + 1.8 * i).toArray)
    val lon = DoubleCoords((0 until 100).map(j => -180.0 + 3.6 * j).toArray)
    val store = SyntheticGridStore(
      GridSchema(
        Seq(DimDef("time", time), DimDef("lat", lat), DimDef("lon", lon)),
        Seq(VarDef("temperature", Seq("time", "lat", "lon"), GDouble))),
      Map("temperature" -> ScaleSmokeSpec.IntLaw()))
    val ctx = new XarrayContext(spark)
    val df = ctx.dataFrame("colprobe", store, Map("time" -> 25),
      Seq("time", "lat", "lon"))
    val t0 = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(18262L * 86400L))

    def timeIt(label: String)(body: => Unit): Double = {
      body // warm
      val times = (1 to 3).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }
      val med = times.sorted.apply(1)
      println(f"$label: $med%.2f s (median of 3)")
      med
    }

    val colSec = timeIt("columnar full scan agg") {
      df.agg(sum("temperature")).collect()
    }
    val row = timeIt("row-mode scan agg (999/1000 time steps)") {
      df.filter(col("time") =!= t0).agg(sum("temperature")).collect()
    }
    println(f"columnar/row ratio: ${colSec / row}%.2f (row path reads 99.9%% of cells)")
    spark.stop()
  }
}
