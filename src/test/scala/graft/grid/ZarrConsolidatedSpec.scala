package graft.grid

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Consolidated-metadata (`.zmetadata`) open path: one metadata read
  * instead of a listing walk, identical results to the unconsolidated
  * open, and the writer/retrofit that produces it.
  */
class ZarrConsolidatedSpec extends AnyFunSuite {

  private def tmp(): Path = {
    val p = Files.createTempDirectory("zarr_consol")
    p.toFile.deleteOnExit()
    p
  }

  private def freshTree(): String = {
    val root = tmp().resolve("store").toString
    ZarrGridStore.write(Fixtures.linearGrid, root,
      Map("t" -> 6, "lat" -> 5), "zlib")
    root
  }

  test("open on a consolidated tree costs exactly one metadata read") {
    val root = freshTree() // write() consolidates
    val conf = GridIO.driverConf()
    GridIO.Counters.reset()
    val store = ZarrGridStore.open(root)
    // 1 exists(.zmetadata) + 1 HEAD on the stats manifest (its
    // open-time version key — per-var stats loads verify against it so
    // a concurrent append can never serve post-append sums to this
    // handle's extent); 3 extra reads are the eager coordinate DATA
    // chunks (t, lat, lon) + 1 the stats manifest. No directory
    // listing, no per-array metadata round trips.
    assert(GridIO.Counters.existChecks.sum() == 2L)
    assert(GridIO.Counters.reads.sum() == 1L + 3L + 1L)
    assert(GridIO.Counters.lists.sum() == 0L)
    assert(store.schema.dimNames == Seq("t", "lat", "lon"))
    assert(store.schema.vars.map(_.name) == Seq("air"))
  }

  test("consolidated and listed opens produce identical stores") {
    val root = freshTree()
    val consolidated = ZarrGridStore.open(root)
    // strip .zmetadata -> the listing fallback path
    Files.delete(java.nio.file.Paths.get(root, ".zmetadata"))
    GridIO.Counters.reset()
    val listed = ZarrGridStore.open(root)
    assert(GridIO.Counters.lists.sum() >= 1L) // proves fallback ran
    // coords hold Arrays (reference equality) -> compare structurally
    def coordSeq(c: CoordArray): Seq[Any] = c match {
      case IntCoords(v) => v.toSeq
      case LongCoords(v) => v.toSeq
      case DoubleCoords(v) => v.toSeq
      case FloatCoords(v) => v.toSeq
      case TimeCoords(v) => v.toSeq
      case DurationCoords(v) => v.toSeq
      case StringCoords(v) => v.toSeq
    }
    assert(listed.schema.dimNames == consolidated.schema.dimNames)
    listed.schema.dims.zip(consolidated.schema.dims).foreach {
      case (l, c) =>
        assert(coordSeq(l.coords) == coordSeq(c.coords), l.name)
        assert(l.calendar == c.calendar && l.units == c.units &&
          l.attrs == c.attrs, l.name)
    }
    assert(listed.schema.vars == consolidated.schema.vars)
    assert(listed.schema.attrs == consolidated.schema.attrs)
    // NaN fill_value defeats case-class == (unboxed NaN != NaN)
    assert(listed.arrays.keySet == consolidated.arrays.keySet)
    listed.arrays.foreach { case (k, l) =>
      val c = consolidated.arrays(k)
      assert(l.copy(fillValue = 0) == c.copy(fillValue = 0), k)
      assert(l.fillValue.equals(c.fillValue), k)
    }
    val full = Seq((0, 24), (0, 12), (0, 10))
    assert(consolidated.readVar("air", full).asInstanceOf[Array[Double]]
      .sameElements(listed.readVar("air", full).asInstanceOf[Array[Double]]))
  }

  test("consolidate() retrofits a tree missing .zmetadata") {
    val root = freshTree()
    Files.delete(java.nio.file.Paths.get(root, ".zmetadata"))
    ZarrGridStore.consolidate(root)
    val json = Files.readString(java.nio.file.Paths.get(root, ".zmetadata"))
    assert(json.contains("\"zarr_consolidated_format\":1"))
    assert(json.contains("air/.zarray"))
    GridIO.Counters.reset()
    val store = ZarrGridStore.open(root)
    assert(GridIO.Counters.lists.sum() == 0L)
    val full = Seq((0, 24), (0, 12), (0, 10))
    assert(store.readVar("air", full).asInstanceOf[Array[Double]]
      .sameElements(Fixtures.linearGrid.readVar("air", full)
        .asInstanceOf[Array[Double]]))
  }

  test("writeDistributed produces a byte-identical tree to write") {
    // needs an active session for the executor-side path
    val spark = graft.SparkTestBase.spark
    assert(spark.sparkContext.defaultParallelism >= 1)
    val serial = freshTree()
    val distRoot = tmp().resolve("dist").toString
    val dist = ZarrGridStore.writeDistributed(Fixtures.linearGrid, distRoot,
      Map("t" -> 6, "lat" -> 5), "zlib")
    // same values back
    val full = Seq((0, 24), (0, 12), (0, 10))
    assert(dist.readVar("air", full).asInstanceOf[Array[Double]]
      .sameElements(ZarrGridStore.open(serial)
        .readVar("air", full).asInstanceOf[Array[Double]]))
    // same FILES: every chunk + metadata byte-identical (deterministic
    // encode; proves the executor path is the same write, just moved)
    def walk(r: String): Map[String, Seq[Byte]] = {
      val base = java.nio.file.Paths.get(r)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => base.relativize(p).toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
    val a = walk(serial)
    val b = walk(distRoot)
    assert(a.keySet == b.keySet, a.keySet.diff(b.keySet))
    a.keys.foreach(k => assert(a(k) == b(k), s"file $k differs"))
  }

  test("writeFromRows: rows scatter to a byte-identical zarr tree") {
    val spark = graft.SparkTestBase.spark
    val rows = new graft.XarrayContext(spark).scratchDataFrame(
      "zfr_src", Fixtures.linearGrid, Map("t" -> 6),
      Seq("t", "lat", "lon"))
    val viaRows = tmp().resolve("rows").toString
    ZarrGridStore.writeFromRows(rows, Fixtures.linearGrid.schema,
      Map("t" -> 6, "lat" -> 5), viaRows, "zlib")
    val viaStore = tmp().resolve("store").toString
    ZarrGridStore.write(Fixtures.linearGrid, viaStore,
      Map("t" -> 6, "lat" -> 5), "zlib")
    def walk(r: String): Map[String, Seq[Byte]] = {
      val base = java.nio.file.Paths.get(r)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => base.relativize(p).toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
    val a = walk(viaRows)
    val b = walk(viaStore)
    assert(a.keySet == b.keySet, a.keySet.diff(b.keySet))
    a.keys.foreach(k => assert(a(k) == b(k), s"file $k differs"))
  }

  test("malformed consolidated metadata raises clear errors") {
    val root = freshTree()
    val zm = java.nio.file.Paths.get(root, ".zmetadata")
    Files.writeString(zm, """{"zarr_consolidated_format":9,"metadata":{}}""")
    assert(intercept[IllegalArgumentException](ZarrGridStore.open(root))
      .getMessage.contains("zarr_consolidated_format"))
    // only nested (subgroup) arrays at the root: the error names the
    // subgroups and points at the group-opening surface
    Files.writeString(zm,
      """{"zarr_consolidated_format":1,
        |"metadata":{".zgroup":{"zarr_format":2},
        |"g/sub/.zarray":{"zarr_format":2}}}""".stripMargin)
    val e = intercept[IllegalArgumentException](ZarrGridStore.open(root))
    assert(e.getMessage.contains("subgroups (g)"), e.getMessage)
  }
}
