package graft.grid

import graft.SparkTestBase
import graft.sources.ReadCounters
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

/** Real Zarr v2 tree interop: write/open round trips, the v2 stored-chunk
  * rules (padded edges, missing-chunk fill, dimension separators, both
  * endiannesses), CF time decode, and the end-to-end registration with
  * chunk-open pruning pins.
  */
class ZarrGridStoreSpec extends SparkTestBase {

  private def tmp(): Path = {
    val p = Files.createTempDirectory("zarr_spec")
    p.toFile.deleteOnExit()
    p
  }

  private def put(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(UTF_8))
  }

  private def putBytes(root: Path, rel: String, bytes: Array[Byte]): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
  }

  test("write/open round trip preserves schema, coords and values") {
    val root = tmp().resolve("store").toString
    val src = Fixtures.linearGrid // t 24 (int), lat 12, lon 10 (double)
    val store = ZarrGridStore.write(src, root,
      Map("t" -> 6, "lat" -> 5), "zlib")
    assert(store.schema.dimNames == Seq("t", "lat", "lon"))
    assert(store.schema.dim("t").coords.isInstanceOf[IntCoords])
    assert(store.schema.dim("lat").coords.asInstanceOf[DoubleCoords]
      .values.sameElements(src.schema.dim("lat").coords
        .asInstanceOf[DoubleCoords].values))
    assert(store.schema.vars.map(_.name) == Seq("air"))
    assert(store.chunkMap == Map("t" -> 6, "lat" -> 5, "lon" -> 10))
    val full = Seq((0, 24), (0, 12), (0, 10))
    assert(store.readVar("air", full).asInstanceOf[Array[Double]]
      .sameElements(src.readVar("air", full).asInstanceOf[Array[Double]]))
    // ragged lat edge (12 = 5+5+2): stored files are PADDED to the full
    // chunk byte size per the v2 spec (zlib-compressed, so check decode)
    val edge = store.readVar("air", Seq((0, 6), (10, 2), (0, 10)))
      .asInstanceOf[Array[Double]]
    assert(edge.sameElements(
      src.readVar("air", Seq((0, 6), (10, 2), (0, 10)))
        .asInstanceOf[Array[Double]]))
    // unaligned multi-chunk slice assembles correctly
    val sl = Seq((4, 9), (3, 7), (2, 5))
    assert(store.readVar("air", sl).asInstanceOf[Array[Double]]
      .sameElements(src.readVar("air", sl).asInstanceOf[Array[Double]]))
  }

  test("compressor grammar: none, zstd, gzip round trip") {
    for (comp <- Seq("none", "zstd:3", "gzip")) {
      val root = tmp().resolve(s"c_${comp.replace(':', '_')}").toString
      val store = ZarrGridStore.write(Fixtures.maskGrid, root,
        Map("lat" -> 5), comp)
      val full = Seq((0, 12), (0, 10))
      assert(store.readVar("mask", full).asInstanceOf[Array[Double]]
        .sameElements(Fixtures.maskGrid.readVar("mask", full)
          .asInstanceOf[Array[Double]]), comp)
    }
    intercept[IllegalArgumentException] {
      ZarrGridStore.write(Fixtures.maskGrid,
        tmp().resolve("bad").toString, Map.empty, "lz77")
    }
  }

  test("hand-written tree: big-endian, / separator, fill_value, missing chunk") {
    val root = tmp()
    put(root, ".zgroup", """{"zarr_format":2}""")
    // 1-D coord x = [0,1,2,3] as <i4
    put(root, "x/.zarray",
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<i4",
        |"compressor":null,"fill_value":null,"order":"C","filters":null}"""
        .stripMargin)
    put(root, "x/.zattrs", """{"_ARRAY_DIMENSIONS":["x"]}""")
    val xb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach(xb.putInt)
    putBytes(root, "x/0", xb.array())
    // 2-D var v(x, y): BIG-endian f8, "/"-separated chunks of (2, 2),
    // y has NO coordinate array -> positional ints; chunk (1, 0)
    // missing -> fill_value 7.5
    put(root, "v/.zarray",
      """{"zarr_format":2,"shape":[4,3],"chunks":[2,2],"dtype":">f8",
        |"compressor":null,"fill_value":7.5,"order":"C","filters":null,
        |"dimension_separator":"/"}""".stripMargin)
    put(root, "v/.zattrs", """{"_ARRAY_DIMENSIONS":["x","y"],"units":"K"}""")
    def chunk(vals: Double*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      vals.foreach(bb.putDouble)
      bb.array()
    }
    // values v(i,j) = 10 i + j; edge chunks padded with anything (use -1)
    putBytes(root, "v/0/0", chunk(0, 1, 10, 11))
    putBytes(root, "v/0/1", chunk(2, -1, 12, -1))
    // v/1/0 deliberately MISSING (x rows 2-3, y cols 0-1)
    putBytes(root, "v/1/1", chunk(22, -1, 32, -1))
    val store = ZarrGridStore.open(root.toString)
    assert(store.schema.dimNames == Seq("x", "y"))
    assert(store.schema.dim("x").coords.asInstanceOf[IntCoords]
      .values.sameElements(Array(0, 1, 2, 3)))
    // y synthesized positionally
    assert(store.schema.dim("y").coords.asInstanceOf[IntCoords]
      .values.sameElements(Array(0, 1, 2)))
    assert(store.schema.vars.head.attrs("units") == "K")
    val got = store.readVar("v", Seq((0, 4), (0, 3)))
      .asInstanceOf[Array[Double]]
    assert(got.sameElements(Array[Double](
      0, 1, 2, 10, 11, 12, 7.5, 7.5, 22, 7.5, 7.5, 32)))
  }

  test("CF time axes decode through the two-tier calendar bridge") {
    val root = tmp()
    put(root, ".zgroup", """{"zarr_format":2}""")
    def coord(name: String, units: String, calendar: Option[String],
        offsets: Seq[Long]): Unit = {
      put(root, s"$name/.zarray",
        s"""{"zarr_format":2,"shape":[${offsets.length}],
           |"chunks":[${offsets.length}],"dtype":"<i8","compressor":null,
           |"fill_value":null,"order":"C","filters":null}""".stripMargin)
      val cal = calendar.map(c => s""","calendar":"$c"""").getOrElse("")
      put(root, s"$name/.zattrs",
        s"""{"_ARRAY_DIMENSIONS":["$name"],"units":"$units"$cal}""")
      val bb = java.nio.ByteBuffer.allocate(offsets.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      offsets.foreach(bb.putLong)
      putBytes(root, s"$name/0", bb.array())
    }
    coord("tn", "days since 2000-01-01", Some("noleap"), Seq(0L, 59L))
    coord("t3", "days since 2000-01-01", Some("360_day"), Seq(0L, 180L))
    coord("lead", "hours", None, Seq(0L, 6L))
    put(root, "v/.zarray",
      """{"zarr_format":2,"shape":[2,2,2],"chunks":[2,2,2],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C","filters":null}"""
        .stripMargin)
    put(root, "v/.zattrs", """{"_ARRAY_DIMENSIONS":["tn","t3","lead"]}""")
    putBytes(root, "v/0.0.0", {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 8).foreach(i => bb.putDouble(i))
      bb.array()
    })
    val store = ZarrGridStore.open(root.toString)
    // noleap (GregorianLike tier): real-timeline timestamps; offset 59
    // is 2000-03-01 in the calendar's own reckoning (no Feb 29)
    val tn = store.schema.dim("tn")
    assert(tn.calendar.contains("noleap"))
    assert(tn.coords.asInstanceOf[TimeCoords].values.sameElements(Array(
      graft.time.CfCalendar.offsetToMicros(0L, "days since 2000-01-01", "noleap"),
      graft.time.CfCalendar.gregorianMicros(2000, 3, 1))))
    // 360_day (NonGregorian tier): int64 offsets survive + metadata
    val t3 = store.schema.dim("t3")
    assert(t3.calendar.contains("360_day") &&
      t3.units.contains("days since 2000-01-01"))
    assert(t3.coords.asInstanceOf[LongCoords].values.sameElements(
      Array(0L, 180L)))
    // bare duration units -> day-time interval micros
    assert(store.schema.dim("lead").coords.asInstanceOf[DurationCoords]
      .values.sameElements(Array(0L, 6L * 3600000000L)))
  }

  test("timestamp and duration coordinates round trip through write") {
    val root = tmp().resolve("fc").toString
    val store = ZarrGridStore.write(Fixtures.forecastGrid, root,
      Map("lead" -> 2), "none")
    val src = Fixtures.forecastGrid.schema
    assert(store.schema.dim("time").coords.asInstanceOf[TimeCoords]
      .values.sameElements(
        src.dim("time").coords.asInstanceOf[TimeCoords].values))
    assert(store.schema.dim("lead").coords.asInstanceOf[DurationCoords]
      .values.sameElements(
        src.dim("lead").coords.asInstanceOf[DurationCoords].values))
  }

  test("malformed trees raise clear errors") {
    def bad(zarray: String,
        zattrs: String = """{"_ARRAY_DIMENSIONS":["x"]}"""): Throwable = {
      val root = tmp()
      put(root, ".zgroup", """{"zarr_format":2}""")
      put(root, "a/.zarray", zarray)
      put(root, "a/.zattrs", zattrs)
      intercept[IllegalArgumentException](ZarrGridStore.open(root.toString))
    }
    // every numcodecs blosc cname decodes now; a cname with NO JVM
    // implementation must still fail fast at open, not on an executor
    assert(bad(
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8",
        |"compressor":{"id":"blosc","cname":"lizard"},"fill_value":null,
        |"order":"C","filters":null}""".stripMargin)
      .getMessage.contains("lizard"))
    assert(bad( // F now decodes; anything else is still rejected
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"K","filters":null}"""
        .stripMargin).getMessage.contains("order"))
    assert(bad( // shuffle/delta now decode; others must still fail fast
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C",
        |"filters":[{"id":"fixedscaleoffset"}]}""".stripMargin)
      .getMessage.contains("filter"))
    assert(bad( // complex64 — still unsupported (u2/i2/u1/i1/u4 now decode)
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<c8",
        |"compressor":null,"fill_value":null,"order":"C","filters":null}"""
        .stripMargin).getMessage.contains("dtype"))
    assert(bad(
      """{"zarr_format":2,"shape":[4],"chunks":[4],"dtype":"<f8",
        |"compressor":null,"fill_value":null,"order":"C","filters":null}"""
        .stripMargin, zattrs = """{"units":"K"}""")
      .getMessage.contains("_ARRAY_DIMENSIONS"))
    // not a group at all
    val empty = tmp()
    assert(intercept[IllegalArgumentException](
      ZarrGridStore.open(empty.toString)).getMessage.contains(".zgroup"))
  }

  test("registered zarr store prunes chunk opens on a dim predicate") {
    val root = tmp().resolve("reg").toString
    val store = ZarrGridStore.write(Fixtures.linearGrid, root,
      Map("t" -> 6), "zlib")
    val df = new graft.XarrayContext(spark)
      .scratchDataFrame(s"zarr_prune@$root", store, store.chunkMap,
        Seq("t", "lat", "lon"))
    ReadCounters.reset()
    val rows = df.filter(col("t") >= 12)
      .agg(sum("air").as("s"), count(lit(1)).as("n")).collect()
    // t >= 12 keeps chunks 2 and 3 of 4: only their FILES open
    assert(ReadCounters.partitionsOpened.sum() == 2L)
    assert(rows.head.getLong(1) == 12L * 12 * 10)
    // exact value: sum over t in [12,24) of (200 + t + 2i + 3j)
    val expect = (for (t <- 12 until 24; i <- 0 until 12; j <- 0 until 10)
      yield 200.0 + t + 2.0 * i + 3.0 * j).sum
    assert(rows.head.getDouble(0) == expect)
  }
}
