package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The pure-JVM PPM (P6) codec and the mediaFeatures decode plumbing. */
class MultimodalSpec extends SparkTestBase {

  test("PPM round trip: encode -> decode reproduces dims and exact means") {
    val img = Multimodal.decodePpm(Multimodal.ppmFixture(6L))
    assert(img.width == 4 + 6 % 5 && img.height == 3 + 6 % 4)
    val n = img.width * img.height
    val (mr, mg, mb) = img.meanRgb
    def law(a: Long, b: Long): Double =
      (0 until n).map(p => (6L * a + p * b) % 256).sum.toDouble / n
    assert(mr == law(7, 3) && mg == law(11, 5) && mb == law(13, 7))
  }

  test("PPM header: comments and arbitrary whitespace parse per netpbm") {
    val raster = Array.tabulate[Byte](6)(i => (i * 40).toByte)
    val bytes = ("P6 # comment after magic\n" +
      "# a full comment line\n 2\t1 # dims\n255\n").getBytes("US-ASCII") ++
      raster
    val img = Multimodal.decodePpm(bytes)
    assert(img.width == 2 && img.height == 1)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("PPM decode rejects malformed payloads with the failing condition") {
    val good = Multimodal.ppmFixture(0L)
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodePpm(b)).getMessage
    assert(msg("P5\n1 1\n255\n".getBytes ++ Array[Byte](1, 2, 3))
      .contains("not a P6"))
    assert(msg(good.dropRight(1)).contains("truncated raster"))
    assert(msg("P6\n1 1\n65535\n".getBytes ++ new Array[Byte](6))
      .contains("maxval 255"))
    assert(msg("P6\n255\n".getBytes ++ new Array[Byte](3))
      .contains("missing"))
  }

  test("mediaFeatures: real decode for images, nulls for corrupt/opaque") {
    val rows = Seq(
      Row(0L, "image", Multimodal.ppmFixture(0L)),
      Row(1L, "image", "P6 not really".getBytes("US-ASCII")), // corrupt
      Row(2L, "audio", Array[Byte](1, 2, 3)),
      Row(3L, "image", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val got = Multimodal.mediaFeatures(df).orderBy("media_id").collect()
    // decoded image: dims from the header, means from the raster
    assert(got(0).getInt(3) == 4 && got(0).getInt(4) == 3)
    assert(!got(0).isNullAt(5) && !got(0).isNullAt(7))
    // corrupt image: byte count survives, features null
    assert(got(1).getLong(2) == 13L && got(1).isNullAt(3) &&
      got(1).isNullAt(5))
    // corrupt audio (not RIFF): byte count survives, features null
    assert(got(2).getLong(2) == 3L && got(2).isNullAt(3) &&
      got(2).isNullAt(8) && got(2).isNullAt(11))
    // null payload: everything null but id/kind
    assert(got(3).isNullAt(2) && got(3).isNullAt(5))
  }

  test("WAV round trip: encode -> decode reproduces format and samples") {
    val a = Multimodal.decodeWav(Multimodal.wavFixture(7L))
    assert(a.sampleRate == 8000 && a.channels == 1)
    val n = (64 + 7 % 129).toInt
    assert(a.nSamples == n)
    val law = (0 until n).map(k => ((7L * 31 + k * 17L) % 4096 - 2048))
    assert(a.samples.toSeq.map(_.toLong) == law)
    assert(a.peakAbs == law.map(math.abs).max)
    assert(a.rms ==
      math.sqrt(law.map(s => s * s).sum.toDouble / n))
    assert(a.durationMs == n * 1000L / 8000)
  }

  test("WAV decode skips unknown chunks and rejects malformed payloads") {
    // LIST chunk of odd size (padded per RIFF) before fmt/data
    val base = Multimodal.encodeWav(8000, 1, Array[Short](1, -2, 3))
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0) // 3 bytes + pad
    val patched = java.nio.ByteBuffer
      .allocate(base.length + list.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 12).put(list).put(base, 12, base.length - 12).array()
    // fix the RIFF size field
    patched(4) = ((base.length + list.length - 8) & 0xff).toByte
    val a = Multimodal.decodeWav(patched)
    assert(a.samples.toSeq == Seq[Short](1, -2, 3))

    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodeWav(b)).getMessage
    assert(msg("RIFFxxxxWAVX".getBytes("US-ASCII")).contains("RIFF/WAVE"))
    assert(msg(base.take(20)).contains("overruns"))
    // 8-bit samples refused
    val bad8 = base.clone(); bad8(34) = 8
    assert(msg(bad8).contains("16-bit"))
  }

  test("frame sampling still explodes video rows in parallel") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    assert(frames.filter(col("frame_ms") % 1000 =!= 0).count() == 0L)
    assert(frames.count() > 0L)
  }
}
