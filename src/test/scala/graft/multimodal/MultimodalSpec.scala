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

  test("GFV1 round trip: encode -> decode reproduces frames and laws") {
    val id = 5L // nf = 2 + 5%4 = 3, w = 4, h = 3
    val v = Multimodal.decodeVideo(Multimodal.videoFixture(id))
    assert(v.nFrames == 3 && v.frameMs == 40 && v.durationMs == 120L)
    assert(v.width == (4 + id % 5) && v.height == (3 + id % 4))
    val n = v.width * v.height
    // per-frame decoded pixels follow the fixture laws exactly
    for (f <- 0 until v.nFrames; p <- 0 until n) {
      assert((v.frames(f).raster(3 * p) & 0xff) ==
        (id * 7 + p * 3 + f * 19) % 256)
      assert((v.frames(f).raster(3 * p + 2) & 0xff) ==
        (id * 13 + p * 7 + f * 29) % 256)
    }
    // sampled mean (every 2nd frame: f = 0, 2) matches the law
    val sampled = Seq(0, 2)
    def law(a: Long, b: Long, c: Long): Double =
      sampled.flatMap(f => (0 until n).map(p =>
        (id * a + p * b + f * c) % 256)).sum.toDouble / (sampled.size * n)
    val (mr, mg, mb) = v.sampledMeanRgb(2)
    assert(mr == law(7, 3, 19) && mg == law(11, 5, 23) &&
      mb == law(13, 7, 29))
  }

  test("GFV1 decode rejects malformed payloads with the failing condition") {
    def msg(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Multimodal.decodeVideo(b)).getMessage
    assert(msg("GFV2........".getBytes("US-ASCII")).contains("not a GFV1"))
    val good = Multimodal.videoFixture(5L)
    assert(msg(good.dropRight(1)).contains("truncated raster"))
    // frame count pointing past the payload
    val overrun = good.clone(); overrun(4) = 9
    assert(msg(overrun).contains("not a P6"))
    // mismatched frame dimensions
    val mixed = Multimodal.encodeVideo(40, Seq(
      Multimodal.encodePpm(2, 1, _ => (0, 0, 0)),
      Multimodal.encodePpm(1, 2, _ => (0, 0, 0))))
    assert(msg(mixed).contains("expected 2x1"))
  }

  test("videoFrames: real per-frame decode, sampled stride, corrupt dropped") {
    val rows = Seq(
      Row(2L, "video", Multimodal.videoFixture(2L)), // nf = 4 -> f = 0, 2
      Row(5L, "video", Multimodal.videoFixture(5L)), // nf = 3 -> f = 0, 2
      Row(7L, "video", "GFV1 nope".getBytes("US-ASCII")), // corrupt
      Row(9L, "image", Multimodal.ppmFixture(9L))) // wrong kind
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val got = Multimodal.videoFrames(df, everyK = 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((2L, 0), (2L, 2), (5L, 0), (5L, 2)))
    // frame 2 of clip 2: mean_r law over w*h = 6*5 = 30 pixels
    val f2 = got(1)
    assert(f2.getLong(2) == 80L && f2.getInt(3) == 6 && f2.getInt(4) == 5)
    val n = 30
    assert(f2.getDouble(5) ==
      (0 until n).map(p => (2L * 7 + p * 3 + 2 * 19) % 256).sum.toDouble / n)
  }

  test("frame sampling still explodes video rows in parallel") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    assert(frames.filter(col("frame_ms") % 1000 =!= 0).count() == 0L)
    assert(frames.count() > 0L)
  }

  test("resizePpm: nearest pixel-center mapping, exact integer math") {
    // 4x2 source with distinct per-pixel values; downscale to 2x1:
    // sx = ((2dx+1)*4)/(2*2) -> dx0->1, dx1->3; sy = ((0+1)*2)/2 = 1
    val src = Multimodal.PpmImage(4, 2,
      Array.tabulate[Byte](24)(i => i.toByte))
    val out = Multimodal.resizePpm(src, 2, 1)
    assert(out.width == 2 && out.height == 1)
    // dst(0) = src pixel (y=1,x=1) = flat 5; dst(1) = (y=1,x=3) = flat 7
    assert(out.raster.toSeq == Seq(15, 16, 17, 21, 22, 23).map(_.toByte))
    // upscale keeps every source pixel reachable and in range
    val up = Multimodal.resizePpm(src, 9, 5)
    assert(up.width == 9 && up.height == 5 && up.raster.length == 135)
    // identity resize is a pixel-exact copy
    val same = Multimodal.resizePpm(src, 4, 2)
    assert(same.raster.toSeq == src.raster.toSeq)
  }

  test("dHash9x8: downsample law, identity at 9x8, full 64-bit budget") {
    // a real-resolution fixture (18x14 at id 30) downsamples to 9x8;
    // every gradient bit replayed from the channel laws THROUGH the
    // nearest-resample law — the image_dhash_scaled oracle's math
    val id = 30L
    val img = Multimodal.decodePpm(Multimodal.ppmFixtureLarge(id))
    assert(img.width == 16 + id % 7 && img.height == 12 + id % 5)
    val got = Multimodal.dHash9x8(img)
    def gray(p: Long): Long =
      (id * 7 + p * 3) % 256 + (id * 11 + p * 5) % 256 +
        (id * 13 + p * 7) % 256
    var want = 0L
    for (dy <- 0 until 8; dx <- 0 until 8) {
      val sy = (2 * dy + 1) * img.height / 16
      val s0 = (2 * dx + 1) * img.width / 18
      val s1 = (2 * (dx + 1) + 1) * img.width / 18
      if (gray(sy.toLong * img.width + s0) >
          gray(sy.toLong * img.width + s1))
        want |= 1L << (dy * 8 + dx)
    }
    assert(got == want, f"dHash9x8 mismatch: got $got%016x want $want%016x")
    // a raster already at 9x8 hashes identically with and without the
    // resample step (pixel-center nearest at equal size is identity)
    val nine = Multimodal.PpmImage(9, 8,
      Array.tabulate[Byte](9 * 8 * 3)(i => ((i * 37) % 251).toByte))
    val direct = {
      // replicate the raw 64-bit walk via a 1-row-at-a-time dHash on
      // each row (8 rows x 8 bits), composing the full hash
      (0 until 8).foldLeft(0L) { (acc, y) =>
        val row = Multimodal.PpmImage(9, 1,
          nine.raster.slice(y * 27, (y + 1) * 27))
        acc | (Multimodal.dHash(row) << (y * 8))
      }
    }
    assert(Multimodal.dHash9x8(nine) == direct)
    // bit 63 (the bottom-right gradient) is reachable: a raster whose
    // last row descends sets it — the full 64-bit budget is in use
    val desc = Multimodal.PpmImage(9, 8,
      Array.tabulate[Byte](9 * 8 * 3) { i =>
        val p = i / 3
        (255 - (p % 9) * 20).toByte
      })
    assert(Multimodal.dHash9x8(desc) < 0, "bit 63 must be reachable")
    // the small-raster guard still points at the scaled entry point
    val e = intercept[IllegalArgumentException](Multimodal.dHash(img))
    assert(e.getMessage.contains("dHash9x8"))
  }

  test("resizePpmBilinear: hand-computed average and edge clamp") {
    // 2x2 -> 1x1: center maps to (0.5, 0.5) -> equal-weight average
    val src = Multimodal.PpmImage(2, 2,
      Array[Byte](10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0))
    val out = Multimodal.resizePpmBilinear(src, 1, 1)
    assert((out.raster(0) & 0xff) == 25) // (10+20+30+40)/4
    // 1x1 -> 3x3: clamp-to-edge replicates the single pixel
    val one = Multimodal.PpmImage(1, 1, Array[Byte](77, 0, 0))
    val rep = Multimodal.resizePpmBilinear(one, 3, 3)
    assert(rep.raster.grouped(3).forall(px => (px(0) & 0xff) == 77))
  }

  test("resize: real decode -> resample -> re-encode; pass-through for rest") {
    val ppm = udf((id: Long) => Multimodal.ppmFixture(id))
    val wav = udf((id: Long) => Multimodal.wavFixture(id))
    val media = spark.range(9).select(
      col("id").as("media_id"),
      when(col("id") % 3 === 0, "image").otherwise("audio").as("kind"),
      when(col("id") % 3 === 0, ppm(col("id")))
        .otherwise(wav(col("id"))).as("payload"),
      lit(null).cast(Multimodal.metaType).as("meta"))
    val resized = Multimodal.resize(media, 6, 5)
    val imgs = resized.filter(col("kind") === "image").collect()
    assert(imgs.length == 3)
    imgs.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getInt(0) == 6 && meta.getInt(1) == 5)
      // the payload is a REAL re-encoded P6 whose pixels match a direct
      // nearest resample of the original fixture
      val img = Multimodal.decodePpm(r.getAs[Array[Byte]]("payload"))
      assert(img.width == 6 && img.height == 5)
      val id = r.getLong(r.fieldIndex("media_id"))
      val expect = Multimodal.resizePpm(
        Multimodal.decodePpm(Multimodal.ppmFixture(id)), 6, 5)
      assert(img.raster.toSeq == expect.raster.toSeq, s"id $id")
    }
    // non-image rows keep their payload bytes untouched
    val audio = resized.filter(col("kind") === "audio").collect()
    assert(audio.length == 6 && audio.forall { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      r.getAs[Array[Byte]]("payload").toSeq ==
        Multimodal.wavFixture(id).toSeq
    })
    // undecodable image payloads (syntheticMedia's are random bytes)
    // pass through with payload AND meta untouched
    val junk = Multimodal.syntheticMedia(spark, 6)
    val kept = Multimodal.resize(junk, 6, 5)
      .filter(col("kind") === "image").orderBy("media_id").collect()
    val src = junk.filter(col("kind") === "image")
      .orderBy("media_id").collect()
    assert(kept.length == src.length && kept.zip(src).forall {
      case (a, b) =>
        a.getAs[Array[Byte]]("payload").toSeq ==
          b.getAs[Array[Byte]]("payload").toSeq &&
          a.getStruct(a.fieldIndex("meta")) ==
            b.getStruct(b.fieldIndex("meta"))
    })
  }

  test("image_dhash_pairs: banded join == brute force, pigeonhole holds") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("image_dhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over driver-recomputed signatures: decode both
    // variants of every media row exactly as the query does
    val ids = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    val sigs = ids.flatMap { id =>
      Seq(
        2 * id -> Multimodal.dHash9x8(
          Multimodal.decodePpm(Multimodal.ppmFixtureLarge(id))),
        2 * id + 1 -> Multimodal.dHash9x8(
          Multimodal.decodePpm(Multimodal.ppmFixtureLargeReenc(id))))
    }.toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    assert(got == want,
      s"banded pairs must equal brute force: got ${got.size} want ${want.size}")
    assert(want.nonEmpty, "fixture must realize near-dup pairs")
    // the pigeonhole the banding relies on, checked concretely: every
    // qualifying pair agrees on at least one of the 4 16-bit bands
    want.foreach { case (a, b, _) =>
      val bands = (0 until 4).count(p =>
        ((sigs(a) >>> (16 * p)) & 0xffffL) == ((sigs(b) >>> (16 * p)) & 0xffffL))
      assert(bands >= 1, f"pair ($a,$b) differs in every band: ${sigs(a)}%016x ${sigs(b)}%016x")
    }
  }

  test("image_dedup_pipeline: pairs feed components; one keep per cluster") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("image_dedup_pipeline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val pairs = graft.SparkEntry.queries("image_dhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = rows.map(r => r._1 -> r._2).toMap
    // every verified near-dup pair lands in ONE cluster (the GraphOps
    // connected-components feed the verdict asked for)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // the cluster label is the component minimum, exactly one keep per
    // cluster, and within an (original, re-encode) pair -- equal
    // resolution -- the ORIGINAL (lower, even media_id) is kept
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min == c, s"cluster $c label not the min id")
      assert(members.count(_._3) == 1, s"cluster $c keep count != 1")
    }
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture must realize non-singleton clusters")
    // keep = resolution DESC then lowest media_id (resolution from the
    // fixture dimension law; both variants of one doc share dims, so a
    // pure (original, re-encode) cluster keeps the original)
    def px(id: Long) = (16 + (id / 2) % 7) * (12 + (id / 2) % 5)
    multi.values.foreach { members =>
      val expect = members.map(_._1).minBy(id => (-px(id), id))
      val kept = members.filter(_._3).map(_._1)
      assert(kept.toSeq == Seq(expect),
        s"kept $kept, expected $expect in ${members.map(_._1).toSeq}")
    }
  }
}
