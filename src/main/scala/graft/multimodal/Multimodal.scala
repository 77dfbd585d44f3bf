package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline:
  * media as opaque `binary` payloads plus a typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling as partition-wise
  * batch transforms.
  *
  * The Spark-side plumbing — schema, mapPartitions batching, metadata
  * propagation, partition preservation — is real and tested, and so are
  * the codecs: [[decodePpm]] is a pure-JVM binary PPM (P6) parser
  * (netpbm header with comments/whitespace, 8-bit RGB raster),
  * [[decodeWav]] a RIFF/WAVE PCM16 parser, [[decodeVideo]] the GFV1
  * frame container, and [[mediaFeatures]]/[[videoFrames]] extract
  * dimensions/means/amplitudes from the actual decoded content. The
  * embedding extractor [[decodeFeatures]] is real (pooled signed
  * byte-3-gram feature hashing over decoded content), and so is
  * [[resize]]: decode → pixel resample ([[resizePpm]] nearest /
  * [[resizePpmBilinear]]) → re-encode, plain array math with no
  * external scaling library. The only remaining hash-stub is
  * [[sampleFrames]]'s frame key (its decoded twin is [[videoFrames]]).
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", metaType)))

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic synthetic media table: `n` rows, image/audio/video
    * round-robin, payload bytes generated from media_id.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 64 + (splitmix64(i.toLong).toInt & 0xff)
      val payload = Array.tabulate[Byte](len)(j =>
        (splitmix64(i.toLong * 1000003L + j) & 0xff).toByte)
      val meta = kind match {
        case "image" => Row(16 + i % 8, 16 + i % 5, 3, "png", 0L)
        case "audio" => Row(0, 0, 1, "wav", 1000L + i * 10)
        case "video" => Row(32, 24, 3, "mp4", 2000L + i * 100)
      }
      Row(i.toLong, kind, payload, meta)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(2, n / 50)), mediaSchema)
  }

  /** Streaming pooled byte-3-gram feature hasher (the "hashing trick",
    * Weinberger et al. 2009, ICML — public method): every consecutive
    * 3-byte window hashes (splitmix64) to bucket `h mod dim` with sign
    * from an independent hash bit, accumulating a signed histogram
    * that [[result]] L2-normalizes. Deterministic in the byte stream
    * alone; signed buckets make collisions cancel in expectation, so
    * cosine between two pooled vectors honestly tracks 3-gram overlap.
    */
  private final class NgramPooler(dim: Int) {
    private val acc = new Array[Double](dim)
    private var window = 0L
    private var seen = 0
    def add(b: Byte): Unit = {
      window = ((window << 8) | (b & 0xffL)) & 0xffffffL
      seen += 1
      if (seen >= 3) {
        val h = splitmix64(window)
        val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
        acc(bucket) += (if ((h & (1L << 32)) == 0L) 1.0 else -1.0)
      }
    }
    def addAll(bytes: Array[Byte], from: Int, until: Int): Unit = {
      var i = from
      while (i < until) { add(bytes(i)); i += 1 }
    }
    /** L2-normalized pooled vector (all-zero stays all-zero). */
    def result(): Array[Double] = {
      var n2 = 0.0
      var i = 0
      while (i < acc.length) { n2 += acc(i) * acc(i); i += 1 }
      if (n2 == 0.0) acc
      else {
        val inv = 1.0 / math.sqrt(n2)
        acc.map(_ * inv)
      }
    }
  }

  /** REAL deterministic embedding extractor: pooled signed byte-3-gram
    * feature hashing over the DECODED content — image raster pixels
    * ([[decodePpm]]), audio PCM sample bytes ([[decodeWav]]), every
    * 2nd video frame's raster ([[decodeVideo]], the same decode-sampled
    * stride as [[mediaFeatures]]) — falling back to the raw payload
    * bytes when no codec applies or the parse fails, and to the zero
    * vector for null payloads. L2-normalized, so cosine between rows is
    * honest content similarity; swapping in a learned model changes
    * only this function's body. Partition-wise: one pass, no shuffle.
    */
  def decodeFeatures(df: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"bad feature dim $dim")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("features", ArrayType(DoubleType))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val pooler = new NgramPooler(dim)
        if (bytes != null) {
          def raw(): Unit = pooler.addAll(bytes, 0, bytes.length)
          kind match {
            case "image" =>
              try {
                val img = decodePpm(bytes)
                pooler.addAll(img.raster, 0, img.raster.length)
              } catch { case _: IllegalArgumentException => raw() }
            case "audio" =>
              try {
                val a = decodeWav(bytes)
                a.samples.foreach { s =>
                  pooler.add((s & 0xff).toByte)
                  pooler.add(((s >> 8) & 0xff).toByte)
                }
              } catch { case _: IllegalArgumentException => raw() }
            case "video" =>
              try {
                val v = decodeVideo(bytes)
                var f = 0
                while (f < v.nFrames) {
                  pooler.addAll(v.frames(f).raster, 0,
                    v.frames(f).raster.length)
                  f += 2
                }
              } catch { case _: IllegalArgumentException => raw() }
            case _ => raw()
          }
        }
        Row(r.getLong(idIdx), kind, pooler.result().toSeq)
      }
    }(enc)
  }

  /** One decoded PPM image: dimensions plus the raw RGB24 raster. */
  final case class PpmImage(width: Int, height: Int,
      raster: Array[Byte]) {
    /** Exact per-channel means: integer channel sums divided by the
      * pixel count — one double division, bit-identical on any engine.
      */
    def meanRgb: (Double, Double, Double) = {
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0
      val n = width * height
      while (p < n) {
        sr += raster(3 * p) & 0xff
        sg += raster(3 * p + 1) & 0xff
        sb += raster(3 * p + 2) & 0xff
        p += 1
      }
      (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** Pure-JVM binary PPM (P6) decode: the netpbm header — `P6`, then
    * width, height, maxval as ASCII integers separated by whitespace,
    * with `#` comments legal between tokens — followed by ONE
    * whitespace byte and the `width*height*3` RGB24 raster. 8-bit
    * (maxval 255) only; malformed input throws
    * IllegalArgumentException with the failing condition.
    */
  def decodePpm(bytes: Array[Byte]): PpmImage =
    decodePpmAt(bytes, 0)._1

  /** Parse one P6 PPM starting at `offset`; returns the image plus the
    * offset one past its raster (so concatenated streams — the GFV1
    * video container — can walk frame by frame).
    */
  def decodePpmAt(bytes: Array[Byte], offset: Int): (PpmImage, Int) = {
    require(bytes != null && bytes.length >= offset + 2 &&
      bytes(offset) == 'P' && bytes(offset + 1) == '6',
      "not a P6 PPM payload")
    var pos = offset + 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def readInt(what: String): Int = {
      skipWsAndComments()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        require(v <= Int.MaxValue, s"$what overflows")
        pos += 1
      }
      require(pos > start, s"missing $what in PPM header")
      v.toInt
    }
    val w = readInt("width")
    val h = readInt("height")
    val maxVal = readInt("maxval")
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxVal == 255, s"only 8-bit (maxval 255) supported, got $maxVal")
    require(pos < bytes.length && isWs(bytes(pos)),
      "missing whitespace after maxval")
    pos += 1 // exactly one whitespace byte before the raster
    require(bytes.length - pos >= 3 * w * h,
      s"truncated raster: need ${3 * w * h} bytes, have ${bytes.length - pos}")
    (PpmImage(w, h,
      java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * w * h)),
      pos + 3 * w * h)
  }

  /** Encode RGB24 pixels as binary PPM (P6, maxval 255): `px(p)` gives
    * the (r, g, b) of flat pixel p in row-major order.
    */
  def encodePpm(w: Int, h: Int, px: Int => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < w * h) {
      val (r, g, b) = px(p)
      out(header.length + 3 * p) = r.toByte
      out(header.length + 3 * p + 1) = g.toByte
      out(header.length + 3 * p + 2) = b.toByte
      p += 1
    }
    out
  }

  /** Deterministic P6 fixture: single-digit dimensions (w = 4 + id%5,
    * h = 3 + id%4) and closed-form channel laws (r = (7id + 3p) % 256,
    * g = (11id + 5p) % 256, b = (13id + 7p) % 256 at flat pixel p), so
    * an SQL oracle can replay the DECODED features analytically while
    * the engine runs the real byte-level parse.
    */
  def ppmFixture(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    encodePpm(w, h, p => (
      ((id * 7 + p * 3L) % 256).toInt,
      ((id * 11 + p * 5L) % 256).toInt,
      ((id * 13 + p * 7L) % 256).toInt))
  }

  /** [[ppmFixture]]'s real-resolution sibling: the SAME analytic
    * channel laws over rasters LARGER than the canonical 9×8 dHash
    * grid (w = 16 + id%7, h = 12 + id%5), so the
    * decode → downsample → fingerprint path exercises a genuine
    * resample while staying SQL-replayable end to end.
    */
  def ppmFixtureLarge(id: Long): Array[Byte] = {
    val w = (16 + id % 7).toInt
    val h = (12 + id % 5).toInt
    encodePpm(w, h, p => (
      ((id * 7 + p * 3L) % 256).toInt,
      ((id * 11 + p * 5L) % 256).toInt,
      ((id * 13 + p * 7L) % 256).toInt))
  }

  /** [[ppmFixtureLarge]]'s RE-ENCODED sibling: identical raster except
    * +1 in the red channel law. A uniform brightness nudge shifts both
    * endpoints of every horizontal gradient together, so gradient
    * signs — hence dHash bits — survive except where the +1 wraps mod
    * 256 at exactly one sampled endpoint (r was 255 there): the
    * analytic stand-in for a lossy re-encode, landing (original,
    * re-encode) pairs at hamming ~0-2 while staying SQL-replayable
    * (the oracle evaluates the same +1 arithmetic; it never needs to
    * reason about wraps).
    */
  def ppmFixtureLargeReenc(id: Long): Array[Byte] = {
    val w = (16 + id % 7).toInt
    val h = (12 + id % 5).toInt
    encodePpm(w, h, p => (
      ((id * 7 + p * 3L + 1) % 256).toInt,
      ((id * 11 + p * 5L) % 256).toInt,
      ((id * 13 + p * 7L) % 256).toInt))
  }

  /** Difference hash (dHash) over a decoded raster: bit y*(w−1)+x is
    * set iff gray(y,x) > gray(y,x+1), gray = r+g+b (an integer in
    * [0,765] — no luma weights, no division, so the bits are exact).
    * The standard perceptual fingerprint for image DEDUP: horizontal
    * gradients survive re-encodes and small edits, and hash equality /
    * low hamming distance is the candidate test. Production dHash
    * downsamples to 9x8 first; these fixture rasters are already
    * smaller than that, so the hash runs at native resolution
    * (capacity-checked against the 64-bit budget).
    */
  def dHash(img: PpmImage): Long = {
    val bits = (img.width - 1) * img.height
    require(bits >= 1 && bits <= 63,
      s"dHash needs a downsample first: ${img.width}x${img.height} " +
        s"raster has $bits gradient bits (max 63); use dHash9x8 for " +
        "real-resolution images")
    dHashUnchecked(img)
  }

  /** PRODUCTION dHash — any input resolution: nearest-neighbor
    * downsample to the canonical 9×8 grid ([[resizePpm]]'s
    * deterministic pixel-center integer law, identity when the raster
    * already IS 9×8), then the 8×8 = 64 horizontal gradient bits. The
    * full 64-bit signature uses the sign bit (bit 63 = the bottom-right
    * gradient) — callers comparing across engines split it into two
    * unsigned 32-bit halves (`image_dhash_scaled` emits
    * dhash_hi/dhash_lo) since SQL BIGINT sums of 2^63 overflow.
    */
  def dHash9x8(img: PpmImage): Long = dHashUnchecked(resizePpm(img, 9, 8))

  private def dHashUnchecked(img: PpmImage): Long = {
    def gray(p: Int): Int =
      (img.raster(3 * p) & 0xff) + (img.raster(3 * p + 1) & 0xff) +
        (img.raster(3 * p + 2) & 0xff)
    var hash = 0L
    var b = 0
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width - 1) {
        if (gray(y * img.width + x) > gray(y * img.width + x + 1))
          hash |= 1L << b
        b += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** One decoded PCM16 WAV: format plus the interleaved samples. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def nSamples: Int = samples.length
    def durationMs: Long =
      (samples.length / channels) * 1000L / sampleRate
    /** max |sample| over all channels (0 for an empty stream). */
    def peakAbs: Long = {
      var m = 0L; var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong)
        if (a > m) m = a
        i += 1
      }
      m
    }
    /** Root-mean-square amplitude: INTEGER sum of squares (exact —
      * 16-bit samples keep it far under 2^53), one double division,
      * one correctly-rounded sqrt — bit-identical on any engine.
      */
    def rms: Double =
      if (samples.isEmpty) 0.0
      else {
        var s = 0L; var i = 0
        while (i < samples.length) {
          s += samples(i).toLong * samples(i); i += 1
        }
        math.sqrt(s.toDouble / samples.length)
      }
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Pure-JVM RIFF/WAVE decode, PCM 16-bit only: the canonical
    * `RIFF <size> WAVE` container walked chunk by chunk (`fmt ` for
    * the format block, `data` for the samples, unknown chunks skipped
    * with even-byte padding per the RIFF spec). Malformed input throws
    * IllegalArgumentException with the failing condition.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes != null && bytes.length >= 12 &&
      tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    var pos = 12
    var sampleRate = 0; var channels = 0; var haveFmt = false
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || !haveFmt)) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"chunk $id overruns payload")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          require(le16(bytes, body) == 1, "only PCM (format 1) supported")
          channels = le16(bytes, body + 2)
          sampleRate = le32(bytes, body + 4)
          require(channels > 0 && sampleRate > 0,
            s"bad format: $channels ch @ $sampleRate Hz")
          require(le16(bytes, body + 14) == 16,
            "only 16-bit samples supported")
          haveFmt = true
        case "data" =>
          require(size % 2 == 0, "odd data chunk size for PCM16")
          samples = Array.tabulate(size / 2)(k =>
            le16(bytes, body + 2 * k).toShort)
        case _ => // skip unknown chunk
      }
      pos = body + size + (size & 1) // RIFF pads chunks to even offsets
    }
    require(haveFmt, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  /** Encode PCM16 mono/interleaved samples as a canonical RIFF/WAVE. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Deterministic PCM16 fixture: 8 kHz mono, n = 64 + id%129 samples
    * following s(k) = (31 id + 17 k) % 4096 - 2048 — closed-form
    * integers an SQL oracle replays analytically while the engine
    * parses the actual RIFF bytes.
    */
  def wavFixture(id: Long): Array[Byte] = {
    val n = (64 + id % 129).toInt
    encodeWav(8000, 1, Array.tabulate(n)(k =>
      ((id * 31 + k * 17L) % 4096 - 2048).toShort))
  }

  /** One decoded GFV1 video clip: constant-rate frames of equal-sized
    * P6 images.
    */
  final case class VideoClip(frameMs: Int, frames: Array[PpmImage]) {
    def nFrames: Int = frames.length
    def width: Int = frames.head.width
    def height: Int = frames.head.height
    def durationMs: Long = nFrames.toLong * frameMs
    /** Exact per-channel means over every `everyK`-th frame (a frame
      * SAMPLE, the shape a real video featurizer runs in — decode only
      * the sampled frames' pixels): integer channel sums over the
      * sampled rasters, one double division each.
      */
    def sampledMeanRgb(everyK: Int): (Double, Double, Double) = {
      require(everyK >= 1, s"bad sampling stride $everyK")
      var sr = 0L; var sg = 0L; var sb = 0L
      var nPx = 0L
      var f = 0
      while (f < frames.length) {
        val r = frames(f).raster
        var p = 0
        while (p < r.length / 3) {
          sr += r(3 * p) & 0xff
          sg += r(3 * p + 1) & 0xff
          sb += r(3 * p + 2) & 0xff
          p += 1
        }
        nPx += r.length / 3
        f += everyK
      }
      (sr.toDouble / nPx, sg.toDouble / nPx, sb.toDouble / nPx)
    }
  }

  /** Pure-JVM decode of the GFV1 container — the trivial deterministic
    * video format this library ships so the frame-sampling pipeline is
    * honest end-to-end without external codecs: ASCII magic `GFV1`,
    * le32 frame count, le32 per-frame duration (ms), then that many
    * concatenated binary P6 PPM frames, all with identical dimensions.
    * Malformed input throws IllegalArgumentException.
    */
  def decodeVideo(bytes: Array[Byte]): VideoClip = {
    require(bytes != null && bytes.length >= 12 &&
      tag(bytes, 0) == "GFV1", "not a GFV1 payload")
    val n = le32(bytes, 4)
    val frameMs = le32(bytes, 8)
    require(n > 0 && n <= (1 << 20), s"bad frame count $n")
    require(frameMs > 0, s"bad frame duration $frameMs ms")
    val frames = new Array[PpmImage](n)
    var pos = 12
    var f = 0
    while (f < n) {
      val (img, next) = decodePpmAt(bytes, pos)
      require(f == 0 || (img.width == frames(0).width &&
        img.height == frames(0).height),
        s"frame $f is ${img.width}x${img.height}, " +
          s"expected ${frames(0).width}x${frames(0).height}")
      frames(f) = img
      pos = next
      f += 1
    }
    VideoClip(frameMs, frames)
  }

  /** Encode equal-sized P6 frames as a GFV1 clip. */
  def encodeVideo(frameMs: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = java.nio.ByteBuffer
      .allocate(12 + frames.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GFV1".getBytes("US-ASCII")).putInt(frames.length)
      .putInt(frameMs)
    frames.foreach(out.put)
    out.array()
  }

  /** Deterministic GFV1 fixture: 2 + id%4 frames at 40 ms/frame, frame
    * dimensions matching [[ppmFixture]] (w = 4 + id%5, h = 3 + id%4),
    * channel laws r = (7id + 3p + 19f) % 256, g = (11id + 5p + 23f) %
    * 256, b = (13id + 7p + 29f) % 256 at flat pixel p of frame f — so
    * an SQL oracle can replay the decoded-and-sampled features
    * analytically while the engine runs the real byte-level parse.
    */
  def videoFixture(id: Long): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val n = (2 + id % 4).toInt
    encodeVideo(40, (0 until n).map(f => encodePpm(w, h, p => (
      ((id * 7 + p * 3L + f * 19L) % 256).toInt,
      ((id * 11 + p * 5L + f * 23L) % 256).toInt,
      ((id * 13 + p * 7L + f * 29L) % 256).toInt))))
  }

  /** Typed feature extraction over binary media payloads, partition-wise
    * (the batch shape a decoder runs in: one pass over each partition's
    * rows, no shuffle, binary in / typed scalars out). Image payloads
    * go through the REAL [[decodePpm]] parser — width/height and exact
    * per-channel pixel means from the decoded raster — and audio
    * payloads through the REAL [[decodeWav]] parser — sample rate,
    * sample count, peak and RMS amplitude from the decoded PCM — and
    * video payloads through the REAL [[decodeVideo]] GFV1 parser —
    * frame dimensions, frame count, duration, and per-channel means
    * over every 2nd frame (decode-sampled, the way a production
    * featurizer avoids touching every frame). A payload that fails to
    * parse yields null features (its byte count survives, so corrupt
    * rows are countable).
    */
  def mediaFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("peak_abs", LongType),
      StructField("rms", DoubleType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        def blank(n: Any) =
          Row(id, kind, n, null, null, null, null, null, null, null, null,
            null, null, null)
        if (bytes == null) blank(null)
        else {
          val n = bytes.length.toLong
          kind match {
            case "image" =>
              try {
                val img = decodePpm(bytes)
                val (mr, mg, mb) = img.meanRgb
                Row(id, kind, n, img.width, img.height, mr, mg, mb,
                  null, null, null, null, null, null)
              } catch { case _: IllegalArgumentException => blank(n) }
            case "audio" =>
              try {
                val a = decodeWav(bytes)
                Row(id, kind, n, null, null, null, null, null,
                  a.sampleRate, a.nSamples.toLong, a.peakAbs, a.rms,
                  null, a.durationMs)
              } catch { case _: IllegalArgumentException => blank(n) }
            case "video" =>
              try {
                val v = decodeVideo(bytes)
                val (mr, mg, mb) = v.sampledMeanRgb(2)
                Row(id, kind, n, v.width, v.height, mr, mg, mb,
                  null, null, null, null, v.nFrames.toLong, v.durationMs)
              } catch { case _: IllegalArgumentException => blank(n) }
            case _ => blank(n)
          }
        }
      }
    }(enc)
  }

  /** Nearest-neighbor resample at pixel centers: source index
    * `sx = ((2 dx + 1) srcW) / (2 dstW)` with integer floor division —
    * fully deterministic integer math, so an SQL oracle can replay the
    * resized raster analytically. Always lands in `[0, src-1]`.
    */
  def resizePpm(img: PpmImage, w: Int, h: Int): PpmImage = {
    require(w > 0 && h > 0, s"bad target ${w}x$h")
    val out = new Array[Byte](3 * w * h)
    var dy = 0
    while (dy < h) {
      val sy = (((2L * dy + 1) * img.height) / (2L * h)).toInt
      var dx = 0
      while (dx < w) {
        val sx = (((2L * dx + 1) * img.width) / (2L * w)).toInt
        val s = 3 * (sy * img.width + sx)
        val d = 3 * (dy * w + dx)
        out(d) = img.raster(s)
        out(d + 1) = img.raster(s + 1)
        out(d + 2) = img.raster(s + 2)
        dx += 1
      }
      dy += 1
    }
    PpmImage(w, h, out)
  }

  /** Bilinear resample (pixel-center mapping, clamp-to-edge, round
    * half-up) — the quality option for downstream models; [[resizePpm]]
    * stays the oracle-replayable default.
    */
  def resizePpmBilinear(img: PpmImage, w: Int, h: Int): PpmImage = {
    require(w > 0 && h > 0, s"bad target ${w}x$h")
    val out = new Array[Byte](3 * w * h)
    val xs = img.width.toDouble / w
    val ys = img.height.toDouble / h
    var dy = 0
    while (dy < h) {
      val fy = math.min(math.max((dy + 0.5) * ys - 0.5, 0.0),
        img.height - 1.0)
      val y0 = fy.toInt
      val y1 = math.min(y0 + 1, img.height - 1)
      val wy = fy - y0
      var dx = 0
      while (dx < w) {
        val fx = math.min(math.max((dx + 0.5) * xs - 0.5, 0.0),
          img.width - 1.0)
        val x0 = fx.toInt
        val x1 = math.min(x0 + 1, img.width - 1)
        val wx = fx - x0
        val d = 3 * (dy * w + dx)
        var c = 0
        while (c < 3) {
          val p00 = img.raster(3 * (y0 * img.width + x0) + c) & 0xff
          val p01 = img.raster(3 * (y0 * img.width + x1) + c) & 0xff
          val p10 = img.raster(3 * (y1 * img.width + x0) + c) & 0xff
          val p11 = img.raster(3 * (y1 * img.width + x1) + c) & 0xff
          val v = (1 - wy) * ((1 - wx) * p00 + wx * p01) +
            wy * ((1 - wx) * p10 + wx * p11)
          out(d + c) = math.floor(v + 0.5).toInt.toByte
          c += 1
        }
        dx += 1
      }
      dy += 1
    }
    PpmImage(w, h, out)
  }

  /** REAL image resize over a media table: decode each P6 payload,
    * resample pixels ([[resizePpm]] nearest by default, bilinear on
    * request), re-encode as P6, and set the metadata to the ACTUAL new
    * dimensions. Non-image rows and undecodable payloads pass through
    * untouched. Partition-wise, no shuffle — at 100 TB the decode/encode
    * parallelism is the row partitioning.
    */
  def resize(df: DataFrame, w: Int, h: Int,
      bilinear: Boolean = false): DataFrame = {
    require(w > 0 && h > 0, s"bad target ${w}x$h")
    val enc = RowEncoder.encoderFor(mediaSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (kind != "image" || bytes == null)
          Row(r.getLong(idIdx), kind, bytes, r.get(metaIdx))
        else try {
          val img = decodePpm(bytes)
          val res = if (bilinear) resizePpmBilinear(img, w, h)
            else resizePpm(img, w, h)
          val payload = encodePpm(w, h, p => (
            res.raster(3 * p) & 0xff,
            res.raster(3 * p + 1) & 0xff,
            res.raster(3 * p + 2) & 0xff))
          Row(r.getLong(idIdx), kind, payload, Row(w, h, 3, "ppm", null))
        } catch { case _: IllegalArgumentException =>
          Row(r.getLong(idIdx), kind, bytes, r.get(metaIdx))
        }
      }
    }(enc)
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals across duration_ms (generate + explode — stays
    * parallel, no driver loop).
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1,
          lit(everyMs))))
      .select(col("media_id"), col("frame_ms"),
        // stub frame id: a real impl would decode the frame here
        sha2(concat(col("payload"), col("frame_ms").cast("string")), 256)
          .as("frame_key"))

  /** REAL frame sampling over GFV1 video payloads: decode each clip
    * partition-wise and emit one row per every-`everyK`-th frame with
    * that frame's decoded per-channel means. Binary in / typed frame
    * rows out, one pass, no shuffle — undecodable payloads are dropped
    * (they are surfaced with byte counts by [[mediaFeatures]]).
    */
  def videoFrames(df: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, s"bad sampling stride $everyK")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (r.getString(kindIdx) != "video" || bytes == null) Iterator.empty
        else {
          val id = r.getLong(idIdx)
          try {
            val v = decodeVideo(bytes)
            Iterator.range(0, v.nFrames, everyK).map { f =>
              val (mr, mg, mb) = v.frames(f).meanRgb
              Row(id, f, f.toLong * v.frameMs,
                v.frames(f).width, v.frames(f).height, mr, mg, mb)
            }
          } catch {
            case _: IllegalArgumentException => Iterator.empty
          }
        }
      }
    }(enc)
  }
}
