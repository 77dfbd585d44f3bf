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
  * propagation, partition preservation — is real and tested. IMAGE decode
  * is real too: [[decodePpm]] is a pure-JVM binary PPM (P6) parser —
  * netpbm header with comments/whitespace, 8-bit RGB raster — and
  * [[mediaFeatures]] extracts width/height/per-channel means from the
  * actual pixels. Audio/video codecs (and the dense feature-vector
  * extractor [[decodeFeatures]], which models an embedding model's
  * output) remain deterministic STUBs: this container ships no
  * audio/video libraries, and swapping a real codec in changes only
  * those functions.
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

  /** STUB decode: payload -> fixed-dim feature vector. A real
    * implementation would decode pixels/samples here; the fake derives
    * each feature deterministically from the payload so tests can pin
    * exact values. Runs partition-wise (one pass, no shuffle).
    */
  def decodeFeatures(df: DataFrame, dim: Int): DataFrame = {
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
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // fake "decode": k-th feature = normalized splitmix of a byte
        // histogram accumulator — deterministic in the payload alone
        var acc = 0L
        bytes.foreach(b => acc = splitmix64(acc ^ (b & 0xffL)))
        val feats = Array.tabulate(dim)(k =>
          (splitmix64(acc + k).toDouble / Long.MaxValue))
        Row(r.getLong(idIdx), r.getString(kindIdx), feats.toSeq)
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
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    require(bytes != null && bytes.length >= 2 &&
      bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM payload")
    var pos = 2
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
    PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * w * h))
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

  /** Typed feature extraction over binary media payloads, partition-wise
    * (the batch shape a decoder runs in: one pass over each partition's
    * rows, no shuffle, binary in / typed scalars out). Image payloads
    * go through the REAL [[decodePpm]] parser — width/height and exact
    * per-channel pixel means from the decoded raster — and audio
    * payloads through the REAL [[decodeWav]] parser — sample rate,
    * sample count, peak and RMS amplitude from the decoded PCM. A
    * payload that fails to parse yields null features (its byte count
    * survives, so corrupt rows are countable). Video (no codec in this
    * container) carries byte counts only.
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
      StructField("rms", DoubleType)))
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
            null)
        if (bytes == null) blank(null)
        else {
          val n = bytes.length.toLong
          kind match {
            case "image" =>
              try {
                val img = decodePpm(bytes)
                val (mr, mg, mb) = img.meanRgb
                Row(id, kind, n, img.width, img.height, mr, mg, mb,
                  null, null, null, null)
              } catch { case _: IllegalArgumentException => blank(n) }
            case "audio" =>
              try {
                val a = decodeWav(bytes)
                Row(id, kind, n, null, null, null, null, null,
                  a.sampleRate, a.nSamples.toLong, a.peakAbs, a.rms)
              } catch { case _: IllegalArgumentException => blank(n) }
            case _ => blank(n)
          }
        }
      }
    }(enc)
  }

  /** STUB resize: marks the metadata with the new dimensions and
    * truncates/extends the payload deterministically (a real codec would
    * re-encode pixels). Images only; other kinds pass through.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      when(col("kind") === "image",
        struct(lit(w).as("width"), lit(h).as("height"),
          col("meta.channels").as("channels"), col("meta.format").as("format"),
          col("meta.duration_ms").as("duration_ms")))
        .otherwise(col("meta")))

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
}
