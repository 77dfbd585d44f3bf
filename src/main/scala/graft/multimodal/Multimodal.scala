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

  /** Typed feature extraction over binary media payloads, partition-wise
    * (the batch shape a decoder runs in: one pass over each partition's
    * rows, no shuffle, binary in / typed scalars out). Image payloads
    * go through the REAL [[decodePpm]] parser — width/height and exact
    * per-channel pixel means from the decoded raster; a payload that
    * fails to parse yields null features (its byte count survives, so
    * corrupt rows are countable). Non-image kinds (no audio/video
    * codec in this container) carry byte counts only.
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
      StructField("mean_b", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row(id, kind, null, null, null, null, null, null)
        else {
          val n = bytes.length.toLong
          if (kind == "image") {
            try {
              val img = decodePpm(bytes)
              val (mr, mg, mb) = img.meanRgb
              Row(id, kind, n, img.width, img.height, mr, mg, mb)
            } catch { case _: IllegalArgumentException =>
              Row(id, kind, n, null, null, null, null, null)
            }
          } else Row(id, kind, n, null, null, null, null, null)
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
