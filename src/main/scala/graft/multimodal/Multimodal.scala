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
  * propagation, partition preservation — is real and tested. The codec
  * itself is a STUB: this container has no image/audio libraries, so
  * `decodeBytes` derives deterministic fake pixels from the payload via
  * splitmix64. Swapping in a real codec changes only that one function.
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

  /** Typed feature extraction over opaque binary payloads, partition-wise
    * (the batch shape a real decoder runs in: one pass over each
    * partition's rows, no shuffle, binary in / typed scalars out). The
    * decode itself is a STUB — header magic plus arithmetic
    * pseudo-dimensions derived from the byte length — deliberately simple
    * enough that a SQL oracle replays it exactly, while the Spark-side
    * plumbing (binary column, mapPartitions batching, typed output
    * schema, null payloads) is the real thing.
    */
  def mediaFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("magic", StringType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_frames", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val kindIdx = df.schema.fieldIndex("kind")
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val kind = r.getString(kindIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        if (bytes == null) Row(id, kind, null, null, null, null, null)
        else {
          val n = bytes.length.toLong
          val magic = bytes.take(4).map(b => f"${b & 0xff}%02X").mkString
          Row(id, kind, n, magic,
            64L + n % 577L, 64L + (n * 31L) % 421L, 1L + n % 24L)
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
