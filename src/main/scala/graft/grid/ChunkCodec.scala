package graft.grid

import java.nio.{ByteBuffer, ByteOrder}

/** Chunk payload codecs for [[BinaryGridStore]].
  *
  * Codec grammar: `[pre+]zstd | pre | zstd | none`, with `pre` one of
  *
  *  - `delta` — integer kinds (int/long/timestamp/duration) store the
  *    first value then successive differences, zigzag + LEB128-varint
  *    encoded. Coordinate-like data (timestamps on a regular cadence,
  *    monotonic ids) collapses to a stream of tiny identical varints
  *    that zstd then crushes. Float kinds have no meaningful integer
  *    delta, so `delta` degrades to `shuffle` for them — one codec
  *    string stays valid for a store whose variables mix dtypes.
  *  - `shuffle` — byte transpose (all bytes of significance k adjacent,
  *    the Blosc/Zarr trick): smooth scientific float fields share their
  *    exponent/high-mantissa bytes, so the transposed stream is highly
  *    repetitive and zstd ratios improve severalfold. Lossless and
  *    fixed-size; cost is one pass over the buffer.
  *
  * `zstd`, when present, must be last: it compresses whatever the pre
  * stage produced as a single frame per chunk (one decompress per read,
  * content size recorded in the frame header — needed because a varint
  * stream's decoded length is not `n * width`).
  *
  * Everything here is per-chunk and stateless, so encode runs inside
  * executor write tasks ([[GridWriter]]) and decode inside scan tasks
  * with no coordination. Reference stores reach the same effect through
  * Zarr's numcodecs filter pipeline (delta/shuffle/blosc-zstd); this is
  * the JVM re-expression, not a port.
  */
object ChunkCodec {

  /** (pre stage, zstd?) — throws on anything outside the grammar. */
  def parse(codec: String): (Option[String], Boolean) = codec match {
    case "none" => (None, false)
    case "zstd" => (None, true)
    case "delta" => (Some("delta"), false)
    case "shuffle" => (Some("shuffle"), false)
    case "delta+zstd" => (Some("delta"), true)
    case "shuffle+zstd" => (Some("shuffle"), true)
    case other => throw new IllegalArgumentException(s"bad codec $other")
  }

  def validate(codec: String): Unit = { parse(codec); () }

  private def integerKind(t: GridType): Boolean = t match {
    case GInt | GLong | GTimestamp | GDuration => true
    case _ => false
  }

  def encode(data: AnyRef, codec: String): Array[Byte] = {
    val (pre, zstd) = parse(codec)
    val payload = pre match {
      case Some("delta") => data match {
        case a: Array[Int] => deltaEncode(a.map(_.toLong))
        case a: Array[Long] => deltaEncode(a)
        case _ => shuffleBytes(toLE(data), widthOf(data))
      }
      case Some("shuffle") => shuffleBytes(toLE(data), widthOf(data))
      case _ => toLE(data)
    }
    if (zstd) com.github.luben.zstd.Zstd.compress(payload, 3) else payload
  }

  /** Decode one chunk payload back to its primitive array; `n` is the
    * cell count (known from the chunk shape before any byte is read).
    */
  def decode(raw: Array[Byte], codec: String, dtype: GridType,
      n: Int): AnyRef = {
    val (pre, zstd) = parse(codec)
    val bytes = if (!zstd) raw else {
      val sz = pre match {
        case Some("delta") if integerKind(dtype) =>
          com.github.luben.zstd.Zstd.getFrameContentSize(raw)
        case _ => n.toLong * dtype.byteWidth
      }
      com.github.luben.zstd.Zstd.decompress(raw, sz.toInt)
    }
    pre match {
      case Some("delta") if integerKind(dtype) =>
        val longs = deltaDecode(bytes, n)
        dtype match {
          case GInt => longs.map(_.toInt)
          case _ => longs
        }
      case Some(_) => fromLE(unshuffleBytes(bytes, dtype.byteWidth), dtype, n)
      case None => fromLE(bytes, dtype, n)
    }
  }

  // ---- delta + zigzag + LEB128 varint --------------------------------

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def deltaEncode(a: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](a.length * 10 + 1)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < a.length) {
      var v = zigzag(a(i) - prev)
      prev = a(i)
      while ((v & ~0x7fL) != 0) {
        out(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7
      }
      out(pos) = v.toByte; pos += 1
      i += 1
    }
    java.util.Arrays.copyOf(out, pos)
  }

  private def deltaDecode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
        v |= (b & 0x7fL) << shift; shift += 7
      }
      v |= b.toLong << shift
      prev += unzigzag(v)
      out(i) = prev
      i += 1
    }
    out
  }

  // ---- byte transpose ------------------------------------------------

  private[grid] def shuffleBytes(raw: Array[Byte], w: Int): Array[Byte] = {
    val n = raw.length / w
    val out = new Array[Byte](raw.length)
    var b = 0
    while (b < w) {
      var i = 0
      while (i < n) { out(b * n + i) = raw(i * w + b); i += 1 }
      b += 1
    }
    out
  }

  private[grid] def unshuffleBytes(raw: Array[Byte], w: Int): Array[Byte] = {
    val n = raw.length / w
    val out = new Array[Byte](raw.length)
    var b = 0
    while (b < w) {
      var i = 0
      while (i < n) { out(i * w + b) = raw(b * n + i); i += 1 }
      b += 1
    }
    out
  }

  // ---- fixed-width little-endian base layer --------------------------

  private def widthOf(data: AnyRef): Int = data match {
    case _: Array[Double] | _: Array[Long] => 8
    case _: Array[Float] | _: Array[Int] => 4
  }

  private[grid] def toLE(data: AnyRef): Array[Byte] = data match {
    case a: Array[Double] =>
      val bb = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.asDoubleBuffer().put(a); bb.array()
    case a: Array[Float] =>
      val bb = ByteBuffer.allocate(a.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.asFloatBuffer().put(a); bb.array()
    case a: Array[Int] =>
      val bb = ByteBuffer.allocate(a.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.asIntBuffer().put(a); bb.array()
    case a: Array[Long] =>
      val bb = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(a); bb.array()
  }

  private def fromLE(bytes: Array[Byte], dtype: GridType, n: Int): AnyRef = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case GDouble => val a = new Array[Double](n); bb.asDoubleBuffer().get(a); a
      case GFloat => val a = new Array[Float](n); bb.asFloatBuffer().get(a); a
      case GInt => val a = new Array[Int](n); bb.asIntBuffer().get(a); a
      case GLong | GTimestamp | GDuration =>
        val a = new Array[Long](n); bb.asLongBuffer().get(a); a
      case GString => throw new IllegalArgumentException(
        "string variables unsupported in BinaryGridStore")
    }
  }
}
