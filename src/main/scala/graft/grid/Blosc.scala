package graft.grid

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM Blosc1 container codec.
  *
  * Blosc is the de-facto default chunk compressor of the Zarr v2
  * ecosystem (zarr-python's `numcodecs.Blosc`, cname=lz4, shuffle=1 by
  * default) — the reference's flagship ARCO-ERA5 input is blosc-encoded
  * (reference perf_tests/open_era5.py:7-8, README.md:76-77), so without
  * this decoder most real-world v2 trees must be re-encoded before
  * [[ZarrGridStore]] can read them.
  *
  * The container format is public (c-blosc 1.x `blosc.c`/`blosc.h`):
  *
  * {{{
  * byte  0      format version (2 for every c-blosc 1.x / numcodecs)
  * byte  1      inner-codec version (informational)
  * byte  2      flags: 0x01 byte-shuffle | 0x02 memcpy | 0x04 bit-shuffle
  *              | 0x08 delta | 0x10 dont-split | codec id in bits 5-7
  *              (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd)
  * byte  3      typesize (element width the shuffle filter used)
  * bytes 4-7    nbytes   (uncompressed size, int32 LE)
  * bytes 8-11   blocksize (int32 LE)
  * bytes 12-15  cbytes   (total compressed size incl. header, int32 LE)
  * }}}
  *
  * memcpy mode: raw payload follows the header. Otherwise an int32-LE
  * array of per-block offsets (relative to buffer start) follows, one
  * per `ceil(nbytes / blocksize)` block. Each block holds `nsplits`
  * streams — `typesize` streams for a full block without the dont-split
  * flag, else 1 — each a `[int32 LE csize][payload]` pair where
  * `csize == neblock` marks an uncompressed (stored) stream. Byte-shuffle
  * is applied per block AFTER concatenating its splits.
  *
  * Inner codecs use the raw-block libraries Spark already bundles
  * (lz4-java, zstd-jni, snappy-java, java.util.zip) — no new
  * dependencies, works on executors everywhere — plus a pure-JVM
  * [[BloscLz]] for `blosclz`, the historical c-blosc default older
  * public archives are encoded with. Both shuffle filters decode:
  * byte-shuffle (flag 0x01) and bit-shuffle (flag 0x04, the bitshuffle
  * library's LSB-first bit-matrix transpose in 8-element groups).
  *
  * The [[compress]]/[[compressMode]] side emits the same container
  * (dont-split layout, optional byte- or bit-shuffle) so
  * [[ZarrGridStore.write]] doubles as a blosc-encoding Zarr sink and
  * decode is round-trip-testable without a native c-blosc in the
  * container.
  */
object Blosc {

  private val FlagShuffle = 0x01
  private val FlagMemcpy = 0x02
  private val FlagBitShuffle = 0x04
  private val FlagDelta = 0x08
  private val FlagDontSplit = 0x10

  private val CodecBloscLz = 0
  private val CodecLz4 = 1
  private val CodecSnappy = 2
  private val CodecZlib = 3
  private val CodecZstd = 4

  /** Decode one blosc1 buffer; `expected` is the caller's known
    * uncompressed size (cross-checked against the header).
    */
  def decompress(raw: Array[Byte], expected: Int): Array[Byte] = {
    require(raw.length >= 16, s"blosc buffer too short (${raw.length} B)")
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val version = bb.get(0) & 0xff
    val flags = bb.get(2) & 0xff
    val typesize = bb.get(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    val cbytes = bb.getInt(12)
    require(version == 2,
      s"unsupported blosc format version $version (c-blosc 1.x writes 2)")
    require(nbytes == expected,
      s"blosc header says $nbytes uncompressed bytes, expected $expected")
    require(cbytes == raw.length,
      s"blosc header says $cbytes total bytes, buffer has ${raw.length}")
    require((flags & FlagDelta) == 0, "blosc delta filter unsupported")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & FlagMemcpy) != 0) {
      require(raw.length >= 16 + nbytes, "truncated memcpy blosc buffer")
      System.arraycopy(raw, 16, out, 0, nbytes)
      return out
    }
    require(blocksize > 0, s"bad blosc blocksize $blocksize")
    val codec = (flags >> 5) & 0x7
    val byteShuffle = (flags & FlagShuffle) != 0 && typesize > 1
    val bitShuffled = (flags & FlagBitShuffle) != 0
    require(!(byteShuffle && bitShuffled),
      "blosc buffer claims both byte- and bit-shuffle")
    val shuffle = byteShuffle || bitShuffled
    val dontSplit = (flags & FlagDontSplit) != 0
    val nblocks = (nbytes + blocksize - 1) / blocksize
    // a block offset inside the header or the offsets table itself is
    // corruption; fail here instead of decoding the table as payload
    require(raw.length >= 16 + 4 * nblocks,
      s"blosc buffer shorter than its $nblocks-entry offset table")
    val tmp = if (shuffle) new Array[Byte](blocksize) else null
    var j = 0
    while (j < nblocks) {
      val bstart = bb.getInt(16 + 4 * j)
      require(bstart >= 16 + 4 * nblocks && bstart < raw.length,
        s"blosc block $j offset $bstart out of range")
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      // full blocks split into one stream per shuffled byte lane unless
      // the writer set dont-split; leftover blocks are always one stream
      val nsplits = if (!dontSplit && !leftover) math.max(typesize, 1) else 1
      require(bsize % nsplits == 0,
        s"blosc block $j: $bsize bytes not divisible into $nsplits splits")
      val neblock = bsize / nsplits
      val dest = if (shuffle) tmp else out
      val destBase = if (shuffle) 0 else j * blocksize
      var src = bstart
      var s = 0
      while (s < nsplits) {
        val csize = bb.getInt(src)
        src += 4
        require(csize > 0 && src + csize <= raw.length,
          s"blosc block $j split $s: bad csize $csize")
        if (csize == neblock) // stored uncompressed
          System.arraycopy(raw, src, dest, destBase + s * neblock, neblock)
        else
          inner(codec, raw, src, csize, dest, destBase + s * neblock, neblock)
        src += csize
        s += 1
      }
      if (byteShuffle) unshuffle(typesize, tmp, bsize, out, j * blocksize)
      else if (bitShuffled) bitUnshuffle(typesize, tmp, bsize, out, j * blocksize)
      j += 1
    }
    out
  }

  /** Encode `data` as a blosc1 buffer (dont-split layout). `codec` is
    * `lz4 | zstd | zlib | snappy | blosclz`; `shuffle` applies the
    * byte-shuffle filter with `typesize`-byte lanes; `blocksize` 0
    * picks a default. Falls back to memcpy mode when compression does
    * not help.
    */
  def compress(data: Array[Byte], typesize: Int, codec: String = "lz4",
      level: Int = 5, shuffle: Boolean = true,
      blocksize: Int = 0): Array[Byte] =
    compressMode(data, typesize, codec, level,
      if (shuffle) ShuffleByte else ShuffleNone, blocksize)

  /** Shuffle-mode constants of [[compressMode]] (match the container's
    * flag semantics: none / byte lanes / bit transpose).
    */
  val ShuffleNone = 0
  val ShuffleByte = 1
  val ShuffleBit = 2

  /** [[compress]] with an explicit shuffle mode — [[ShuffleBit]] emits
    * the bit-shuffle filter real archives use for low-entropy packed
    * integer data.
    */
  def compressMode(data: Array[Byte], typesize: Int, codec: String = "lz4",
      level: Int = 5, shuffleMode: Int = ShuffleByte,
      blocksize: Int = 0): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"bad typesize $typesize")
    val (codecId, lz4hc) = codec match {
      case "lz4" => (CodecLz4, false)
      case "lz4hc" => (CodecLz4, true) // same raw-block format, HC search
      case "zstd" => (CodecZstd, false)
      case "zlib" => (CodecZlib, false)
      case "snappy" => (CodecSnappy, false)
      case "blosclz" => (CodecBloscLz, false)
      case other =>
        throw new IllegalArgumentException(s"unsupported blosc cname '$other'")
    }
    val nbytes = data.length
    // default ~256 KiB blocks, aligned so full blocks shuffle into exact
    // lanes: typesize-aligned for byte shuffle, typesize*8-aligned for
    // bit shuffle (8-element bit groups)
    val align = if (shuffleMode == ShuffleBit) typesize * 8 else typesize
    val bs0 = if (blocksize > 0) blocksize else 256 * 1024
    val bs = math.max(align, bs0 - bs0 % align)
    val doShuffle = shuffleMode == ShuffleByte && typesize > 1
    val doBitShuffle = shuffleMode == ShuffleBit
    val nblocks = if (nbytes == 0) 0 else (nbytes + bs - 1) / bs
    val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    val flagsBase = (codecId << 5) | FlagDontSplit |
      (if (doShuffle) FlagShuffle else 0) |
      (if (doBitShuffle) FlagBitShuffle else 0)

    val blockPayloads = (0 until nblocks).map { j =>
      val bsize = math.min(bs, nbytes - j * bs)
      val chunk = new Array[Byte](bsize)
      if (doShuffle) shuffleBytes(typesize, data, j * bs, bsize, chunk)
      else if (doBitShuffle) bitShuffle(typesize, data, j * bs, bsize, chunk)
      else System.arraycopy(data, j * bs, chunk, 0, bsize)
      val comp = innerCompress(codecId, level, chunk, lz4hc)
      // stored-raw split when compression does not win (csize==neblock
      // is the spec'd marker, so an incompressible block stays valid)
      val payload = if (comp.length < bsize) comp else chunk
      val withLen = ByteBuffer.allocate(4 + payload.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      withLen.putInt(payload.length).put(payload)
      withLen.array()
    }
    val bodyLen = blockPayloads.map(_.length).sum
    val total = 16 + 4 * nblocks + bodyLen
    if (total >= 16 + nbytes) {
      // compression lost: memcpy mode, as c-blosc does
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(0.toByte)
        .put(((codecId << 5) | FlagMemcpy).toByte)
        .put(typesize.toByte)
        .putInt(nbytes).putInt(math.min(bs, math.max(nbytes, 1)))
        .putInt(16 + nbytes)
      out.put(data)
      return out.array()
    }
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(0.toByte).put(flagsBase.toByte).put(typesize.toByte)
    out.putInt(nbytes).putInt(bs).putInt(total)
    var off = 16 + 4 * nblocks
    blockPayloads.foreach { p => out.putInt(off); off += p.length }
    blockPayloads.foreach(out.put)
    out.array()
  }

  // ---- inner codecs (raw-block formats, matching c-blosc's calls) ----

  private def inner(codec: Int, src: Array[Byte], srcOff: Int, srcLen: Int,
      dest: Array[Byte], destOff: Int, destLen: Int): Unit = codec match {
    case CodecLz4 =>
      val n = net.jpountz.lz4.LZ4Factory.fastestInstance()
        .safeDecompressor()
        .decompress(src, srcOff, srcLen, dest, destOff, destLen)
      require(n == destLen, s"lz4 split yields $n of $destLen bytes")
    case CodecZstd =>
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        dest, destOff, destLen, src, srcOff, srcLen)
      require(n == destLen, s"zstd split yields $n of $destLen bytes")
    case CodecZlib =>
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(src, srcOff, srcLen)
        var off = destOff
        val end = destOff + destLen
        while (off < end && !inf.finished()) {
          val n = inf.inflate(dest, off, end - off)
          require(n > 0 || !inf.needsInput, "truncated zlib split")
          off += n
        }
        require(off == end, s"zlib split yields ${off - destOff} of $destLen")
      } finally inf.end()
    case CodecSnappy =>
      val n = org.xerial.snappy.Snappy.uncompress(
        src, srcOff, srcLen, dest, destOff)
      require(n == destLen, s"snappy split yields $n of $destLen bytes")
    case CodecBloscLz =>
      BloscLz.decompress(src, srcOff, srcLen, dest, destOff, destLen)
    case other => throw new IllegalArgumentException(
      s"unknown blosc inner codec id $other")
  }

  private def innerCompress(codec: Int, level: Int,
      chunk: Array[Byte], lz4hc: Boolean = false): Array[Byte] = codec match {
    case CodecLz4 =>
      val f = net.jpountz.lz4.LZ4Factory.fastestInstance()
      val c = if (lz4hc) f.highCompressor() else f.fastCompressor()
      val buf = new Array[Byte](c.maxCompressedLength(chunk.length))
      val n = c.compress(chunk, 0, chunk.length, buf, 0, buf.length)
      java.util.Arrays.copyOf(buf, n)
    case CodecZstd => com.github.luben.zstd.Zstd.compress(chunk, level)
    case CodecZlib =>
      val d = new java.util.zip.Deflater(math.min(9, math.max(1, level)))
      try {
        d.setInput(chunk); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        bos.toByteArray
      } finally d.end()
    case CodecSnappy => org.xerial.snappy.Snappy.compress(chunk)
    case CodecBloscLz => BloscLz.compress(chunk, 0, chunk.length)
    case other => throw new IllegalArgumentException(
      s"unknown blosc inner codec id $other")
  }

  // ---- byte shuffle filter -------------------------------------------

  /** Forward byte-shuffle of `src[srcOff, srcOff+bsize)` into `dest`:
    * byte lane k of every element becomes contiguous. Trailing bytes
    * beyond the last whole element copy through unshuffled (c-blosc's
    * leftover rule).
    */
  private[grid] def shuffleBytes(typesize: Int, src: Array[Byte],
      srcOff: Int, bsize: Int, dest: Array[Byte]): Unit = {
    val nel = bsize / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      var d = k * nel
      while (i < nel) {
        dest(d) = src(srcOff + i * typesize + k)
        d += 1
        i += 1
      }
      k += 1
    }
    val done = nel * typesize
    if (done < bsize)
      System.arraycopy(src, srcOff + done, dest, done, bsize - done)
  }

  // ---- bit shuffle filter --------------------------------------------

  /** Forward BIT-shuffle (the bitshuffle library's transform, c-blosc
    * flag 0x04): the block's first `n8 = 8 * (nelem / 8)` elements form
    * an `n8 x (typesize*8)` bit matrix (bit b of an element = bit b%8,
    * LSB first, of its byte b/8); the output is its transpose — row b
    * holds bit b of every element, packed 8 elements per byte, element
    * j of each 8-group at bit position j. Bytes past the last whole
    * 8-element group copy through unshuffled (c-blosc's leftover rule,
    * same as byte shuffle).
    */
  private[grid] def bitShuffle(typesize: Int, src: Array[Byte],
      srcOff: Int, bsize: Int, dest: Array[Byte]): Unit = {
    val n = bsize / typesize
    val n8 = n - (n % 8)
    val rowBytes = n8 / 8
    var t = 0
    while (t < typesize) {
      var b = 0
      while (b < 8) {
        val base = (t * 8 + b) * rowBytes
        var g = 0
        while (g < rowBytes) {
          var outByte = 0
          var j = 0
          while (j < 8) {
            val v = src(srcOff + (g * 8 + j) * typesize + t)
            outByte |= ((v >> b) & 1) << j
            j += 1
          }
          dest(base + g) = outByte.toByte
          g += 1
        }
        b += 1
      }
      t += 1
    }
    val done = n8 * typesize
    if (done < bsize)
      System.arraycopy(src, srcOff + done, dest, done, bsize - done)
  }

  /** Inverse of [[bitShuffle]], writing to `dest[destOff, +bsize)`. */
  private[grid] def bitUnshuffle(typesize: Int, src: Array[Byte],
      bsize: Int, dest: Array[Byte], destOff: Int): Unit = {
    val n = bsize / typesize
    val n8 = n - (n % 8)
    val rowBytes = n8 / 8
    var t = 0
    while (t < typesize) {
      var e = 0
      while (e < n8) {
        val g = e / 8
        val j = e % 8
        var v = 0
        var b = 0
        while (b < 8) {
          v |= ((src((t * 8 + b) * rowBytes + g) >> j) & 1) << b
          b += 1
        }
        dest(destOff + e * typesize + t) = v.toByte
        e += 1
      }
      t += 1
    }
    val done = n8 * typesize
    if (done < bsize)
      System.arraycopy(src, done, dest, destOff + done, bsize - done)
  }

  /** Inverse of [[shuffleBytes]], writing to `dest[destOff, +bsize)`. */
  private[grid] def unshuffle(typesize: Int, src: Array[Byte], bsize: Int,
      dest: Array[Byte], destOff: Int): Unit = {
    val nel = bsize / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      var s = k * nel
      while (i < nel) {
        dest(destOff + i * typesize + k) = src(s)
        s += 1
        i += 1
      }
      k += 1
    }
    val done = nel * typesize
    if (done < bsize)
      System.arraycopy(src, done, dest, destOff + done, bsize - done)
  }
}
