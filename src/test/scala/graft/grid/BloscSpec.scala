package graft.grid

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM Blosc1 codec: round trips across inner codecs, the split
  * container layout zarr-python's defaults actually produce (hand-encoded
  * here byte by byte, independent of [[Blosc.compress]]), memcpy mode,
  * the byte-shuffle filter, and the end-to-end ZarrGridStore blosc
  * write/open path.
  */
class BloscSpec extends AnyFunSuite {

  private def doubles(n: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putDouble(i * 0.5 - 3.0))
    bb.array()
  }

  test("compress/decompress round trips: codecs x shuffle x sizes") {
    val sizes = Seq(0, 1, 7, 8, 64, 1000) // empty, sub-element, leftover
    for {
      codec <- Seq("lz4", "zstd", "zlib", "snappy")
      shuffle <- Seq(true, false)
      n <- sizes
    } {
      val data = doubles(n)
      val enc = Blosc.compress(data, typesize = 8, codec = codec,
        shuffle = shuffle, blocksize = 128) // force multi-block at n>=17
      val dec = Blosc.decompress(enc, data.length)
      assert(dec.sameElements(data), s"$codec shuffle=$shuffle n=$n")
    }
  }

  test("incompressible input falls back to valid memcpy mode") {
    val rnd = new scala.util.Random(42)
    val data = new Array[Byte](4096)
    rnd.nextBytes(data)
    val enc = Blosc.compress(data, typesize = 8)
    assert(enc.length == 16 + data.length) // memcpy container
    assert((enc(2) & 0x02) != 0)           // memcpy flag
    assert(Blosc.decompress(enc, data.length).sameElements(data))
  }

  test("byte shuffle groups lanes and inverts exactly") {
    val src = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9) // 2 els of 4 + 1 left
    val sh = new Array[Byte](9)
    Blosc.shuffleBytes(4, src, 0, 9, sh)
    assert(sh.sameElements(Array[Byte](1, 5, 2, 6, 3, 7, 4, 8, 9)))
    val back = new Array[Byte](9)
    Blosc.unshuffle(4, sh, 9, back, 0)
    assert(back.sameElements(src))
  }

  test("hand-encoded split container (numcodecs default layout) decodes") {
    // One full block, typesize 8, shuffle on, NO dont-split flag: the
    // layout c-blosc emits for its lz4 default. 64 doubles = 512 bytes,
    // blocksize 512 -> 8 splits of 64 bytes, each [int32 csize][payload].
    val n = 64
    val data = doubles(n)
    val shuffled = new Array[Byte](512)
    Blosc.shuffleBytes(8, data, 0, 512, shuffled)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val splits = (0 until 8).map { k =>
      val lane = java.util.Arrays.copyOfRange(shuffled, k * 64, (k + 1) * 64)
      val buf = new Array[Byte](lz4.maxCompressedLength(64))
      val c = lz4.compress(lane, 0, 64, buf, 0, buf.length)
      // csize == neblock marks a stored split; exercise both paths
      if (c < 64) java.util.Arrays.copyOf(buf, c) else lane
    }
    val body = splits.map(s => 4 + s.length).sum
    val total = 16 + 4 + body // header + one bstart + split streams
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
      .put(((1 << 5) | 0x01).toByte) // codec lz4, byte-shuffle, SPLIT
      .put(8.toByte)
      .putInt(512).putInt(512).putInt(total)
    bb.putInt(20) // bstart: right after the offsets array
    splits.foreach { s => bb.putInt(s.length); bb.put(s) }
    val dec = Blosc.decompress(bb.array(), 512)
    assert(dec.sameElements(data))
    // sanity: at least one split actually compressed (monotone ramp)
    assert(splits.exists(_.length < 64))
  }

  test("hand-encoded memcpy container decodes") {
    val data = doubles(5)
    val bb = ByteBuffer.allocate(16 + 40).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put(((1 << 5) | 0x02).toByte).put(8.toByte)
    bb.putInt(40).putInt(40).putInt(56)
    bb.put(data)
    assert(Blosc.decompress(bb.array(), 40).sameElements(data))
  }

  test("clear rejections: blosclz, bit-shuffle, bad sizes") {
    val ok = Blosc.compress(doubles(8), 8)
    // corrupt the codec id to blosclz (0)
    val blz = ok.clone(); blz(2) = (blz(2) & 0x1f).toByte
    val e1 = intercept[IllegalArgumentException](Blosc.decompress(blz, 64))
    assert(e1.getMessage.contains("blosclz"))
    val bit = ok.clone(); bit(2) = (bit(2) | 0x04).toByte
    val e2 = intercept[IllegalArgumentException](Blosc.decompress(bit, 64))
    assert(e2.getMessage.contains("bit-shuffle"))
    val e3 = intercept[IllegalArgumentException](Blosc.decompress(ok, 63))
    assert(e3.getMessage.contains("expected 63"))
  }

  test("ZarrGridStore writes and reopens a blosc tree") {
    val root = Files.createTempDirectory("zarr_blosc")
    root.toFile.deleteOnExit()
    val path = root.resolve("store").toString
    val store = ZarrGridStore.write(Fixtures.linearGrid, path,
      Map("t" -> 6, "lat" -> 5), "blosc")
    // .zarray carries the numcodecs-compatible compressor spelling
    val za = Files.readString(
      java.nio.file.Paths.get(path, "air", ".zarray"))
    assert(za.contains("\"id\":\"blosc\"") && za.contains("\"cname\":\"lz4\"")
      && za.contains("\"shuffle\":1"))
    val full = Seq((0, 24), (0, 12), (0, 10))
    assert(store.readVar("air", full).asInstanceOf[Array[Double]]
      .sameElements(Fixtures.linearGrid.readVar("air", full)
        .asInstanceOf[Array[Double]]))
    // ragged edge chunk (padded stored shape) decodes through blosc too
    val edge = Seq((20, 4), (10, 2), (0, 10))
    assert(store.readVar("air", edge).asInstanceOf[Array[Double]]
      .sameElements(Fixtures.linearGrid.readVar("air", edge)
        .asInstanceOf[Array[Double]]))
  }
}
