package graft.grid

import org.scalatest.funsuite.AnyFunSuite

/** Codec-layer laws: every (dtype, codec) pair round-trips exactly, and
  * the two pre-stages earn their keep — delta varints collapse regular
  * integer cadences, byte shuffle makes zstd bite on smooth floats.
  */
class ChunkCodecSpec extends AnyFunSuite {

  private val codecs =
    Seq("none", "zstd", "delta", "shuffle", "delta+zstd", "shuffle+zstd")

  private def rt(data: AnyRef, dtype: GridType, n: Int): Unit =
    codecs.foreach { c =>
      val back = ChunkCodec.decode(ChunkCodec.encode(data, c), c, dtype, n)
      // bitwise comparison: NaN must round-trip as the same NaN
      val same = (data, back) match {
        case (a: Array[Double], b: Array[Double]) =>
          a.map(java.lang.Double.doubleToRawLongBits).toSeq ==
            b.map(java.lang.Double.doubleToRawLongBits).toSeq
        case (a: Array[Float], b: Array[Float]) =>
          a.map(java.lang.Float.floatToRawIntBits).toSeq ==
            b.map(java.lang.Float.floatToRawIntBits).toSeq
        case (a, b) => a.asInstanceOf[Array[_]].toSeq ==
          b.asInstanceOf[Array[_]].toSeq
      }
      assert(same, s"$dtype / $c")
    }

  test("all dtypes round-trip exactly through every codec") {
    val rnd = new scala.util.Random(7)
    val n = 257 // odd length: exercises varint tails and shuffle strides
    rt(Array.fill(n)(rnd.nextDouble() * 400 - 200), GDouble, n)
    rt(Array.fill(n)(rnd.nextFloat()), GFloat, n)
    rt(Array.fill(n)(rnd.nextInt()), GInt, n)
    rt(Array.fill(n)(rnd.nextLong()), GLong, n)
    rt(Array.tabulate(n)(i => 1577836800000000L + i * 3600000000L),
      GTimestamp, n)
    rt(Array(Long.MinValue, -1L, 0L, 1L, Long.MaxValue), GLong, 5)
    rt(Array(Int.MinValue, -1, 0, 1, Int.MaxValue), GInt, 5)
    rt(Array(Double.NaN, Double.PositiveInfinity, -0.0, 1e308), GDouble, 4)
  }

  test("delta varints collapse a regular timestamp cadence") {
    val n = 4096
    val hourly = Array.tabulate(n)(i => 1577836800000000L + i * 3600000000L)
    val delta = ChunkCodec.encode(hourly, "delta")
    val plain = ChunkCodec.encode(hourly, "none")
    // every delta is one identical ~5-byte varint (vs 8 raw bytes)...
    assert(delta.length < plain.length * 7 / 10,
      s"delta ${delta.length} vs raw ${plain.length}")
    // ...so zstd collapses the stream to almost nothing
    val dz = ChunkCodec.encode(hourly, "delta+zstd")
    val z = ChunkCodec.encode(hourly, "zstd")
    assert(dz.length < z.length, s"delta+zstd ${dz.length} vs zstd ${z.length}")
    assert(dz.length < 1000, s"delta+zstd ${dz.length} should be ~constant")
  }

  test("byte shuffle improves zstd on smooth float fields") {
    val n = 4096
    // a smooth physical field: slowly-varying values sharing exponent
    // and high-mantissa bytes (the case raw zstd barely compresses)
    val smooth = Array.tabulate(n)(i => 250.0 + math.sin(i / 64.0) * 10.0
      + (i % 17) * 1e-5)
    val sz = ChunkCodec.encode(smooth, "shuffle+zstd")
    val z = ChunkCodec.encode(smooth, "zstd")
    assert(sz.length < z.length, s"shuffle+zstd ${sz.length} vs zstd ${z.length}")
  }

  test("delta degrades to shuffle for float kinds, still lossless") {
    val a = Array.tabulate(100)(i => i * 0.5 - 3.25)
    val enc = ChunkCodec.encode(a, "delta+zstd")
    val back = ChunkCodec.decode(enc, "delta+zstd", GDouble, 100)
    assert(back.asInstanceOf[Array[Double]].toSeq == a.toSeq)
  }

  test("bad codec strings are rejected at validation") {
    intercept[IllegalArgumentException](ChunkCodec.validate("zstd+delta"))
    intercept[IllegalArgumentException](ChunkCodec.validate("lz4"))
    intercept[IllegalArgumentException](ChunkCodec.validate(""))
  }
}
