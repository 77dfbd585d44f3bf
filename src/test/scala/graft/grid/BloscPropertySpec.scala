package graft.grid

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based law of the pure-JVM Blosc1 codec: for ANY payload,
  * typesize, inner codec, shuffle setting and block size,
  * `decompress(compress(x)) == x` — including payloads that do not
  * divide into whole elements, incompressible payloads (memcpy
  * fallback), and block-boundary-straddling sizes. The container must
  * also round-trip the half-float and delta byte images the other
  * decode stages hand it, which is why payload content is arbitrary
  * bytes, not structured values.
  */
class BloscPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val payloadGen: Gen[Array[Byte]] = Gen.oneOf(
    // compressible: repeated small alphabet
    Gen.choose(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 3)).map(_.map(_.toByte).toArray)),
    // incompressible: full-range random bytes (exercises memcpy mode)
    Gen.choose(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue.toInt, Byte.MaxValue.toInt))
        .map(_.map(_.toByte).toArray)))

  test("compress/decompress round trips for arbitrary payloads") {
    check("blosc-roundtrip", Prop.forAll(
      payloadGen,
      Gen.oneOf(1, 2, 4, 8, 3), // incl. a non-power-of-two typesize
      Gen.oneOf("lz4", "zstd", "zlib", "snappy"),
      Gen.oneOf(true, false),
      Gen.oneOf(0, 64, 100, 1024) // 0 = default block size
    ) { (data, typesize, codec, shuffle, blocksize) =>
      val enc = Blosc.compress(data, typesize, codec,
        shuffle = shuffle, blocksize = blocksize)
      val dec = Blosc.decompress(enc, data.length)
      Prop(dec.sameElements(data)) :| s"n=${data.length} ts=$typesize " +
        s"codec=$codec shuffle=$shuffle bs=$blocksize"
    })
  }

  test("shuffle/unshuffle invert for arbitrary sizes and lanes") {
    check("shuffle-inverse", Prop.forAll(
      payloadGen, Gen.oneOf(1, 2, 3, 4, 8, 16)
    ) { (data, ts) =>
      val sh = new Array[Byte](data.length)
      Blosc.shuffleBytes(ts, data, 0, data.length, sh)
      val back = new Array[Byte](data.length)
      Blosc.unshuffle(ts, sh, data.length, back, 0)
      Prop(back.sameElements(data)) :| s"n=${data.length} ts=$ts"
    })
  }

  test("half float conversions are mutually consistent for all 65536 bit patterns") {
    // every finite half h must satisfy floatToHalf(halfToFloat(h)) == h
    // (round-to-nearest of an exactly representable value is identity)
    var h = 0
    while (h < 0x10000) {
      val s = h.toShort
      val f = ZarrGridStore.halfToFloat(s)
      if (!f.isNaN) {
        val back = ZarrGridStore.floatToHalf(f)
        // -0.0 encodes sign; everything else must round-trip bit-exactly
        assert(back == s, f"half 0x$h%04x -> $f -> 0x${back & 0xffff}%04x")
      }
      h += 1
    }
  }
}
