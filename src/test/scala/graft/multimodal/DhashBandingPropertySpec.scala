package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized pigeonhole law behind every banded hamming search
  * (`image_dhash_pairs`, `MediaStreams.nearDupPairStream`): two 64-bit
  * signatures within hamming distance 3 MUST agree on at least one of
  * the 4 disjoint 16-bit bands — 3 differing bits cannot touch 4
  * disjoint bands — so the (band, key) equi-join provably contains
  * every qualifying pair. The property drives it over random
  * signatures and random <=3-bit flips, plus the adversarial
  * boundary: flips straddling band edges and the sign bit (bit 63).
  */
class DhashBandingPropertySpec extends AnyFunSuite {

  private def bands(h: Long): Seq[Long] =
    (0 until 4).map(p => (h >>> (16 * p)) & 0xffffL)

  private def shareBand(a: Long, b: Long): Boolean =
    bands(a).zip(bands(b)).exists { case (x, y) => x == y }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("hamming <= 3 forces a shared 16-bit band (pigeonhole)") {
    val gen = for {
      h <- Gen.long
      n <- Gen.choose(0, 3)
      bits <- Gen.listOfN(n, Gen.choose(0, 63))
    } yield (h, bits.foldLeft(h)((acc, b) => acc ^ (1L << b)))
    check("pigeonhole", Prop.forAll(gen) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) > 3 || shareBand(a, b)
    })
  }

  test("band-edge and sign-bit flips still share a band") {
    // 3 flips packed to straddle two band boundaries + the sign bit —
    // the worst case still leaves one band untouched
    val edges = Seq(15, 16, 31, 32, 47, 48, 63)
    for (Seq(x, y, z) <- edges.combinations(3)) {
      val a = 0x5a5a5a5a5a5a5a5aL
      val b = a ^ (1L << x) ^ (1L << y) ^ (1L << z)
      assert(shareBand(a, b), f"flips $x/$y/$z: $a%016x vs $b%016x")
    }
  }

  test("4 flips, one per band, CAN defeat banding (the bound is tight)") {
    val a = 0L
    val b = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 63)
    assert(!shareBand(a, b),
      "hamming 4 spread across all bands must not share one — " +
        "maxHamming > 3 would silently lose recall")
  }
}
