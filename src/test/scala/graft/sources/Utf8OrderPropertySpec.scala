package graft.sources

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws for [[Utf8Order]]: every string-pruning claim rides
  * on it reproducing Spark's UTF8_BINARY comparison bit-for-bit, so
  * the property pins it against `UTF8String` itself over adversarial
  * strings — full BMP, supplementary codepoints (surrogate pairs),
  * UNPAIRED surrogates (which both sides must replace identically on
  * encode), and shared-prefix families that stress the tie-breaking
  * tail bytes.
  */
class Utf8OrderPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // characters chosen to cross UTF-8 length boundaries and include
  // raw surrogate halves (U+D800/U+DFFF) — legal in a Java String,
  // replaced on UTF-8 encode
  private val charGen: Gen[Char] = Gen.oneOf(
    Gen.choose(0x20, 0x7e), // 1-byte
    Gen.choose(0x80, 0x7ff), // 2-byte
    Gen.choose(0x800, 0xd7ff), // 3-byte below surrogates
    Gen.choose(0xd800, 0xdfff), // raw surrogate halves
    Gen.choose(0xe000, 0xfffd)) // 3-byte above surrogates
    .map(_.toChar)

  private val strGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, charGen)
    // sometimes append a valid supplementary pair so real 4-byte
    // sequences occur too
    sup <- Gen.oneOf("", new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x10FFFF)))
  } yield cs.mkString + sup

  // three shapes: shared-prefix (first difference deep in the tail),
  // one-is-a-prefix-of-the-other, and unrelated — the cases pruning
  // math relies on
  private val pairGen: Gen[(String, String)] = for {
    p <- strGen; a <- strGen; b <- strGen
    mode <- Gen.choose(0, 2)
  } yield mode match {
    case 0 => (p + a, p + b)
    case 1 => (p, p + a)
    case _ => (a, b)
  }

  test("compare == UTF8String.binaryCompare for all generated pairs") {
    check("compare", Prop.forAll(pairGen) { case (a, b) =>
      Integer.signum(Utf8Order.compare(a, b)) ==
        Integer.signum(
          UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b)))
    })
  }

  test("startsWith == UTF8String.startsWith for all generated pairs") {
    check("startsWith", Prop.forAll(pairGen) { case (a, b) =>
      Utf8Order.startsWith(a, b) ==
        UTF8String.fromString(a).startsWith(UTF8String.fromString(b))
    })
  }

  test("prefixSuccessor strictly bounds every BYTE-prefixed extension") {
    // the law pruning needs: every string whose BYTES start with
    // bytes(p) is below succ(p). String concatenation p + tail is NOT
    // always such an extension — an unpaired trailing surrogate in p
    // can merge with a leading low surrogate in tail into a real pair,
    // changing the encoding — but those strings do not byte-prefix
    // match p either, so StringStartsWith never selects them and the
    // bound need not cover them.
    check("prefixSuccessor", Prop.forAll(strGen, strGen) { (p, tail) =>
      Utf8Order.prefixSuccessor(p) match {
        case None => true // all-0xFF or empty: no finite successor
        case Some(s) =>
          val ext = p + tail
          (!Utf8Order.startsWith(ext, p) ||
            Utf8Order.compareRaw(s, ext) > 0) &&
            // minimal enough that p itself is strictly below
            Utf8Order.compareRaw(s, p) > 0
      }
    })
  }
}
