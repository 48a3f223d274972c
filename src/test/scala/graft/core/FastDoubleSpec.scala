package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** FastDouble must be bit-identical to Double.parseDouble on every valid
  * JSON number token — the correctness gate hashes doubles exactly.
  */
object FastDoubleSpec {
  private def indicesOf(s: String): (Int, Int) = {
    val dec = s.indexOf('.')
    val e0 = s.indexOf('e')
    (dec, if (e0 >= 0) e0 else s.indexOf('E'))
  }

  def bitIdentical(s: String): Boolean = {
    val (dec, exp) = indicesOf(s)
    val got = FastDouble.parse(s, dec, exp)
    val want = java.lang.Double.parseDouble(s)
    // the byte-slice entry point must agree bit for bit too (offset != 0
    // exercises the relative indexing)
    val padded = ("xx" + s + "x").getBytes("US-ASCII")
    val gotB = FastDouble.parse(padded, 2, s.length, dec, exp)
    java.lang.Double.doubleToRawLongBits(got) ==
      java.lang.Double.doubleToRawLongBits(want) &&
    java.lang.Double.doubleToRawLongBits(gotB) ==
      java.lang.Double.doubleToRawLongBits(want)
  }
}

class FastDoubleSpec extends AnyFunSuite {
  import FastDoubleSpec._

  test("hand-picked tokens incl. boundary mantissas and exponents") {
    List(
      "0", "-0", "0.0", "-0.0", "1", "-1", "1.5", "-1.5",
      "87986169698256.92", "-7306.757251958711", // 16-digit ugh10k shapes
      "9007199254740992", "9007199254740993", "9007199254740991.5",
      "9999999999999999", "99999999999999999", "999999999999999999",
      "9999999999999999999", // 19 digits
      "1e308", "-1e308", "1.7976931348623157e308", // near DBL_MAX
      "1e-308", "2.2250738585072014e-308",         // near min normal
      "1e-320", "4.9e-324", "1e-400", "1e400",     // subnormal / under / overflow
      "5.586006553522687e-12", "1.0891298326668283e20", "-3476969868279.6533",
      "0.000001", "0.00000000000000000001", "123456789.123456789e-20",
      "1e348", "1e-348", "1e347", "1e-347",
      "18446744073709551615", "18446744073709551616", // 2^64 boundary
      "3.141592653589793", "2.718281828459045e0", "1E5", "1e+5", "1e-5"
    ).foreach(s => assert(bitIdentical(s), s"token '$s'"))
  }

  test("Clinger fast-path region: small mantissas, |q| <= 22, halfway shapes") {
    // the money-like shapes that used to hit the Eisel-Lemire tie bail
    val hand = List(
      "0.5", "1.0", "2.5", "5.5", "0.05", "12.0", "99.9", "100.50",
      "4503599627370496.5",   // 2^52 + .5 (exact halfway at the precision edge)
      "9007199254740991.5",   // (2^53-1) + .5
      "0.0000000000000000000005", // q < -22: EL path
      "55e21", "55e22", "55e23", "5e-22", "5e-23")
    hand.foreach(s => assert(bitIdentical(s), s"token '$s'"))
    // exhaustive-ish sweep across the fast-path boundary
    var w = 1L
    while (w < (1L << 60)) {
      for (q <- -25 to 25) {
        val s = if (q >= 0) w.toString + "e" + q else w.toString + "e" + q
        assert(bitIdentical(s), s"token '$s'")
      }
      w = w * 3 + 1
    }
    // fractional halfway battery: x.5, x.25, x.05
    for (x <- 0 to 2000) {
      assert(bitIdentical(s"$x.5"), s"$x.5")
      assert(bitIdentical(s"$x.25"), s"$x.25")
      assert(bitIdentical(s"$x.05"), s"$x.05")
    }
  }
}

/** 10k-case generative sweep over mantissa/fraction/exponent shapes. */
object FastDoubleProps extends Properties("FastDouble") {
  import FastDoubleSpec._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10000)

  private val genToken: Gen[String] = for {
    m    <- Gen.chooseNum(0L, Long.MaxValue)
    mDig <- Gen.choose(1, 19)
    frac <- Gen.choose(0, 18)
    e    <- Gen.choose(-345, 345)
    useE <- Gen.oneOf(true, false)
    neg  <- Gen.oneOf(true, false)
  } yield {
    val digits0 = m.toString.take(mDig)
    val digits = if (digits0.isEmpty) "0" else digits0
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (frac > 0 && frac < digits.length)
      sb.append(digits.substring(0, digits.length - frac)).append('.')
        .append(digits.substring(digits.length - frac))
    else sb.append(digits)
    if (useE) sb.append('e').append(e)
    sb.toString
  }

  property("bit-identical to parseDouble") = forAll(genToken) { s => bitIdentical(s) }
}
