package graft.spark

import graft.functions.JaroWinklerImpl
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Value-for-value parity with DuckDB's jaro_winkler_similarity — the
  * expected values below were produced BY DuckDB (the oracle engine), so
  * this spec pins every algorithmic convention (match window,
  * transposition halving, the 0.7 boost threshold, empty-string zero)
  * without needing DuckDB on the JVM test path. q163 then re-checks the
  * same parity end-to-end over the part-name corpus.
  */
class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB's values on the convention-pinning set") {
    val expected = Seq(
      ("martha", "marhta", 0.9611111111111111),       // textbook transposition
      ("DIXON", "DICKSONX", 0.8133333333333332),      // textbook + prefix boost
      ("duane", "dwayne", 0.8400000000000001),
      ("", "x", 0.0),                                  // empty → 0
      ("", "", 0.0),                                   // DuckDB: both-empty → 0
      ("a", "a", 1.0),
      ("abcdef", "abcdef", 1.0),
      ("abc", "xyz", 0.0),                             // no matches
      ("prefix match long", "prefix match lonh", 0.9764705882352941),
      ("aa", "aaaa", 0.8666666666666667),
      ("CRATE", "TRACE", 0.7333333333333334),          // transpositions, no prefix
      ("x", "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx", 0.6777777777777777), // below 0.7: NO boost
      ("ab", "ba", 0.0),                               // window 0 → no matches
      ("jellyfish", "smellyfish", 0.8962962962962964))
    expected.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw('$a','$b')")
    }
  }

  test("symmetric and bounded in [0, 1]") {
    val words = Seq("alpha", "alpaca", "beta", "betamax", "", "a",
      "transposition", "transopsition", "same", "same")
    for (a <- words; b <- words) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      assert(v === jw(b, a), s"asymmetric on ('$a','$b')")
    }
  }
}
