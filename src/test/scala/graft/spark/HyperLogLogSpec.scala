package graft.spark

import graft.functions.{HllHash, HyperLogLogAgg}
import org.scalatest.funsuite.AnyFunSuite

/** Portable-HLL unit properties: the byte-built 60-bit hash must equal
  * parsing the md5 hex prefix (that equivalence is what makes the q151
  * oracle exact), merge must be order/partitioning-independent, and the
  * corrected estimator must hit the published error bound.
  */
class HyperLogLogSpec extends AnyFunSuite {

  test("hash60 equals parsing the first 15 hex digits of md5") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (k <- Seq("hello", "", "42", "user-9999", "é世界")) {
      val hex = md.digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      assert(HllHash.hash60(k) === java.lang.Long.parseLong(hex.take(15), 16), k)
    }
  }

  test("rho is leading-zero-count + 1 over the low 50 bits (p=10)") {
    // distribution sanity: rho >= 1, <= 51, and bucket < 1024
    (0 until 5000).foreach { i =>
      val (b, rho) = HllHash.register(10, s"key-$i")
      assert(b >= 0 && b < 1024)
      assert(rho >= 1 && rho <= 51)
    }
  }

  test("merge is elementwise max: any partitioning gives the same sketch") {
    val agg = new HyperLogLogAgg(10)
    val keys = (0 until 20000).map(i => s"u-$i")
    val whole = keys.foldLeft(agg.zero)(agg.reduce)
    val parts = keys.grouped(1234).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    assert(merged.toSeq === whole.toSeq)
    // reversed merge order too
    val merged2 = parts.reverse.map(_.clone()).reduce(agg.merge)
    assert(merged2.toSeq === whole.toSeq)
  }

  test("corrected estimate is within 5 standard errors at n=50k, p=10") {
    val agg = new HyperLogLogAgg(10)
    val n = 50000
    val regs = (0 until n).map(i => s"distinct-$i").foldLeft(agg.zero)(agg.reduce)
    val harmonic = regs.map(r => 1L << (51 - r)).sum
    val vZero = regs.count(_ == 0).toLong
    val est = HyperLogLogAgg.estimateCorrected(10, harmonic, vZero)
    val se = 1.04 / math.sqrt(1024.0) * n // ~3.25% of n
    assert(math.abs(est - n) < 5 * se, s"est=$est n=$n")
  }

  test("small-range correction engages and is accurate at n=100") {
    val agg = new HyperLogLogAgg(10)
    val regs = (0 until 100).map(i => s"s-$i").foldLeft(agg.zero)(agg.reduce)
    val harmonic = regs.map(r => 1L << (51 - r)).sum
    val vZero = regs.count(_ == 0).toLong
    val est = HyperLogLogAgg.estimateCorrected(10, harmonic, vZero)
    assert(math.abs(est - 100) < 15, s"est=$est") // linear counting is tight here
    // and the raw estimate alone would be biased high/low — correction differs
    assert(vZero > 0)
  }
}
