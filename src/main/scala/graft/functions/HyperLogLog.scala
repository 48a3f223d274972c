package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Engine-portable HyperLogLog hash: a value's 60-bit hash is the first
  * 15 hex digits of md5(value), so any engine with md5 + substring can
  * rebuild the EXACT register file in plain SQL. With precision p, the
  * top p bits pick the register and ρ = (number of leading zeros in the
  * remaining 60−p bits) + 1 — in SQL, `61 − p − length(bin(rem))` with a
  * `rem = 0 → 61 − p` guard, because `bin()` renders minimal-length
  * binary in both Spark and DuckDB.
  */
object HllHash {
  /** 60-bit non-negative hash (15 hex digits of md5). */
  def hash60(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 7.5 bytes, big-endian — identical to parsing the hex prefix
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  def register(p: Int, key: String): (Int, Int) = {
    val dataBits = 60 - p
    val h = hash60(key)
    val bucket = (h >>> dataBits).toInt
    val rem = h & ((1L << dataBits) - 1)
    val rho =
      if (rem == 0L) dataBits + 1
      else dataBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (bucket, rho)
  }
}

/** HyperLogLog as a typed `Aggregator` UDAF (Flajolet et al. 2007): one
  * byte register per 2^p bucket holding the max ρ seen, so partial
  * sketches from any partitioning combine by elementwise MAX — a fixed
  * 2^p-byte state per group regardless of input size, which is the whole
  * point at 100 TB (count distinct users over a year of events = one
  * 1 KiB buffer per group, no per-key shuffle).
  *
  * Unlike `approx_count_distinct` (q22, xxhash-based, rows-only gate),
  * the md5 bucketing here is engine-portable: the q151 oracle rebuilds
  * the identical registers in DuckDB SQL and checks the derived estimate
  * to the digit. `finish` exposes the raw registers; the estimate is
  * derived in SQL from two INTEGER reductions (harmonic numerator
  * Σ 2^(dataBits+1−M_j) and zero-register count), so the one
  * double-precision division happens on identical integer inputs in both
  * engines — the same bit-determinism trick as q108's moment sums.
  */
class HyperLogLogAgg(p: Int) extends Aggregator[String, Array[Byte], Seq[Int]] {
  require(p >= 4 && p <= 16, s"HLL precision $p out of range [4,16]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], key: String): Array[Byte] = {
    if (key != null) {
      val (bucket, rho) = HllHash.register(p, key)
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Byte]): Seq[Int] = r.toSeq.map(_.toInt)

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
}

object HyperLogLogAgg {
  /** Raw HLL estimate from the integer reductions (no small/large-range
    * correction — the gate checks portability on the raw formula; the
    * corrected estimator lives in [[estimateCorrected]]).
    */
  def estimateRaw(p: Int, harmonic: Long): Double = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, 61.0 - p) // 2^(dataBits+1), exact
    alpha * m * m * scale / harmonic.toDouble
  }

  /** The standard HLL estimator with the small-range (linear counting)
    * correction: below 2.5m with empty registers, -m·ln(V/m) is the
    * better estimate.
    */
  def estimateCorrected(p: Int, harmonic: Long, vZero: Long): Double = {
    val m = (1 << p).toDouble
    val raw = estimateRaw(p, harmonic)
    if (raw <= 2.5 * m && vZero > 0) m * math.log(m / vZero.toDouble) else raw
  }
}
