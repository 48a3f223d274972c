package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling hash over token windows, as a true Catalyst
  * `Generator`: `rolling_token_hash(text, k)` emits one row
  * `(pos, hash)` per k-token window of a single-space-tokenized document
  * — the SCALE form of window fingerprinting for repeated-substring dedup
  * (the q172 span pipeline keys its duplicate-detection shuffle on the
  * window TEXT; at 100 TB that shuffles multi-hundred-byte keys and
  * allocates one string per window). This generator allocates NOTHING per
  * window: one token-hash array per document, then each window hash is an
  * O(1) rolling update — remove the leading token's term, multiply by the
  * base, add the trailing token (the EventCursor one-event-at-a-time
  * discipline, reference EventCursor.scala:59-128, applied to hashing).
  *
  * Hash design: per-token FNV-1a 64 folded into the field Z_p, p = 2^61−1
  * (Mersenne, so mod is two shifts), window hash
  * `H(i) = Σ_j t_{i+j} · B^{k−1−j} mod p` with B = 1_000_003. 61-bit
  * output over ~10^6–10^9 windows keeps collision odds below ~10^-4 —
  * grouping by `hash` is equality-of-text in practice, and q177 proves it
  * against the exact string-keyed oracle. 128-bit intermediate products
  * reduce via Math.multiplyHigh (2^64 ≡ 8 mod p).
  *
  * Tokenization matches the repo-wide oracle convention: words are the
  * single-space-delimited segments (empty segments included), `pos` is
  * 1-based. Fewer than k tokens → no rows; null text → no rows.
  */
case class RollingTokenHash(child: Expression, k: Expression)
    extends Generator with CodegenFallback {

  import RollingTokenHash._

  override def children: Seq[Expression] = Seq(child, k)
  override def prettyName: String = "rolling_token_hash"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"rolling_token_hash requires a STRING first argument, got ${child.dataType.catalogString}")
    k match {
      case Literal(v: Int, IntegerType) if v >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rolling_token_hash requires a literal INT k >= 1 as the second argument")
    }
  }

  private lazy val kTokens: Int = k.eval(null).asInstanceOf[Int]
  // B^(k-1) mod p — the coefficient of the departing token
  private lazy val bPow: Long = {
    var r = 1L
    var i = 1
    while (i < kTokens) { r = mulmod(r, Base); i += 1 }
    r
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    if (m < kTokens) return Iterator.empty
    // one pass: FNV-1a per token, folded into Z_p
    val th = new Array[Long](m)
    var w = 0
    var h = Fnv64Offset
    i = 0
    while (i < len) {
      val b = bytes(i)
      if (b == ' ') { th(w) = mod61(h); w += 1; h = Fnv64Offset }
      else h = (h ^ (b & 0xffL)) * Fnv64Prime
      i += 1
    }
    th(w) = mod61(h)
    val kk = kTokens
    val dep = bPow
    // seed window [0, k)
    var acc = 0L
    i = 0
    while (i < kk) { acc = addmod(mulmod(acc, Base), th(i)); i += 1 }
    val seed = acc
    val total = m - kk + 1
    new Iterator[InternalRow] {
      private[this] var pos = 0
      private[this] var cur = seed
      override def hasNext: Boolean = pos < total
      override def next(): InternalRow = {
        val out = new GenericInternalRow(Array[Any](pos + 1, cur))
        if (pos + 1 < total) {
          // roll: drop token pos, admit token pos+k
          val without = addmod(cur, Mod61 - mulmod(th(pos), dep))
          cur = addmod(mulmod(without, Base), th(pos + kk))
        }
        pos += 1
        out
      }
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Iterator.empty

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RollingTokenHash =
    copy(child = newChildren(0), k = newChildren(1))
}

object RollingTokenHash {
  /** p = 2^61 − 1 (Mersenne prime). */
  final val Mod61: Long = (1L << 61) - 1
  /** Polynomial base (any value ≪ p works; prime for good mixing). */
  final val Base: Long = 1000003L
  final val Fnv64Offset: Long = 0xcbf29ce484222325L
  final val Fnv64Prime: Long = 0x100000001b3L

  /** Reduce an unsigned 64-bit value mod 2^61 − 1. */
  @inline def mod61(x: Long): Long = {
    val r = (x & Mod61) + (x >>> 61)
    if (r >= Mod61) r - Mod61 else r
  }

  /** (a + b) mod p for a, b < p. */
  @inline def addmod(a: Long, b: Long): Long = {
    val s = a + b // < 2^62, no overflow
    if (s >= Mod61) s - Mod61 else s
  }

  /** (a · b) mod p for a, b < p, via the 128-bit product:
    * hi·2^64 + lo ≡ hi·8 + lo (mod 2^61 − 1).
    */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a,b < 2^61 → product < 2^122, hi < 2^58
    val lo = a * b                   // unsigned low 64 bits
    mod61(mod61(lo) + (hi << 3))     // hi·8 < 2^61; sum < 2^62 handled by mod61
  }
}
