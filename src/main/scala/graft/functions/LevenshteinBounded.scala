package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standalone impl object (no companion class) so scalac emits STATIC
  * forwarders — the generated whole-stage code calls
  * `graft.functions.LevenshteinBandedImpl.compute(...)` as a plain static
  * method, no MODULE$ indirection inside the hot loop.
  */
object LevenshteinBandedImpl {

  /** min(levenshtein(s, t), k + 1) by banded dynamic programming: only
    * the 2k+1 diagonal band is evaluated (cells further off-diagonal
    * provably exceed k), values saturate at k+1, and a fully-saturated
    * band row exits early. O(k · min(n, m)) time, O(n) space — vs the
    * O(n · m) full DP, the difference between a usable and an unusable
    * fuzzy-join predicate on long strings at corpus scale.
    */
  def compute(aU: UTF8String, bU: UTF8String, k: Int): Int = {
    if (k < 0) return 0
    val s = aU.toString
    val t = bU.toString
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return k + 1
    val inf = k + 1
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val j0 = math.min(n, k)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      if (i <= k) cur(0) = i
      var best = cur(0)
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      var jj = lo
      val ti = t.charAt(i - 1)
      while (jj <= hi) {
        var v = prev(jj - 1) + (if (s.charAt(jj - 1) == ti) 0 else 1)
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best >= inf) return inf
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    math.min(prev(n), inf)
  }
}

/** `levenshtein_bounded(a, b, k)`: exact edit distance when it is ≤ k,
  * else k+1 — the scale-correct primitive for fuzzy joins, where the
  * predicate is always `distance <= k` and computing distances beyond the
  * threshold is pure waste. Exactly equivalent to
  * `least(levenshtein(a, b), k + 1)` (and the built-in three-arg
  * `levenshtein(a, b, k)` threshold form), but the banded kernel does
  * O(k·n) work instead of O(n·m). Codegen'd: one static call, stays
  * inside whole-stage codegen.
  *
  * Character semantics: Java UTF-16 code units (identical to code points
  * on the BMP; the corpus fixtures are ASCII).
  */
case class LevenshteinBounded(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "levenshtein_bounded"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING, INT), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevenshteinBandedImpl.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.LevenshteinBandedImpl.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LevenshteinBounded =
    copy(first = newFirst, second = newSecond, third = newThird)
}
