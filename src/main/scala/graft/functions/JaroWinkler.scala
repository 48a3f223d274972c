package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static-forwarder impl object (same pattern as LevenshteinBandedImpl):
  * whole-stage codegen calls `JaroWinklerImpl.compute(...)` as a plain
  * static method.
  */
object JaroWinklerImpl {

  /** Jaro-Winkler similarity (Winkler 1990), the classical formulation:
    * match window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the
    * out-of-order matched pairs, Winkler prefix boost p=0.1 over at most
    * 4 leading characters applied only when jaro > 0.7 (the boost
    * threshold), and similarity 0 when either string is empty — each
    * convention pinned value-for-value against DuckDB's
    * jaro_winkler_similarity in JaroWinklerSpec, which is what makes the
    * q163 cross-implementation differential exact. Character semantics:
    * UTF-16 code units. O(|a|·window) time, two small boolean arrays —
    * cheap enough for a blocked fuzzy-join predicate.
    */
  def compute(aU: UTF8String, bU: UTF8String): Double = {
    val s = aU.toString
    val t = bU.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0

    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!tMatched(j) && s.charAt(i) == t.charAt(j)) {
          sMatched(i) = true
          tMatched(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    // transpositions: walk both matched sequences in order
    var transpositions = 0
    var j = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) transpositions += 1
        j += 1
      }
      i += 1
    }

    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0

    // Winkler prefix boost: common prefix capped at 4, p = 0.1, applied
    // only above the classical 0.7 boost threshold
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val pMax = math.min(4, math.min(n, m))
    while (prefix < pMax && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)`: the prefix-boosted edit similarity in [0, 1] —
  * the record-linkage companion to `levenshtein_bounded` (typo-tolerant
  * name/title matching favors agreeing prefixes, which pure edit distance
  * ignores). Codegen'd: one static call inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
