package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaro-Winkler similarity over two string columns — the
  * record-linkage scalar Spark lacks (it ships `levenshtein` and
  * `soundex` but no Jaro family; the reference ships neither —
  * functions/scalar.rs stops at arithmetic). Semantics are the textbook
  * definition, verified case-by-case against DuckDB's
  * `jaro_winkler_similarity` (the oracle engine):
  *
  *   - either input empty → 0.0 (NOT 1.0 — matches DuckDB);
  *   - match window = max(|s|,|t|)/2 − 1 (floor, clamped ≥ 0);
  *   - transpositions = half the mismatched positions of the two
  *     match sequences;
  *   - Winkler boost applies only when jaro > 0.7 (the standard boost
  *     threshold), with common-prefix length capped at 4 and prefix
  *     weight 0.1.
  *
  * The kernel is a primitive char loop with two small boolean
  * scratch arrays per call — O(|s|·window) worst case, zero boxing.
  * Both eval paths (interpreted + codegen) call the same static
  * helper, so parity between them is structural; cross-engine float
  * parity is handled at the QUERY layer with the standard 6-decimal
  * snap (association order inside the final polynomial may differ
  * from DuckDB's by 1 ulp).
  *
  * A null input yields null (BinaryExpression default).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static kernel shared by the interpreted and generated paths. */
  def similarity(au: UTF8String, bu: UTF8String): Double = {
    val s = au.toString
    val t = bu.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val ci = s.charAt(i)
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && t.charAt(j) == ci) {
          sMatch(i) = true
          tMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var mismatched = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro =
      (mm / n + mm / m + (mm - mismatched / 2) / mm) / 3.0
    if (jaro > 0.7) {
      val maxPrefix = math.min(4, math.min(n, m))
      var l = 0
      while (l < maxPrefix && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
