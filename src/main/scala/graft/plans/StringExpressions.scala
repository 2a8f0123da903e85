package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro-Winkler kernel shared by interpreted eval and generated
  * code (the Spark-internal pattern for string expressions: codegen emits
  * ONE static call, so the scan stays inside whole-stage codegen with no
  * UDF serialization boundary).
  *
  * Standard parameters — Winkler prefix scale 0.1, prefix cap 4, boost
  * threshold 0.7, either-empty → 0.0 — matching DuckDB's
  * `jaro_winkler_similarity`, which is what the differential oracle runs.
  * Comparison is per Java char (UTF-16 unit): identical to byte-level for
  * ASCII data; supplementary-plane pairs compare per surrogate, a
  * documented approximation. */
object JaroWinklerImpl {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(0, math.max(n1, n2) / 2 - 1)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // INTEGER half-transpositions (floor) — the original strcmp95 does
    // `N_trans / 2` in int, and RapidFuzz/DuckDB inherit it; a fractional
    // t/2.0 diverges on odd raw counts (e.g. "blue gear"/"old gear")
    val jaro = (m / n1 + m / n2 + (m - (t / 2)) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(n1, n2))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(s1, s2)` — the record-linkage string similarity (Winkler
  * 1990), as a native Catalyst expression: null-safe, codegen'd as a
  * single static call. Registered by [[GraftExtensions]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two string arguments, got ${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
