package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Textbook Jaro and Jaro-Winkler similarity, bit-identical to DuckDB's
  * `jaro_winkler_similarity` (verified against it in the oracle gate):
  * match window = max(len)/2 − 1, transposition count over matched
  * characters with the halved count FLOORED (integer `t / 2`, the
  * rapidfuzz/DuckDB convention — an odd mismatch count contributes
  * ⌊t/2⌋, not t/2.0; the two diverge on e.g. "spark spark part" vs
  * "spark part spark": 0.9375 floored vs 0.9270833 exact), Winkler prefix
  * boost p = 0.1 over a common prefix capped at 4, applied only when the
  * Jaro score exceeds the 0.7 boost threshold. Either input empty → 0.0
  * (DuckDB convention).
  *
  * Kept as a static Scala loop (object methods compile to static
  * forwarders) so the generated code calls straight into compiled JVM code
  * — no interpreted expression tree in the O(block²) fuzzy-join hot path.
  */
object StringSimilarity {
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var looking = true
      while (looking && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          looking = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** jaro_winkler(a, b): native scalar expression. The generated code is a
  * single static call on two materialized Strings — the per-pair cost is
  * the O(len·window) similarity loop itself, nothing interpreted. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"jaro_winkler needs (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.StringSimilarity.jaroWinkler(" +
        s"$a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
