package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity in its STANDARD
  * parameterization (Winkler 1990) — prefix scaling p = 0.1 over at most
  * 4 common leading characters, applied only when the base Jaro score
  * exceeds the 0.7 boost threshold. That is exactly the variant DuckDB's
  * `jaro_winkler_similarity` implements (verified bit-for-bit on
  * boost-threshold-distinguishing pairs), so queries using this
  * expression keep exact DuckDB oracles. Spark itself ships only
  * levenshtein among edit-similarity functions; JW is the standard
  * entity-resolution scorer for SHORT strings (names, titles), where
  * Levenshtein's unit costs over-penalize transpositions.
  *
  * Codegen stays inside whole-stage: the generated code calls the static
  * [[JaroWinklerAlgo.score]] (no fallback, no boxing beyond the strings
  * themselves). Exactness note: operates on Java chars — identical to
  * DuckDB on ASCII/BMP input (our corpus), divergent only on astral
  * code points, which the oracle gate would surface loudly. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.score(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.score($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The algorithm, as a plain object so generated code can call the static
  * forwarder. One implementation serves eval and codegen. */
object JaroWinklerAlgo {

  def score(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3
    if (jaro > 0.7) {
      val cap = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1 - jaro)
    } else jaro
  }
}
