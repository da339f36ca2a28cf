package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * This is the perf path for similarity search (preference (b) of the
  * custom-operator ladder): one fused loop in generated Java — no
  * intermediate product array, no per-element lambda dispatch — versus the
  * composed `aggregate(zip_with(...))` form, which allocates a zipped array
  * per row and evaluates interpreted higher-order lambdas.
  *
  * Accepts array<float> and array<double> on either side, independently:
  * float elements are widened to double IN-REGISTER inside the loop, so a
  * raw embedding column never pays a per-row array<double> materialization
  * (the old builder-inserted Cast allocated a second 64-element array for
  * every pair scored). Widening is exact, so results are bit-identical to
  * casting first: one left-to-right accumulation each for dot product and
  * the two squared norms (same IEEE operation order as the DataFrame
  * `aggregate` fold and DuckDB's list_sum, keeping the oracle exact).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> or array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Mismatched lengths => NULL, matching the composed zip_with+aggregate
  // form (which null-pads) rather than silently truncating. A ZERO-NORM
  // side (the zero vector, or an empty array) is NULL too: cosine is
  // undefined there, raw Java division would yield NaN — which Spark's
  // ordering ranks ABOVE every real similarity (a zero vector would win
  // every top-k) — and DuckDB's `/` yields NULL on the same input, so
  // NULL is the one value both engines rank identically (last, desc).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xf = isFloat(left); val yf = isFloat(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // per-side element getter, widened in-register when the side is float
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = ${get(a, isFloat(left))};
         |    double $yi = ${get(b, isFloat(right))};
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-facing access (Spark 4 Columns wrap ColumnNodes, so
  * custom expressions surface through the function registry + call_function).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  private def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name requires exactly $n arguments, got ${exprs.length}")

  /** Widen a numeric array argument to array<double> so callers can pass
    * e.g. array<int>. float and double arrays pass through untouched —
    * CosineSimilarity reads float elements natively (in-register widening),
    * no per-row cast allocation. */
  private[graft] def asNumericArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => e
    case ArrayType(_, containsNull) => Cast(e, ArrayType(DoubleType, containsNull))
    case _ => e // leave as-is; checkInputDataTypes reports the clear error
  }

  private[graft] def cosineBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_cosine", exprs, 2)
    CosineSimilarity(asNumericArray(exprs(0)), asNumericArray(exprs(1)))
  }

  private[graft] def jaccardBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_jaccard_sorted", exprs, 2)
    JaccardSorted(exprs(0), exprs(1))
  }

  private[graft] def intersectBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_intersect_sorted", exprs, 2)
    IntersectSorted(exprs(0), exprs(1))
  }

  private def literalInt(name: String, e: Expression, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name requires a literal integer for $arg, got $other")
  }

  private[graft] def minhashBandsBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_minhash_bands", exprs, 3)
    MinHashBands(exprs(0),
      literalInt("graft_minhash_bands", exprs(1), "k"),
      literalInt("graft_minhash_bands", exprs(2), "bands"))
  }

  private[graft] def rollingHashBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_rolling_hash", exprs, 1)
    RollingHash(exprs(0))
  }

  private[graft] def shinglesBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_shingles", exprs, 2)
    NgramShingles(exprs(0), literalInt("graft_shingles", exprs(1), "n"))
  }

  private[graft] def simhashBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_simhash64", exprs, 1)
    SimHash64(exprs(0))
  }

  private[graft] def maxRunBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_max_run", exprs, 1)
    MaxRunLength(exprs(0))
  }

  private[graft] def jaroWinklerBuilder(exprs: Seq[Expression]): Expression = {
    requireArity("graft_jaro_winkler", exprs, 2)
    JaroWinkler(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard_sorted", jaccardBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_sorted", intersectBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_bands", minhashBandsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", rollingHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", shinglesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_max_run", maxRunBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", jaroWinklerBuilder, "built-in")
  }
}
