package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * This is the perf path for similarity search (preference (b) of the
  * custom-operator ladder): one fused loop in generated Java — no
  * intermediate product array, no per-element lambda dispatch — versus the
  * composed `aggregate(zip_with(...))` form, which allocates a zipped array
  * per row and evaluates interpreted higher-order lambdas.
  *
  * Semantics match the composed form bit-for-bit: strict array<double>
  * inputs (the registry builders in GraftFunctions/GraftExtensions insert
  * the array<float> -> array<double> cast, so SQL callers can pass raw
  * embeddings), one left-to-right accumulation each for dot product and
  * the two squared norms (same IEEE operation order as the DataFrame
  * `aggregate` fold and DuckDB's list_sum, keeping the oracle exact).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // Mismatched lengths => NULL, matching the composed zip_with+aggregate
  // form (which null-pads) rather than silently truncating.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
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
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
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
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  /** Widen any numeric array argument to array<double> so callers can pass
    * raw float embeddings. */
  private[graft] def asDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case ArrayType(_, containsNull) => Cast(e, ArrayType(DoubleType, containsNull))
    case _ => e // leave as-is; checkInputDataTypes reports the clear error
  }

  private[graft] def cosineBuilder(exprs: Seq[Expression]): Expression =
    CosineSimilarity(asDoubleArray(exprs(0)), asDoubleArray(exprs(1)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard_sorted",
      { exprs => JaccardSorted(exprs(0), exprs(1)) },
      "built-in")
  }
}
