package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: Jaccard similarity of two SORTED, distinct
  * string arrays via the shared [[SortedMergeWalk]] — O(n+m) comparisons,
  * zero allocation — replacing `array_intersect`/`array_union`, which build
  * a hash set per invocation. On millions of candidate pairs (the LSH
  * verify stage) that per-pair allocation is the dominant cost.
  *
  * Contract: both inputs ascending-sorted (`sort_array`) with distinct,
  * non-null elements; Jaccard = |a ∩ b| / (|a| + |b| - |a ∩ b|), identical
  * to the set-function formulation, so DuckDB oracles are unchanged.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with SortedMergeWalk {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override def checkInputDataTypes(): TypeCheckResult = walkTypeCheck()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val inter = intersectCount(a, b)
    val union = a.asInstanceOf[ArrayData].numElements() +
      b.asInstanceOf[ArrayData].numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (code, inter) = genWalk(ctx, a, b)
      val union = ctx.freshName("union")
      s"""
         |$code
         |int $union = $a.numElements() + $b.numElements() - $inter;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
