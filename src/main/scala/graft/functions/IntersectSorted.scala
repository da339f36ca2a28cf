package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |a ∩ b| of two SORTED, distinct string
  * arrays via the shared [[SortedMergeWalk]] — the counting sibling of
  * [[JaccardSorted]] (same contract, same walk) for scores whose
  * denominator is NOT the union: containment |a∩b|/min(|a|,|b|), overlap
  * |a∩b|/|a|, Sørensen–Dice 2|a∩b|/(|a|+|b|) all divide the same count by
  * sizes the caller already has. Replaces `size(array_intersect(a, b))`,
  * which builds a hash set per invocation — on 10^5–10^6 candidate pairs
  * (the verify stage of a blocked dedup) that allocation dominates.
  *
  * Contract: both inputs ascending-sorted (`sort_array` binary order) with
  * distinct, non-null elements — what [[NgramShingles]] emits.
  */
case class IntersectSorted(left: Expression, right: Expression)
    extends BinaryExpression with SortedMergeWalk {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_sorted"

  override def checkInputDataTypes(): TypeCheckResult = walkTypeCheck()

  override def nullSafeEval(a: Any, b: Any): Any = intersectCount(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (code, inter) = genWalk(ctx, a, b)
      s"""
         |$code
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
