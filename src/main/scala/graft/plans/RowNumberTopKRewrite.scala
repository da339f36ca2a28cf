package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the window-translation top-N-per-group idiom —
  *
  * {{{ Filter(rn <= k, Window(row_number().over(part, order) AS rn)) }}}
  *
  * — into the engine's native [[TopKPerGroupPlan]], so ANY query written in
  * the ubiquitous row_number-then-filter style (SQL `QUALIFY`-equivalents,
  * hand-written DataFrames, generated BI queries) gets the bounded-heap
  * physical operator instead of a full per-partition sort. This completes
  * the Catalyst extension ladder: native Expressions (functions/), a
  * LogicalPlan + Strategy + Exec (TopKPerGroup), and now a Rule[LogicalPlan]
  * that retargets existing plans onto it — injected alongside the planner
  * strategy by [[graft.GraftExtensions]].
  *
  * Deliberately conservative — it fires only on the exact shape it can
  * prove equivalent, and leaves everything else untouched:
  *  - the Window computes EXACTLY ONE expression, a `row_number()` with a
  *    non-empty ORDER BY (rank/dense_rank admit ties and do NOT match);
  *  - the Filter is a single comparison binding that row number to a
  *    positive integer literal (`rn <= k`, `rn < k`, `k >= rn`, `k > rn`,
  *    `rn = 1`);
  *  - a [[WindowGroupLimit]] Spark's own InferWindowGroupLimit may already
  *    have inserted below the window is subsumed (the native operator IS
  *    a group limit) and stripped rather than double-evaluated.
  *
  * The rewrite preserves the rank attribute's exprId, so downstream
  * references resolve unchanged; output rows are identical to the window
  * form whenever the ORDER BY is total (and a valid row_number assignment
  * either way when it is not). */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private object PositiveIntBound {
    /** Extract k such that `cond` ≡ rn <= k, given rn's attribute. */
    def unapply(x: (Expression, Attribute)): Option[Int] = x match {
      // strict bounds require k >= 2 BEFORE computing k - 1: at
      // k = Int.MinValue the subtraction wraps to Int.MaxValue, turning an
      // always-false filter (row numbers start at 1) into top-2^31-1 —
      // the un-rewritten window form returns the correct empty result
      case (LessThanOrEqual(a: Attribute, IntegerLiteral(k)), rn)
        if a.semanticEquals(rn) => Some(k)
      case (LessThan(a: Attribute, IntegerLiteral(k)), rn)
        if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
      case (GreaterThanOrEqual(IntegerLiteral(k), a: Attribute), rn)
        if a.semanticEquals(rn) => Some(k)
      case (GreaterThan(IntegerLiteral(k), a: Attribute), rn)
        if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
      case (EqualTo(a: Attribute, IntegerLiteral(1)), rn)
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // partitionSpec must be NON-EMPTY: the exec's required distribution is
    // ClusteredDistribution(group), which Spark rejects outright for Nil —
    // rewriting a GLOBAL top-N (no PARTITION BY) would fail every such
    // query at planning time session-wide. Spark's own
    // TakeOrderedAndProject / WindowGroupLimit already serve that shape.
    case f @ Filter(cond, w: Window)
        if w.windowExpressions.length == 1 && w.partitionSpec.nonEmpty =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _)
            if w.orderSpec.nonEmpty =>
          val rn = alias.toAttribute
          (cond, rn) match {
            case PositiveIntBound(k) if k >= 1 =>
              val child = w.child match {
                // our operator IS the group limit — don't run Spark's too
                case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
                case other => other
              }
              TopKPerGroupPlan(w.partitionSpec, w.orderSpec, k,
                rn.asInstanceOf[AttributeReference], child)
            case _ => f
          }
        case _ => f
      }
  }
}
