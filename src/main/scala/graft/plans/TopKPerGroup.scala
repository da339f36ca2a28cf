package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: top-k rows per group with rank.
  *
  * Why it matters at 100 TB: the built-in window translation sorts ALL n
  * rows per partition and only then discards everything past rank k. This
  * operator prunes before the shuffle and never holds an unbounded
  * in-memory structure:
  *
  *  - PARTIAL pass (map side): bounded per-group heaps cap each map
  *    partition's output at k rows per group — the top-k analogue of
  *    map-side combine. The heap map admits at most
  *    min(`graft.topk.maxPartialGroups`, `graft.topk.maxPartialRows` / k)
  *    distinct groups — the row budget (default 2^20 retained rows) is
  *    what actually bounds task memory, and dividing it by k keeps the
  *    bound independent of how large a k the caller asks for; once full,
  *    rows of unseen groups PASS THROUGH untouched. Pass-through is always
  *    correct — the partial pass emits a superset of each group's
  *    partition-local top-k and the final pass re-ranks — so
  *    high-cardinality groups degrade to "no map-side pruning" instead of
  *    an OOM. SQLMetrics (`numOutputRows`, `heapEvictions`,
  *    `passThroughRows`) make the pruning observable in the SQL UI: a
  *    partial pass whose passThroughRows dominates is telling you the
  *    group cardinality outgrew the budget.
  *  - FINAL pass (reduce side): requires clustering on the group keys AND
  *    a (group, order) child sort — Spark plans an external
  *    UnsafeExternalSorter sort, which spills. The pass itself is then a
  *    streaming scan: rows of one group arrive contiguous and rank-ordered,
  *    so it emits ranks 1..k per group holding O(1) rows. No per-group
  *    state survives the group boundary.
  *
  * The full ladder: logical node (below) -> planner Strategy -> physical
  * UnaryExecNode pair, registered per-session via experimental
  * extraStrategies (or GraftExtensions).
  */
case class TopKPerGroupPlan(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is minted by this operator, not pulled from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: Option[Attribute],
    maxPartialGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  import org.apache.spark.sql.execution.metric.SQLMetrics

  override lazy val metrics = if (partial) Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "heapEvictions" -> SQLMetrics.createMetric(sparkContext, "heap evictions (rows pruned map-side)"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext, "pass-through rows (group cap overflow)"))
  else Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankAttr.toSeq

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil

  /** Final pass streams over (group, order)-sorted input; the sort Spark
    * inserts here is external (spills), which is what makes the operator
    * safe when groups ~ rows. Group-key sort direction is arbitrary but
    * must be deterministic — ascending. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(group.map(SortOrder(_, Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    if (partial) {
      val cap = maxPartialGroups
      val heapEvictions = longMetric("heapEvictions")
      val passThroughRows = longMetric("passThroughRows")
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupExprs, childOutput)
        // ascending in rank order; PriorityQueue dequeues LARGEST (= worst
        // ranked = eviction candidate) first
        val ord = RowOrdering.create(sortOrder, childOutput)
        val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        val pruned = iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < limit) heap.enqueue(row.copy())
              else {
                heapEvictions += 1
                if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
              }
              Iterator.empty
            case None if heaps.size < cap =>
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              h.enqueue(row.copy())
              heaps.put(key.copy(), h)
              Iterator.empty
            case None =>
              // map full: unseen group's row passes through un-pruned (a
              // superset stays correct; the final pass does the cutting)
              passThroughRows += 1
              numOutputRows += 1
              Iterator.single(row)
          }
        }
        // ++ is by-name: the heap flush runs only after `iter` is exhausted
        pruned ++ heaps.valuesIterator.flatMap(_.iterator.map { r =>
          numOutputRows += 1; r
        })
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupExprs, childOutput)
        val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        var prevKey: UnsafeRow = null
        var rank = 0
        // input is (group, order)-sorted: each group is one contiguous,
        // already-ranked run — emit the first k rows of each run
        iter.flatMap { row =>
          val key = keyProj(row)
          if (prevKey == null || key != prevKey) {
            prevKey = key.copy()
            rank = 1
          } else {
            rank += 1
          }
          if (rank <= limit) {
            rankRow.update(0, rank)
            numOutputRows += 1
            Iterator.single(proj(joined(row, rankRow)))
          } else Iterator.empty
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public API + session registration. */
object TopK {

  val maxPartialGroupsKey = "graft.topk.maxPartialGroups"
  /** Budget on TOTAL retained partial-pass rows per task (each admitted
    * group holds up to k): the group cap is min(maxPartialGroups,
    * maxPartialRows / k), so a caller asking for a huge k cannot turn the
    * heap map into an untracked multi-GB structure. */
  val maxPartialRowsKey = "graft.topk.maxPartialRows"

  object Planner extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupPlan(group, order, k, rank, child) =>
        val conf = org.apache.spark.sql.internal.SQLConf.get
        val groupCap = conf.getConfString(maxPartialGroupsKey, "65536").toInt
        val rowBudget = conf.getConfString(maxPartialRowsKey, "1048576").toLong
        val cap = math.min(groupCap.toLong, math.max(1L, rowBudget / k)).toInt
        val partialPass = TopKPerGroupExec(group, order, k, partial = true, None,
          cap, planLater(child))
        TopKPerGroupExec(group, order, k, partial = false, Some(rank), cap,
          partialPass) :: Nil
      case _ => Nil
    }
  }

  /** Top-k rows per group, ranked. `orderBy` = (columnName, ascending);
    * include a unique tie-break column for deterministic results. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int,
               rankName: String = "rank"): DataFrame = {
    // validated here, once, so the Planner's rowBudget/k division and the
    // exec's heap sizing can assume a sane k
    require(k >= 1, s"top-k requires k >= 1, got $k")
    // the exec's required ClusteredDistribution(group) is rejected by
    // Spark for an empty clustering — a global top-k is
    // TakeOrderedAndProject territory (orderBy.limit), not this operator
    require(groupCols.nonEmpty,
      "TopKPerGroup needs at least one group column; for a GLOBAL top-k " +
        "use orderBy(...).limit(k) (TakeOrderedAndProject)")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(Planner)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ Planner
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val group = groupCols.map(attr)
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftBridge.ofRows(spark, TopKPerGroupPlan(group, order, k, rank, analyzed))
  }
}
