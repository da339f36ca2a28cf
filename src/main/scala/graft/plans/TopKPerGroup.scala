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

/** Custom whole-operator: top-k rows per group with rank, executed as
  * bounded per-group HEAPS instead of the built-in window translation
  * (full sort of every partition + row_number + filter).
  *
  * Why it matters at 100 TB: the window form sorts ALL n rows per partition
  * (O(n log n), spills on big partitions) and only then discards everything
  * past rank k. This operator keeps at most k rows per group at every stage:
  * a PARTIAL pass caps each map partition's output at k rows per group
  * before the shuffle (the top-k analogue of map-side combine), the shuffle
  * then moves only survivors, and the FINAL pass re-heaps per group and
  * emits ranks. Memory is O(groups x k) per task, independent of row count.
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
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankAttr.toSeq

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // ascending in rank order; PriorityQueue dequeues LARGEST (= worst
      // ranked = eviction candidate) first
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      if (isPartial) {
        heaps.valuesIterator.flatMap(_.iterator)
      } else {
        val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
        val joined = new JoinedRow
        heaps.valuesIterator.flatMap { heap =>
          // dequeue order is worst-first; reverse for rank 1..k
          val ranked = heap.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (row, i) =>
            proj(joined(row, new GenericInternalRow(Array[Any](i + 1))))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public API + session registration. */
object TopK {

  object Planner extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupPlan(group, order, k, rank, child) =>
        val partialPass = TopKPerGroupExec(group, order, k, partial = true, None,
          planLater(child))
        TopKPerGroupExec(group, order, k, partial = false, Some(rank), partialPass) :: Nil
      case _ => Nil
    }
  }

  /** Top-k rows per group, ranked. `orderBy` = (columnName, ascending);
    * include a unique tie-break column for deterministic results. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int,
               rankName: String = "rank"): DataFrame = {
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
