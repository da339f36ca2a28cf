package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: the scale properties the engine's docs claim
  * (scan pushdown, broadcast dimension joins, top-k without a total sort)
  * are asserted against the physical plan, so an optimizer-defeating
  * refactor fails CI instead of silently costing a full scan at 100 TB. */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filter and projection reach the parquet scan") {
    // read the scan node's metadata (the plan's toString truncates it)
    val df = ops.Relational.q02FilterProject(spark, TestSpark.sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString("; ")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,48"), pushed)
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
    // column pruning: the scan schema must not include unprojected columns
    val readSchema = scans.map(_.metadata("ReadSchema")).mkString("; ")
    assert(!readSchema.contains("l_shipdate"), readSchema)
  }

  test("q11: dimension joins broadcast (no fact-side shuffle for nation/region)") {
    val plan = planOf(ops.Relational.q11JoinStar(spark, TestSpark.sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q15: top-k plans TakeOrderedAndProject, not a total sort") {
    val plan = planOf(ops.Relational.q15TopK(spark, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q25: as-of join is one union-side shuffle + one in-partition sort") {
    // the union+last_value formulation must not degenerate into a join of
    // sorted sides: exactly one hashpartitioning exchange on the key and
    // one Sort feeding the window
    val plan = planOf(ops.Relational.q25AsofJoin(spark, TestSpark.sf))
    val keyExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(keyExchanges === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q59: dimension chain broadcasts; fact side shuffles only for agg + window") {
    val plan = planOf(ops.Relational.q59MinCostSupplier(spark, TestSpark.sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // supplier/nation/region/part all attach by broadcast: the only
    // hash-partition exchanges are the (partkey, suppkey) aggregate and the
    // per-part window — no exchange keyed on a dimension key
    assert(!plan.contains("Exchange hashpartitioning(s_suppkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(n_nationkey"), plan)
  }
}
