package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerGroupExec}

class TopKPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("custom top-k operator == window row_number form") {
    val native = ops.Relational.q54TopKPerGroupNative(spark, TestSpark.sf).collect()
    val window = ops.Relational.q22WindowTopNPerGroup(spark, TestSpark.sf).collect()
    assert(native.length === window.length)
    assert(native.map(_.toSeq).toSeq === window.map(_.toSeq).toSeq)
  }

  test("plan contains the partial+final custom exec pair (map-side combine)") {
    val df = TopK.perGroup(
      Tables.load(spark, TestSpark.sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_orderkey"), Seq(("l_quantity", false), ("l_linenumber", true)), 2)
    assert(df.count() > 0)
    val planStr = df.queryExecution.executedPlan.toString
    // exactly two custom nodes (partial pass + final pass) around one Exchange
    assert(planStr.linesIterator.count(_.contains("TopKPerGroup")) === 2, planStr)
    assert(planStr.contains("Exchange hashpartitioning(l_orderkey"), planStr)
  }

  test("ranks are 1..k and ordered correctly inside each group") {
    val df = TopK.perGroup(
      Tables.load(spark, TestSpark.sf, "events")
        .select("user_id", "event_id", "value"),
      Seq("user_id"), Seq(("value", false), ("event_id", true)), 4, "rk")
    val bad = df.groupBy("user_id")
      .agg(min("rk").as("mn"), max("rk").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("n") > 4)
    assert(bad.count() === 0)
    // within a group, rank order must follow value desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("rk")
    val mono = df.withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("value"))
    assert(mono.count() === 0)
  }

  test("partial-pass group cap: overflow pass-through stays correct") {
    // cap the partial heap map far below the group count so most groups
    // take the pass-through path; results must not change
    spark.conf.set(TopK.maxPartialGroupsKey, "4")
    try {
      val native = TopK.perGroup(
        Tables.load(spark, TestSpark.sf, "events")
          .select("user_id", "event_id", "value"),
        Seq("user_id"), Seq(("value", false), ("event_id", true)), 3, "rn")
        .orderBy("user_id", "rn").collect()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      val window = Tables.load(spark, TestSpark.sf, "events")
        .select("user_id", "event_id", "value")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("user_id", "rn").collect()
      assert(native.length === window.length)
      assert(native.map(_.toSeq).toSeq === window.map(_.toSeq).toSeq)
      val nGroups = Tables.load(spark, TestSpark.sf, "events")
        .select("user_id").distinct().count()
      assert(nGroups > 4) // the cap really was exceeded
    } finally spark.conf.unset(TopK.maxPartialGroupsKey)
  }

  // AQE folds materialized stages into QueryStageExec leaves whose actual
  // plan hangs off `.plan`, not `children` — a plain collect() misses them
  private def deepNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: deepNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: deepNodes(q.plan)
    case _ => p +: p.children.flatMap(deepNodes)
  }

  private def topkNodes(df: org.apache.spark.sql.DataFrame): Seq[TopKPerGroupExec] =
    deepNodes(df.queryExecution.executedPlan).collect { case t: TopKPerGroupExec => t }

  test("SQLMetrics: evictions and pass-through are observable on the exec") {
    // small cap forces both heap pruning (admitted groups) and
    // pass-through (overflow groups) on the events table
    spark.conf.set(TopK.maxPartialGroupsKey, "4")
    try {
      val df = TopK.perGroup(
        Tables.load(spark, TestSpark.sf, "events")
          .select("user_id", "event_id", "value"),
        Seq("user_id"), Seq(("value", false), ("event_id", true)), 2, "rk")
      val n = df.collect().length
      val nodes = topkNodes(df)
      val partial = nodes.filter(_.partial)
      val fin = nodes.filterNot(_.partial)
      assert(partial.nonEmpty && fin.nonEmpty)
      assert(fin.map(_.metrics("numOutputRows").value).sum === n)
      assert(partial.map(_.metrics("heapEvictions").value).sum > 0)
      assert(partial.map(_.metrics("passThroughRows").value).sum > 0)
      assert(partial.map(_.metrics("numOutputRows").value).sum >= n)
    } finally spark.conf.unset(TopK.maxPartialGroupsKey)
  }

  test("partial row budget scales the group cap inversely with k") {
    // rowBudget 64 with k=16 admits only 4 groups per task
    spark.conf.set(TopK.maxPartialRowsKey, "64")
    try {
      val df = TopK.perGroup(
        Tables.load(spark, TestSpark.sf, "events")
          .select("user_id", "event_id", "value"),
        Seq("user_id"), Seq(("value", false), ("event_id", true)), 16, "rk")
      assert(df.collect().nonEmpty) // correct under the tiny budget
      assert(topkNodes(df).length === 2) // partial + final pair planned
    } finally spark.conf.unset(TopK.maxPartialRowsKey)
  }

  test("missing column errors clearly") {
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(Tables.load(spark, TestSpark.sf, "region"),
        Seq("nope"), Seq(("r_name", true)), 1)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("optimizer rule retargets row_number-filter onto the native operator") {
    import org.apache.spark.sql.expressions.Window
    // a child session with ONLY the rule + strategy installed — the pattern
    // a conf-deployed GraftExtensions session would run
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.RowNumberTopKRewrite)
    s2.experimental.extraStrategies = Seq(TopK.Planner)
    def query(sess: org.apache.spark.sql.SparkSession) =
      Tables.load(sess, TestSpark.sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_orderkey")
            .orderBy(col("l_extendedprice").desc, col("l_linenumber"))))
        .filter(col("rn") <= 3)
        .orderBy("l_orderkey", "rn")
    val rewritten = query(s2)
    // the native operator is planned, and the Window translation is gone
    assert(topkNodes(rewritten).nonEmpty, rewritten.queryExecution.executedPlan)
    assert(!rewritten.queryExecution.executedPlan.toString.contains("WindowExec"))
    // identical rows to the untouched window form on the parent session
    val plain = query(spark)
    assert(topkNodes(plain).isEmpty) // parent session really is untouched
    assert(rewritten.collect().map(_.toSeq).toSeq === plain.collect().map(_.toSeq).toSeq)
    // a rank/dense_rank query (tie-admitting) must NOT be rewritten
    val ranked = Tables.load(s2, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
      .withColumn("rk", rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy(col("l_extendedprice"))))
      .filter(col("rk") <= 3)
    assert(topkNodes(ranked).isEmpty, "rank() must not match the rewrite")
  }

  test("rewrite leaves global (no PARTITION BY) top-N and degenerate bounds alone") {
    import org.apache.spark.sql.expressions.Window
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.RowNumberTopKRewrite)
    s2.experimental.extraStrategies = Seq(TopK.Planner)
    val li = Tables.load(s2, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    // GLOBAL top-N: the exec's ClusteredDistribution(Nil) is rejected by
    // Spark, so the rule must NOT fire — the query must still plan and run
    val global = li.withColumn("rn", row_number().over(
        Window.orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))))
      .filter(col("rn") <= 5)
    assert(topkNodes(global).isEmpty, "global top-N must not be rewritten")
    assert(global.count() === 5L)
    // rn < Int.MinValue is always false (row numbers start at 1); the
    // strict-bound k-1 underflow would have rewritten it into
    // top-Int.MaxValue and returned EVERY row
    val degenerate = li.withColumn("rn", row_number().over(
        Window.partitionBy("l_orderkey")
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))))
      .filter(col("rn") < Int.MinValue)
    assert(topkNodes(degenerate).isEmpty, "underflowing bound must not match")
    assert(degenerate.count() === 0L)
    // the native API itself refuses an empty group list with a clear error
    val err = intercept[IllegalArgumentException] {
      TopK.perGroup(li, groupCols = Seq.empty,
        orderBy = Seq(("l_extendedprice", false)), k = 3)
    }
    assert(err.getMessage.contains("group column"))
  }
}
