package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{BucketingOps, LayoutOps}

/** Layout-as-contract: bucketed tables must join with ZERO exchanges, and
  * the file manifest must prune files without changing results. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // AQE folds stages into QueryStageExec leaves; traverse .plan too
  private def deepNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: deepNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: deepNodes(q.plan)
    case _ => p +: p.children.flatMap(deepNodes)
  }

  test("same-bucketed tables sort-merge join with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    try {
      BucketingOps.writeBucketed(
        Tables.load(spark, TestSpark.sf, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "b_lineitem", s"$dir/li", "l_orderkey", 4)
      BucketingOps.writeBucketed(
        Tables.load(spark, TestSpark.sf, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
        "b_orders", s"$dir/ord", "l_orderkey", 4)
      val j = BucketingOps.coLocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val n = j.count()
      // correctness: equals the plain (shuffled) join of the raw tables
      val plain = Tables.load(spark, TestSpark.sf, "lineitem")
        .join(Tables.load(spark, TestSpark.sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n === plain)
      // the layout claim: no shuffle anywhere in the executed plan
      val exchanges = deepNodes(j.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        j.queryExecution.executedPlan.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("file manifest prunes a range read to a strict file subset, same answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skip").toString
    // a clustered layout: range-partitioned + sorted on the key => each of
    // the 8 files owns a tight, disjoint key range
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val manifest = LayoutOps.fileManifest(table, Seq("l_orderkey")).cache()
    try {
      assert(manifest.count() === 8)
      // manifest totals must reconcile with the table
      assert(manifest.agg(sum("n_rows")).head.getLong(0) === table.count())
      val (lo, hi) = (100L, 300L)
      val (pruned, picked, total) =
        LayoutOps.prunedRead(spark, dir, manifest, "l_orderkey", lo, hi)
      assert(picked < total, s"no pruning: $picked of $total files")
      assert(picked >= 1L)
      // exact same rows as the unpruned filtered read
      val direct = table.filter(col("l_orderkey").between(lo, hi))
      assert(pruned.count() === direct.count())
      assert(pruned.exceptAll(direct).isEmpty && direct.exceptAll(pruned).isEmpty)
      // an out-of-domain range selects zero files and returns empty
      val (empty, picked0, _) =
        LayoutOps.prunedRead(spark, dir, manifest, "l_orderkey", -500L, -100L)
      assert(picked0 === 0L)
      assert(empty.isEmpty)
    } finally manifest.unpersist()
  }

  test("bloom file index: point reads prune files, no false negatives, absent key reads ~0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // orderkey-clustered files: partkey point lookups CANNOT use min/max
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val index = LayoutOps.bloomFileIndex(table, "l_partkey").cache()
    try {
      // probe three present keys: result must equal the full filter
      val keys = table.select("l_partkey").distinct().orderBy("l_partkey")
        .limit(3).collect().map(_.getLong(0))
      keys.foreach { k =>
        val (res, picked, total) =
          LayoutOps.bloomPrunedRead(spark, dir, index, "l_partkey", k)
        val direct = table.filter(col("l_partkey") === k)
        assert(res.exceptAll(direct).isEmpty && direct.exceptAll(res).isEmpty,
          s"key $k: bloom read diverged from the full filter")
        assert(picked >= 1L && picked <= total)
      }
      // an absent key must touch (almost) nothing — fp-rate-bounded
      val maxK = table.agg(max("l_partkey")).head.getLong(0)
      val (resA, pickedA, totalA) =
        LayoutOps.bloomPrunedRead(spark, dir, index, "l_partkey", maxK + 12345)
      assert(resA.isEmpty)
      assert(pickedA < totalA, "absent key pruned nothing — bloom saturated")
    } finally index.unpersist()
  }

  test("zonemap file index: range reads prune files, no false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap").toString
    // orderkey-clustered files: orderkey RANGE probes are the zone-map case
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dir)
    val table = spark.read.parquet(dir)
    val index = LayoutOps.zonemapFileIndex(table, "l_orderkey").cache()
    try {
      val (minK, maxK) = {
        val r = table.agg(min("l_orderkey"), max("l_orderkey")).head
        (r.getLong(0), r.getLong(1))
      }
      // a narrow band: result == full filter AND files actually skipped
      val (lo, hi) = (minK + (maxK - minK) / 2, minK + (maxK - minK) / 2 + (maxK - minK) / 16)
      val (res, picked, total) =
        LayoutOps.zonemapPrunedRead(spark, dir, index, "l_orderkey", lo, hi)
      val direct = table.filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
      assert(res.exceptAll(direct).isEmpty && direct.exceptAll(res).isEmpty,
        "zonemap read diverged from the full filter")
      assert(picked < total, "narrow band pruned nothing — zones not tight")
      assert(res.count() === direct.count())
      // the full span must read everything and still equal the filter
      val (resF, pickedF, totalF) =
        LayoutOps.zonemapPrunedRead(spark, dir, index, "l_orderkey", minK, maxK)
      assert(pickedF === totalF)
      assert(resF.count() === table.count())
      // a band beyond max touches zero files
      val (resA, pickedA, _) =
        LayoutOps.zonemapPrunedRead(spark, dir, index, "l_orderkey", maxK + 10, maxK + 20)
      assert(resA.isEmpty && pickedA === 0L)
    } finally index.unpersist()
  }

  test("q207: zone map certifies no false negatives; needle probe skips shards") {
    val got = graft.ops.LayoutOps.q207ZonemapIndex(spark, TestSpark.sf).collect()
    assert(got.length === 5)
    got.foreach { r =>
      // scanned superset of matched; scanned row mass covers matched rows
      assert(r.getAs[Long]("n_shards_matched") <= r.getAs[Long]("n_shards_hit"))
      assert(r.getAs[Long]("n_rows") <= r.getAs[Long]("n_rows_scanned"))
      assert(r.getAs[Long]("skip_bp") >= 0L && r.getAs[Long]("skip_bp") <= 10000L)
    }
    // the 7-day needle probe (probe_id 4) must skip most month shards
    val needle = got.find(_.getAs[Long]("probe_id") == 4L).get
    assert(needle.getAs[Long]("n_shards_hit") <= 2L)
    assert(needle.getAs[Long]("skip_bp") > 9000L)
    // quarters tile the span: their matched rows sum to the whole table
    val quarterRows = got.filter(_.getAs[Long]("probe_id") < 4L)
      .map(_.getAs[Long]("n_rows")).sum
    assert(quarterRows === Tables.load(spark, TestSpark.sf, "lineitem").count())
  }
}
