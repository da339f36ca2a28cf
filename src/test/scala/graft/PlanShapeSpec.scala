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
    // nation/region broadcast by HINT (SF-invariant); supplier/part carry
    // no hint (they grow with SF) but the optimizer auto-broadcasts them
    // at this size — so the small-regime plan still has no hash-partition
    // exchange keyed on a dimension key, only the (partkey, suppkey)
    // aggregate and the per-part window
    assert(!plan.contains("Exchange hashpartitioning(s_suppkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(n_nationkey"), plan)
  }

  test("q74: chunking is a pure generator — no exchange before the output sort") {
    // the only exchange allowed is the final presentation ordering
    val plan = planOf(ops.TextOps.q74DocChunks(spark, TestSpark.sf))
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("q77: centroid aggregation partial-combines before its one exchange") {
    val df = ops.SimilarityOps.q77LabelCentroids(spark, TestSpark.sf)
    val plan = planOf(df)
    // exactly one hash-partition exchange (the label,pos aggregate); the
    // presentation orderBy adds only a rangepartitioning
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges === 1, plan)
    // partial aggregation must sit below the exchange (map-side combine):
    // the sum arrives at the exchange as a partial decimal accumulator,
    // never as raw component rows
    assert(plan.contains("partial_sum") || plan.contains("partial sum") ||
      plan.contains("HashAggregate(keys=[label"), plan)
  }

  test("q80: latest-per-key is one aggregation, never a window sort") {
    val plan = planOf(ops.EtlOps.q80LatestPerKey(spark, TestSpark.sf))
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("row_number"), plan)
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges === 1, plan)
  }

  test("q78: pii scrub plans at most the spread exchange before the output sort") {
    // r7: the regex-heavy projection rides behind Tables.spread (the sf1
    // single-split starvation fix), so ONE narrow width-spreading
    // exchange of the raw rows is the design; any second hash exchange
    // (an accidental aggregation/join) is still a regression
    val plan = planOf(ops.TextOps.q78PiiScrub(spark, TestSpark.sf))
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 1, plan)
  }

  test("tpch family: dimension joins broadcast, limit heads take-ordered") {
    // the plan qualities that make the canonical set scale: catalog dims
    // ride BroadcastHashJoin (never a shuffled fact-fact exchange for a
    // 25-row nation), and every LIMIT head is TakeOrderedAndProject (a
    // bounded heap), not a global sort
    val p305 = planOf(ops.TpchOps.q305(spark, TestSpark.sf))
    assert(p305.contains("BroadcastHashJoin"), p305)
    val p302 = planOf(ops.TpchOps.q302(spark, TestSpark.sf))
    assert(p302.contains("BroadcastHashJoin") &&
      p302.contains("TakeOrderedAndProject"), p302)
    val p318 = planOf(ops.TpchOps.q318(spark, TestSpark.sf))
    assert(p318.contains("TakeOrderedAndProject"), p318)
    val p321 = planOf(ops.TpchOps.q321(spark, TestSpark.sf))
    assert(p321.contains("TakeOrderedAndProject"), p321)
  }

  test("q113: verify attaches shuffle-hash — no docs-wide broadcast build") {
    // the containment verify must never broadcast (doc_id, grams): the
    // build serializes the whole corpus' shingle sets through one task
    // and cannot exist at scale. Gram payloads attach via ShuffledHashJoin.
    val plan = planOf(ops.DedupOps.q113ContainmentDedup(spark, TestSpark.sf))
    assert(plan.contains("ShuffledHashJoin"), plan)
    val broadcastGrams = plan.linesIterator.exists(l =>
      l.contains("BroadcastExchange") && l.contains("grams"))
    assert(!broadcastGrams, plan)
  }

  test("banded pair generation pins its bucket-key partitioning (AQE can't fold it)") {
    // the ranking window must consume the pinned REPARTITION_BY_NUM
    // exchange, not plan its own byte-coalescible one
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val pairs = ops.DedupOps.minhashNearDupPairs(docs, maxBucketNeighbors = 16)
    try {
      val plan = pairs.queryExecution.executedPlan.toString
      val pinned = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(band_idx") &&
          l.contains("REPARTITION_BY_NUM"))
      assert(pinned >= 1, plan)
    } finally ops.DedupOps.evict(spark)
  }

  test("compute-spread: single-split scans widen before heavy per-row stages") {
    // Tables.spread repartitions a one-split table and no-ops once the
    // layout already yields enough splits
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    assert(docs.rdd.getNumPartitions === 1)
    val spreadN = Tables.spread(docs, "doc_id").rdd.getNumPartitions
    assert(spreadN ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val wide = docs.repartition(64, org.apache.spark.sql.functions.col("doc_id"))
    assert(Tables.spread(wide, "doc_id").rdd.getNumPartitions === 64)
  }

  test("plan audit: no unexpected nested-loop or cartesian joins anywhere") {
    // plans every non-stream registered query; anything that plans a
    // CartesianProduct / BroadcastNestedLoopJoin and is not explicitly
    // allowlisted (domain-bounded broadcast cross joins) is a regression
    val scanned = graft.PlanAudit.scan(spark, TestSpark.sf)
    val suspects = scanned.filter { case (n, bad) =>
      bad.nonEmpty && !graft.PlanAudit.allowedNestedLoop.contains(n)
    }
    assert(suspects.isEmpty,
      s"unexpected nested-loop plans: ${suspects.map(_._1).mkString(", ")}")
    // the gate is BIDIRECTIONAL (r6 verdict item 8): an allowlisted batch
    // query that no longer plans a nested loop is a STALE entry — the
    // allowlist must shrink with the plans, or removing a real regression
    // guard later would go unnoticed. (Stream-only entries are pinned by
    // their own specs; scan() excludes them.)
    val byName = scanned.toMap
    val stale = graft.PlanAudit.allowedNestedLoop.keys.toSeq.sorted.filter {
      n => byName.get(n).exists(_.isEmpty)
    }
    assert(stale.isEmpty,
      s"allowlist entries whose queries no longer plan nested loops — " +
        s"remove them: ${stale.mkString(", ")}")
    // and a query that cannot even plan must always surface
    val broken = scanned.filter(_._2.contains("PlanningFailed"))
    assert(broken.isEmpty, s"queries failing to plan: ${broken.map(_._1).mkString(", ")}")
  }
}
