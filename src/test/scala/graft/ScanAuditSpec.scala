package graft

import org.scalatest.funsuite.AnyFunSuite

/** THE SCAN-COUNT GATE (round-12, VERDICT r11 item 2): every registered
  * query's optimized plan is tallied by [[ScanAudit.scanCounts]] — how
  * many times does it scan each base parquet table — and every query whose
  * max per-table count reaches 3 carries a PINNED count map plus a
  * one-line reason below (the r11 session-19 triage, converted from a
  * hand-run tool into a standing gate, exactly the EdgeCorpusSpec
  * pattern). The projection-collapse regression class (q237/q118 in r11:
  * Catalyst inlining a computed-alias scorer into every consumer branch,
  * 3× corpus scans) was found only via a bench diff; this spec makes the
  * next one fail `sbt test` instead of a bench cycle.
  *
  * Contract, bidirectional:
  *  - an UNLISTED query reaching 3 scans of one table fails (new fanout —
  *    either cut the multi-consumer frame or disposition it with a reason);
  *  - a LISTED query whose counts CHANGED fails in either direction (an
  *    improvement must delete/refresh its entry — the list stays honest).
  *
  * Counts are structural (optimized LOGICAL plan, pre-AQE, subqueries
  * included; cut/cached subtrees are leaves and count 0), so they do not
  * depend on data volume — sf0.001 is used because construction drains
  * stream queries and eagerly materializes Transients.cut sites, which at
  * this SF costs seconds. Session caches are evicted up front and queries
  * run in sorted order, so memo-cache state is deterministic.
  */
class ScanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = GenEdge.SkewSource // /root/testdata/sf0.001

  /** query -> (pinned per-table scan counts, why this fanout is by-design
    * or measured-cheaper-than-a-cut). Reasons from the r11 triage
    * (ROUNDLOG r11 session 19) re-asserted as code. */
  private val dispositions: Map[String, (Map[String, Int], String)] = Map(
    // --- events funnel/sequence family: one scan per stage, each with a
    // DIFFERENT pushed filter — a cut would materialize the unfiltered
    // union and forfeit pushdown entirely
    "q81_event_funnel" -> (Map("events" -> 7) ->
      "per-stage pushed filters; a cut forfeits pushdown"),
    "q162_funnel_curve" -> (Map("events" -> 8) ->
      "per-stage pushed filters; a cut forfeits pushdown"),
    "q215_multitouch_attribution" -> (Map("events" -> 5) ->
      "per-touchpoint pushed filters"),
    "q152_nearest_event" -> (Map("events" -> 5) ->
      "per-side pruned projections of the as-of pair"),
    "q132_basket_lift" -> (Map("events" -> 5) ->
      "basket/item/pair legs each scan a pruned projection"),
    "q122_cohort_ltv" -> (Map("events" -> 4) ->
      "cohort anchor vs activity legs, different pushed filters"),
    "q103_robust_outliers" -> (Map("events" -> 4) ->
      "median/MAD/score passes each scan 2 pruned columns"),
    "q142_rolling_actives" -> (Map("events" -> 3) ->
      "enter/exit/grid legs, different pushed filters"),
    "q182_ks_test" -> (Map("events" -> 3) ->
      "two sample legs + rank grid, pruned 2-column scans"),
    "q216_seq_rules" -> (Map("events" -> 3) ->
      "antecedent/consequent/support legs, pushed filters"),
    "q168_skew_audit" -> (Map("lineitem" -> 4, "events" -> 2) ->
      "per-key-family skew probes, each a pruned scan"),
    // --- TPC-H / SQL multi-reference shapes: self-joins, EXISTS, bag ops
    // are multi-reference by SEMANTICS
    "q321_tpch21_waiting" -> (Map("lineitem" -> 3, "orders" -> 3,
      "nation" -> 1, "supplier" -> 1) ->
      "TPC-H Q21's EXISTS/NOT EXISTS self-joins"),
    "q189_correlated_subquery" -> (Map("lineitem" -> 3, "part" -> 1,
      "orders" -> 1) -> "correlated scalar subqueries per reference"),
    "q211_set_ops_all" -> (Map("lineitem" -> 4) ->
      "INTERSECT ALL/EXCEPT ALL legs are distinct references"),
    "q213_not_in_nulls" -> (Map("orders" -> 6, "customer" -> 5) ->
      "NOT IN / NULL-semantics contrast legs by construction"),
    "q256_pagination" -> (Map("orders" -> 3) ->
      "3 keyset pages, each a pushed range scan"),
    "q165_ivm_join" -> (Map("lineitem" -> 3, "orders" -> 3) ->
      "base/delta/view maintenance legs"),
    "q114_integrity_audit" -> (Map("orders" -> 3, "lineitem" -> 2,
      "documents" -> 1, "customer" -> 1, "events" -> 1) ->
      "per-FK-direction anti-join probes"),
    "q97_table_checksum" -> (Map("lineitem" -> 3) ->
      "checksum legs per column family, map-side only"),
    // --- pruned-projection rescans measured CHEAPER than a cut (r11
    // sweep: cutting corpus-scale explodes was 1.4-6x WORSE)
    "q102_contamination" -> (Map("documents" -> 3) ->
      "gram-table cut measured 6x worse (8.1->48.2s sf1)"),
    "q163_bpe_encode" -> (Map("documents" -> 3) ->
      "pre-token cut measured worse (9.7->13.5s sf1)"),
    "q72_tfidf_terms" -> (Map("documents" -> 3) ->
      "token-table cut measured worse (2.7->4.5s sf1)"),
    "q90_token_pmi" -> (Map("documents" -> 5) ->
      "distinct-pair cut measured worse (3.5->4.8s sf1)"),
    "q111_mixture_weights" -> (Map("documents" -> 3) ->
      "2-column pruned scans for cheap per-source aggregates"),
    "q166_sketch_quantiles" -> (Map("documents" -> 3) ->
      "2-column pruned scans per sketch leg"),
    "q221_t_closeness" -> (Map("customer" -> 3) ->
      "class/global/EMD legs over a 150-row dimension"),
    // --- near-dup pair pipelines: optimization r13 materialized the
    // shared shingle/bucket relations once (bandedPairs bucket cut,
    // ppjoinPairs/q113 shingle cut, minhashBucketsMd5 min-aggregate
    // form), so their per-query base scans dropped below the fanout
    // threshold and the former documents=4..7 pins are retired — the
    // default >=3 rule now guards the regression direction (a broken cut
    // sends the count straight back to 6-7 and fails here)
    // --- embedding probes: each side scans a pruned slice
    "q42_ann_lsh" -> (Map("embeddings" -> 4) ->
      "plane build + bucket sides scan pruned vector slices"),
    "q208_mmr_rerank" -> (Map("embeddings" -> 6) ->
      "query/pool/diversity legs over pruned vector slices")
  )

  test("every query's base-table scan counts match the pinned dispositions") {
    TestSpark.requireTestdata(sfDir)
    // counts are pinned against a CACHE-COLD session: any InMemoryRelation
    // left by an earlier suite (the shared TestSpark session runs ~26
    // suites before this one in a full `sbt test`) turns that subtree into
    // a zero-count leaf and reads as drift — clear ALL cached relations,
    // not just the three operator memo registries
    spark.catalog.clearCache()
    Bench.evictCaches(spark)
    Transients.drop(spark)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val counts =
        try ScanAudit.scanCounts(fn(spark, sfDir))
        finally Transients.drop(spark)
      val maxC = if (counts.isEmpty) 0 else counts.values.max
      dispositions.get(name) match {
        case None if maxC >= 3 =>
          failures += s"$name: NEW scan fanout ${fmt(counts)} — cut the " +
            "multi-consumer frame or disposition it with a reason"
        case Some((pinned, why)) if counts != pinned =>
          failures += s"$name: counts drifted — pinned ${fmt(pinned)} " +
            s"($why) but plan now has ${fmt(counts)}; refresh or delete " +
            "the disposition"
        case _ => ()
      }
    }
    assert(failures.isEmpty,
      s"scan-audit gate failures:\n${failures.sorted.mkString("\n")}")
  }

  private def fmt(m: Map[String, Int]): String =
    m.toSeq.sortBy(-_._2).map { case (t, c) => s"$t=$c" }.mkString(" ")
}
