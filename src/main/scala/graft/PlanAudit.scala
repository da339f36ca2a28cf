package graft

/** Dev-loop plan audit: plans EVERY registered query at sf0.001 and flags
  * CartesianProduct / BroadcastNestedLoopJoin operators — the two shapes
  * that silently turn into O(n²) at scale. Queries whose design
  * LEGITIMATELY cross-joins a domain-bounded broadcast side (a band grid,
  * a handful of query vectors, a one-row total) are allowlisted here with
  * the reason; anything NOT listed that plans a nested loop is a
  * regression. `sbt "runMain graft.PlanAudit"` prints one line per query;
  * PlanShapeSpec runs the same scan as a CI gate. */
object PlanAudit {

  /** (query, reason) — every entry is a deliberate broadcast cross join
    * against a side bounded by a VALUE DOMAIN, not by data size. */
  val allowedNestedLoop: Map[String, String] = Map(
    "q221_t_closeness" -> "band-domain global CDF (~11 rows) broadcast",
    // q222's 10-vector broadcast cross join was allowlisted here until
    // round 10 cut its two-consumer ranked relation: the cut truncates
    // the (legitimate) nested loop out of the audited plan, the same way
    // the iterative graph queries' construction-time rounds are invisible
    // to this scan — their shapes are pinned by their own specs instead
    "q40_cosine_topk" -> "10-vector query set broadcast",
    "q53_cosine_topk_native" -> "10-vector query set broadcast",
    "q26_range_band_join" -> "price-band grid broadcast (bounded bands)",
    "q115_distribution_drift" -> "one-row totals broadcast",
    "q110_heavy_hitters" -> "one-row token total broadcast",
    "q104_chi2_independence" -> "one-row total broadcast",
    "q72_tfidf_terms" -> "one-row doc-count broadcast",
    "q127_ppl_buckets" -> "one-row corpus stats broadcast",
    "q90_token_pmi" -> "one-row doc-count broadcast",
    "q154_stream_hitters" -> "one-row token total broadcast",
    "q56_ann_ivf" -> "query + centroid broadcast",
    "q208_mmr_rerank" -> "top-m candidate set broadcast",
    "q143_nearest_centroid" -> "centroid table broadcast",
    "q111_mixture_weights" -> "one-row totals broadcast",
    "q109_lm_doc_score" -> "bigram LM table broadcast",
    "q162_funnel_curve" -> "stage grid broadcast",
    "q195_bloom_index" -> "probe-key list broadcast",
    "q207_zonemap_index" -> "probe grid broadcast",
    "q182_ks_test" -> "two one-row totals broadcast",
    "q114_integrity_audit" -> "one-row totals broadcast",
    "q122_cohort_ltv" -> "cohort-size × one-row max-week grid broadcast",
    "q132_basket_lift" -> "|event types|-row singles + one-row user total",
    "q149_bm25" -> "one-row corpus stats broadcast",
    "q156_session_paths" -> "one-row total broadcast",
    "q191_kcore_peel" -> "one-row per-round edge-count certificate",
    "q81_event_funnel" -> "one-row stage totals broadcast",
    "q256_pagination" -> "one-row keyset anchor broadcast",
    "q258_intdiv_semantics" -> "15×3 generated grid cross join",
    "q217_rolling_ols" ->
      "one-row rebase-min broadcast (replaced the construction-time driver action, r12)",
    "q311_tpch11_stock" -> "one-row value-threshold broadcast (TPC-H Q11)",
    "q322_tpch22_opportunity" -> "one-row avg-balance broadcast (TPC-H Q22)")

  def scan(spark: org.apache.spark.sql.SparkSession, d: String,
           only: Option[Set[String]] = None): Seq[(String, Seq[String])] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      // stream queries EXECUTE on plan access (drain harnesses) — the
      // batch plan audit covers the batch surface; stream plan shapes
      // are pinned by their own specs
      .filterNot(_._1.contains("stream"))
      .flatMap { case (name, fn) =>
        try {
          val plan = fn(spark, d).queryExecution.executedPlan.toString
          val bad = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
            .collect { case (k, true) => k }
          Some(name -> bad)
        } catch {
          // a query that cannot even PLAN must surface as a suspect,
          // not silently vanish from the gate
          case e: Throwable => Some(name -> Seq("PlanningFailed"))
        } finally {
          // iterative/salted queries cut transients at CONSTRUCTION
          // (graph rounds, signature/catalog tables): release them per
          // query or a full scan pins every query's checkpoint at once
          Transients.drop(spark)
        }
      }

  def main(args: Array[String]): Unit = {
    val spark = Graft.sessionBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = scan(spark, "/root/testdata/sf0.001")
    rows.foreach { case (n, bad) =>
      val verdict =
        if (bad.isEmpty) "clean"
        else if (allowedNestedLoop.contains(n)) s"allowed (${allowedNestedLoop(n)})"
        else s"SUSPECT ${bad.mkString(",")}"
      println(s"$n: $verdict")
    }
    val suspects = rows.filter { case (n, bad) =>
      bad.nonEmpty && !allowedNestedLoop.contains(n)
    }
    spark.stop()
    if (suspects.nonEmpty) {
      System.err.println(s"SUSPECT plans: ${suspects.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
