package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed connected components — the dedup CLOSURE operator: near-dup
  * pair sets (q36/q38) are edge lists, and corpus dedup keeps one survivor
  * per connected component, not per pair. Min-id survivorship over raw
  * pairs (q39) is exact only when every member of a dup cluster pairs with
  * the cluster minimum; components make the closure explicit, so clusters
  * that span LSH buckets (A~B in one bucket, B~C in another, A/C never
  * co-bucketed) still collapse to one survivor.
  *
  * Algorithm: the alternating large-star / small-star method (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SOCC'14) —
  * two edge-rewrite rounds per iteration, each one groupBy-min + join over
  * the edge list, converging in O(log n) iterations even on path graphs
  * (plain min-label propagation needs O(diameter) rounds, which a
  * neighbor-chain-capped mega-clique would actually hit at 100 TB: the cap
  * emits chains, and a 1M-doc clique becomes a 62k-hop path).
  *
  *  - large-star: every node u connects its LARGER neighbors to
  *    m(u) = min(u, neighbors(u)) — long chains contract toward minima
  *    from every node at once (pointer doubling);
  *  - small-star: every node u connects its smaller-or-equal neighbors
  *    and itself to m(u) — the forest flattens into stars.
  *
  * Scale: each round shuffles bare (u, v) long pairs only (groupBy u /
  * join on u — the same key, so AQE coalesces; no payload ever rides the
  * iteration). Each round's edge set is localCheckpoint'ed: a persist
  * alone caches BLOCKS but keeps the logical plan growing (each round
  * references the previous ~6 times, so N un-truncated rounds build a
  * 6^N-node plan — measured as a driver OOM just EXPLAINING round 8);
  * the checkpoint replaces the plan with the materialized RDD. On a real
  * cluster a reliable `checkpoint()` to the checkpoint dir would be the
  * fault-tolerant variant — same shape, one conf. The driver sees only
  * per-round edge counts (one long each), never edge data.
  */
object GraphOps {

  /** Connected components over an undirected edge list (columns `src`,
    * `dst`, any numeric id type; self-loops and duplicates tolerated).
    * Returns (id, component) for every node present in the edge list,
    * where component = the minimum node id reachable from `id`. */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    // canonical working set: undirected, no self-loops, deduped
    var cur = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
      .select(array_min(array(col("src"), col("dst"))).as("u"),
        array_max(array(col("src"), col("dst"))).as("v"))
      .distinct()
      .localCheckpoint()
    var curCount = cur.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // -------- large-star: for each u, link larger neighbors to the
      // neighborhood minimum. Neighborhood here is over BOTH directions.
      val nbrs = cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // -------- small-star: group by the larger endpoint; link all
      // smaller neighbors AND the node itself to the minimum.
      val bySmaller = large
        .select(array_max(array(col("u"), col("v"))).as("u"),
          array_min(array(col("u"), col("v"))).as("v"))
        .filter(col("u") =!= col("v"))
      val smallMins = bySmaller.groupBy("u").agg(min(col("v")).as("m"))
      val small = bySmaller.join(smallMins, "u")
        .select(col("v").as("n"), col("m"))
        .union(smallMins.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(array_min(array(col("n"), col("m"))).as("u"),
          array_max(array(col("n"), col("m"))).as("v"))
        .distinct()
        .localCheckpoint()
      // convergence: the canonical edge set is a literal fixpoint. Count
      // equality gates the (join-shaped) set difference, so the extra pass
      // runs only on the final round (counts shrink monotonically under
      // star contraction until the forest stabilizes). The previous
      // round's count is carried, not recomputed.
      val smallCount = small.count()
      converged = smallCount == curCount && small.exceptAll(cur).head(1).isEmpty
      cur = small
      curCount = smallCount
      i += 1
    }
    // a truncated iteration would silently label nodes with INTERMEDIATE
    // minima — fail loudly instead (log-round convergence makes the cap
    // generous: 50 rounds covers graphs far beyond any real corpus)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIterations iterations " +
        s"($curCount edges remaining) — raise maxIterations")
    // final edge set is a star forest: every v points at its component min u
    cur.select(col("v").as("id"), col("u").as("component"))
      .union(cur.select(col("u").as("id"), col("u").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** q66: the dedup closure over the corpus — every document labeled with
    * its near-dup component (component = min doc_id reachable through the
    * verified 3-gram-Jaccard pair set, q38's basis), plus the component
    * size. Docs with no near-dup are their own singleton component. The
    * pair basis is oracle-able brute-force in DuckDB and the closure is a
    * recursive CTE there, so the whole query keeps an EXACT oracle — the
    * engine's iterative star-contraction must reproduce transitive
    * closure exactly. */
  def q66DedupComponents(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
    val pairs = DedupOps.ngramNearDupPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comps = connectedComponents(pairs)
    val labeled = docs.select(col("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val sizes = labeled.groupBy("component").agg(count(lit(1)).as("component_size"))
    labeled.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("component_size"),
        (col("doc_id") === col("component")).as("is_survivor"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_dedup_components" -> (q66DedupComponents _))

  /** Exact oracle: the same thresholded pair basis as q38, closed with a
    * recursive transitive-closure CTE, min-labeled per doc. */
  val oracle: Map[String, String] = Map(
    "q66_dedup_components" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id,
        |  list_distinct(list_transform(
        |    range(0, greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')) - 3, 0) + 1),
        |    i -> array_to_string(regexp_split_to_array(trim(lower(text)), '\s+')[i+1:i+3], ' ')
        |  )) AS grams
        | FROM documents),
        |p AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.5),
        |e AS (
        | SELECT doc_a AS u, doc_b AS v FROM p
        | UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(id, r) AS (
        | SELECT doc_id, doc_id FROM documents
        | UNION
        | SELECT reach.id, e.v FROM reach JOIN e ON e.u = reach.r),
        |lbl AS (
        | SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |sz AS (
        | SELECT component, count(*) AS component_size FROM lbl GROUP BY component)
        |SELECT lbl.doc_id, lbl.component, sz.component_size,
        |  lbl.doc_id = lbl.component AS is_survivor
        |FROM lbl JOIN sz USING (component)
        |ORDER BY doc_id""".stripMargin)
}
