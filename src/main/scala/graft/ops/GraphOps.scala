package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * iteration). Each round's edge set is lineage-cut via
  * [[graft.Transients.cut]]: a persist alone caches BLOCKS but keeps the
  * logical plan growing (each round references the previous ~6 times, so
  * N un-truncated rounds build a 6^N-node plan — measured as a driver OOM
  * just EXPLAINING round 8); the checkpoint replaces the plan with the
  * materialized RDD. By default that cut is a localCheckpoint (fastest,
  * lost on executor failure); setting `spark.graft.reliableCheckpointDir`
  * (or `SPARK_GRAFT_RELIABLE_CHECKPOINT`) switches every round to a
  * reliable `checkpoint()` so a multi-hour 100 TB run survives node loss
  * instead of restarting from round zero. The driver sees only per-round
  * edge counts (one long each), never edge data.
  */
object GraphOps {

  /** Canonical (u < v) edge list symmetrized to both orientations — THE
    * shared neighborhood basis of the whole graph family (CC rounds,
    * degree tables, PageRank adjacencies, BFS frontiers, wedge
    * enumeration). One load-bearing detail, applied here once instead of
    * at every call site: BOTH union children alias every column. An
    * unaliased child that selects exactly the input's columns collapses
    * to the (possibly checkpointed) relation itself, and Union's
    * constraint rewrite then throws "key not found" when a LogicalRDD
    * input (the co-order edge memo, a CC round's cut) carries constraints
    * minted against pre-checkpoint attribute ids — the Spark
    * constraint-propagation corner q161 documents. `cols` defaults to the
    * bare (u, v) pair; pass ("u", "v", "w") to carry the weight. */
  private def symmetrized(e: DataFrame, cols: String*): DataFrame = {
    val cs = if (cols.isEmpty) Seq("u", "v") else cols
    def side(u: String, v: String) =
      e.select((Seq(col(u).as("u"), col(v).as("v")) ++
        cs.drop(2).map(c => col(c).as(c))): _*)
    side("u", "v").union(side("v", "u"))
  }

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
      .transform(graft.Transients.cut)
    var curCount = cur.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // -------- large-star: for each u, link larger neighbors to the
      // neighborhood minimum. Neighborhood here is over BOTH directions.
      val nbrs = symmetrized(cur)
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
        .transform(graft.Transients.cut)
      // convergence: the canonical edge set is a literal fixpoint. Count
      // equality gates the (join-shaped) set difference, so the extra pass
      // runs only on the final round (counts shrink monotonically under
      // star contraction until the forest stabilizes). The previous
      // round's count is carried, not recomputed.
      val smallCount = small.count()
      converged = smallCount == curCount && small.exceptAll(cur).head(1).isEmpty
      // the superseded round's checkpoint blocks are dead the moment the
      // new round is materialized (count above) — release them NOW, or a
      // log-round run pins every intermediate edge set until session death
      cur.unpersist(blocking = false)
      cur = small
      curCount = smallCount
      i += 1
    }
    // a truncated iteration would silently label nodes with INTERMEDIATE
    // minima — fail loudly instead (log-round convergence makes the cap
    // generous: 50 rounds covers graphs far beyond any real corpus).
    // Track the final round BEFORE throwing: its checkpoint blocks are
    // otherwise orphaned (invisible to Transients.drop) and pin block-
    // manager memory for the session's life in a harness that catches
    // the error and moves on.
    if (!converged) {
      graft.Transients.track(cur)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations " +
          s"($curCount edges remaining) — raise maxIterations")
    }
    // final edge set is a star forest: every v points at its component min u.
    // This last checkpoint backs the returned plan — released at the next
    // query boundary, not here.
    graft.Transients.track(cur)
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

  // ---------------------------------------------------------------- q148
  /** QUALITY-AWARE CLUSTER CANONICALIZATION — the selection policy that
    * follows dedup clustering: q66 labels every doc with its near-dup
    * component, but "keep the MINIMUM id" is an arbitrary survivor. The
    * curation-grade policy keeps the HIGHEST-QUALITY member (q33's
    * composite score), tie-broken to the smaller id, and that argmax is
    * ONE max(struct(quality, −id)) aggregation per component — map-side
    * partial, no per-cluster sort, no second join against the cluster
    * (the q80 latest-per-key shape applied to dedup). Output is the
    * cluster table a dedup-apply pass consumes: component, size, chosen
    * survivor, its quality, and the min-id member's quality beside it
    * (equal iff min-id survivorship was already optimal; the two rounded
    * scores are reported side by side rather than subtracted — a
    * difference would need a re-round, the one op that can split engines
    * on a ...5 boundary, the q72 lesson).
    *
    * Exactness: the quality score is a 4-dp-rounded double of integer
    * ratios (engine-exact, q33's contract), struct comparison is
    * lexicographic in both engines, and the oracle recomputes the same
    * pair basis (q38's, recall-verified), closes it with a recursive CTE,
    * and aggregates the same struct — hash-exact end to end. */
  def q148ClusterSurvivor(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
    val pairs = DedupOps.ngramNearDupPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val comps = connectedComponents(pairs)
    val labeled = docs
      .withColumn("q", TextOps.qualityScore(col("text"), col("n_chars")))
      .select(col("doc_id"), col("q"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("q"),
        coalesce(col("component"), col("doc_id")).as("component"))
    labeled.groupBy("component")
      .agg(count(lit(1)).as("component_size"),
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("m"),
        min(when(col("doc_id") === col("component"), col("q"))).as("minid_q"))
      .select(col("component"), col("component_size"),
        (-col("m.nid")).as("survivor_id"), col("m.q").as("survivor_quality"),
        col("minid_q").as("minid_quality"))
      .orderBy("component")
  }

  // ---------------------------------------------------------------- q150
  /** ENTITY RESOLUTION — the catalog-cleaning closure over q91's fuzzy
    * match basis: names whose blocked Levenshtein distance is ≤ 3 chain
    * into clusters (transitive closure via the same alternating-star CC
    * as q66 — fuzzy matching is not transitive, so A~B, B~C must merge
    * A,B,C even when A̸~C), each cluster keyed by its lexicographic-min
    * name and canonicalized to its MOST FREQUENT member (tie → name asc
    * via one min(struct(−freq, name)) aggregation — no per-cluster sort).
    *
    * String nodes ride the CC machinery as 56-bit ids (first 14 md5 hex
    * digits, the q97 rendering). A collision (~n²/2^57 for a catalog of n
    * names) WOULD spuriously merge two clusters and diverge from the
    * string-keyed oracle — accepted as negligible at catalog cardinality
    * and caught loudly by the oracle gate if it ever fires; widen to the
    * full hex digest if a catalog approaches 2^28 names. The cluster
    * label itself never leaves the engine: output keys are names.
    *
    * Scale: everything here is catalog-sized (distinct names), not
    * row-sized — the groupBy collapses 100 TB of parts to |names| rows
    * before any pair or closure work; the closure converges in
    * O(log diameter) rounds on bare long pairs. */
  def q150EntityClusters(s: SparkSession, d: String): DataFrame = {
    def nid(c: Column): Column =
      expr(s"CAST(conv(substr(md5(CAST(${c.toString} AS BINARY)), 1, 14), 16, 10) AS BIGINT)")
    // NULL names are unmatchable in both engines (the nounCatalog rule) —
    // and the oracle's string-keyed closure drops them on its NULL-never-
    // equals join anyway, so exclude them from the catalog EXPLICITLY
    val names = Tables.load(s, d, "part")
      .filter(col("p_name").isNotNull)
      .groupBy("p_name")
      .agg(count(lit(1)).as("n_parts"))
    val pairs = DedupOps.q91FuzzyBlocked(s, d).select("name_a", "name_b")
    val comps = connectedComponents(pairs
      .select(nid(col("name_a")).as("src"), nid(col("name_b")).as("dst")))
    names
      .withColumn("nid", nid(col("p_name")))
      .join(comps.withColumnRenamed("id", "nid"), Seq("nid"), "left")
      .withColumn("comp", coalesce(col("component"), col("nid")))
      .groupBy("comp")
      .agg(min("p_name").as("cluster_key"),
        count(lit(1)).as("n_names"),
        sum("n_parts").as("total_parts"),
        min(struct((-col("n_parts")).as("nn"), col("p_name").as("nm")))
          .as("c"))
      .select(col("cluster_key"), col("n_names"), col("total_parts"),
        col("c.nm").as("canonical_name"), (-col("c.nn")).as("canonical_parts"))
      .orderBy("cluster_key")
  }

  // ---------------------------------------------------------------- q99
  /** Weighted co-occurrence graph + TRIANGLE enumeration — the "frequently
    * bought together" / community-structure primitive. Nodes are parts,
    * an edge (u, v, w) means parts u and v appeared in w common orders.
    *
    * The scale control is the MUTUAL top-`cap` pruning: every node ranks
    * its neighbors by (weight DESC, id) and an edge survives only if each
    * endpoint is in the other's top-`cap` list (mutual-kNN sparsification,
    * symmetric by construction and deterministic under the id tiebreak).
    * That bounds the wedge count of the triangle join at n·C(cap,2)
    * regardless of how dense the raw co-occurrence graph grows — an
    * unpruned m²-per-hub wedge blowup is the standard triangle-count
    * killer. Edges are oriented low-id → high-id so each triangle is
    * enumerated exactly once ((a<b<c) wedge a→b, a→c probed against b→c);
    * on a skewed cluster you'd orient by (degree, id) instead — same
    * algorithm, flatter wedge distribution (the node-iterator bound moves
    * from max-degree² to arboricity·m). The edge list is localCheckpoint'ed
    * once — three probes of a materialized ~100k-row table, not three
    * recomputes of the pair join.
    *
    * Pair generation rides the per-order self-join: Σ C(items_i, 2) pairs
    * (bounded by order size, ~4 lines avg), never a global cross. */
  def coOrderEdges(lineitem: DataFrame, cap: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Pair generation stays the per-order SELF-JOIN. An optimization-r13
    // candidate rewrote it as groupBy(o).agg(sort_array(collect_set(p)))
    // + pair explode ("aggregate before you shuffle", guide §2.3) — but
    // collect_set plans as ObjectHashAggregate, an object-mode aggregate
    // OUTSIDE whole-stage codegen (guide §4: prefer codegen'd built-ins
    // in hot paths), and the A/B/A profile showed it REGRESSING the
    // family: q223's end-to-end task time rose 55.9 → 75.5 task-s (the
    // array build cost more than the second scan it saved, and the
    // array-explode stage starved the downstream wedge join of
    // parallelism), q105 was flat. Columnar distinct + codegen'd SMJ
    // wins here; the rewrite is recorded in OPTIMIZATION_r13.md as
    // measured-and-rejected.
    val op = lineitem.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pw = op.as("a")
      .join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("w"))
    val adj = symmetrized(pw, "u", "v", "w")
    // materialize the capped ranking ONCE (≤ n·cap rows): the mutual join
    // probes it from both sides with swapped keys, which defeats exchange
    // reuse — without the checkpoint the adjacency window runs twice.
    // The cap is the native TopKPerGroup operator (bounded per-group
    // heaps), not a row_number window: timing parity at sf0.1 (r8
    // measured 4.4 vs 4.6 s q105 medians — the pre-cap adjacency is
    // small there), but the window sorts EVERY node's full adjacency to
    // keep 64, so at 100 TB a hub node's sort is the build's straggler
    // while the 64-heap stays O(deg·log 64). Semantics identical:
    // (w desc, v asc) is a total order, so heap and window keep exactly
    // the same rows (the DuckDB oracle replays the same cap as a window
    // over the same total order).
    val rk = graft.Transients.track(
      graft.plans.TopK.perGroup(adj, groupCols = Seq("u"),
        orderBy = Seq(("w", false), ("v", true)), k = cap, rankName = "r")
      .transform(graft.Transients.cut))
    rk.as("x")
      .join(rk.select(col("u").as("yu"), col("v").as("yv")).as("y"),
        col("x.u") === col("y.yv") && col("x.v") === col("y.yu"))
      .filter(col("x.u") < col("x.v"))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("x.w").as("w"))
  }

  /** Session-scoped memo of the materialized capped co-order graph — the
    * expensive shared basis of every graph query (triangles, PageRank):
    * built and localCheckpoint'ed ONCE per (session, dir), reused by later
    * callers, same contract as the dedup pair cache (DedupOps.pairCache).
    * [[evict]] drops it; the bench evicts before each timed run of the
    * producer query so the build is never mistaken for a cache hit. */
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def cachedCoOrderEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.getOrElseUpdate((s, d),
      coOrderEdges(Tables.load(s, d, "lineitem")).transform(graft.Transients.cut))

  def evict(s: SparkSession): Unit =
    edgeCache.keys.filter(_._1 eq s).foreach { k =>
      // release the checkpoint's blocks, not just the reference — dropping
      // the map entry alone leaves the blocks pinned until session death
      edgeCache.remove(k).foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    }

  /** q99: top-20 heaviest triangles of the mutually-capped co-order graph,
    * ranked by summed edge weight with a full (a, b, c) id tiebreak —
    * deterministic total order, so the LIMIT keeps an exact oracle. */
  def q99TriangleCooccur(s: SparkSession, d: String): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(e.as("e3"),
        col("e1.v") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"),
        (col("e1.w") + col("e2.w") + col("e3.w")).as("tw"))
      .orderBy(col("tw").desc, col("a"), col("b"), col("c"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q105
  /** PageRank in EXACT INTEGER arithmetic — fixed-point iteration made
    * engine-portable: float PageRank is unreproducible across engines
    * (the in-neighbor sum is order-sensitive), so ranks live on an
    * integer grid of 1e-12 units and every update is integer multiply /
    * floor-divide — r' = ⌊0.15·S/n⌋ + ⌊85·Σ⌊r_u/deg_u⌋/100⌋ — which sums
    * exactly in any order on any engine. Three synchronous iterations
    * over the mutually-capped co-order graph ([[coOrderEdges]]), each one
    * edge-join + groupBy-sum shuffling bare (node, long) pairs.
    *
    * Scale: the rank vector is one long per node; contributions ride the
    * (already capped) edge list with map-side partial sums; the chain of
    * 3 iterations executes as one lazy plan (each rank referenced once —
    * linear plan growth, unlike the multi-reference CC iteration that
    * needs checkpoints). Degrees are attached to the adjacency ONCE at
    * checkpoint time, so each iteration is exactly one (u)-join + one
    * (node)-aggregate of bare longs; and because the adjacency is
    * symmetric, every node has in-edges — the contribution aggregate
    * already covers the full node domain, so no per-iteration re-join
    * against the node list is needed (a directed variant would need the
    * dangling-node left join back). The oracle unrolls the same three
    * iterations in SQL — floor division on non-negative longs is
    * identical in both engines. */
  /** Integer-grid PageRank core over a canonical undirected edge list
    * (columns `u` < `v`): returns (node, r) with r in units of scale⁻¹. */
  def pageRankScaled(edges: DataFrame, iterations: Int,
                     scale: Long = 1000000000000L): DataFrame = {
    val adj = symmetrized(edges)
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    // (u, v, deg_u): the only per-iteration join input, materialized once,
    // HASH-PARTITIONED AND SORTED ON `u` before the cut (optimization r13,
    // guide §2.3 "shuffle fewer bytes"). Mechanism, measured not guessed:
    // the checkpoint's LogicalRDD leaf reports UnknownPartitioning under
    // AQE, so each iteration still plans an adjacency Exchange — but the
    // three are identical subtrees, ReuseExchange WRITES once and each
    // iteration only re-fetches; pre-sorting the checkpoint cut that
    // reused exchange's bytes 7.19 → 4.85 MB at sf0.1 (sorted runs
    // compress better) and the iteration sorts start from sorted runs.
    // A/B/A-profiled: 48.0 → 43.1 task-s, 6.7 → 5.5 s wall. The persist()
    // alternative (InMemoryRelation DOES keep partitioning, making
    // iterations exchange-free) measured far WORSE — 84 task-s — because
    // per-iteration InMemoryTableScan columnar→row re-reads cost more
    // than the shuffle fetches they replaced; rejected, see
    // OPTIMIZATION_r13.md. Partition count = the session's
    // shuffle-partition conf (scale-adaptive, not a local constant).
    val adjd = graft.Transients.track(adj.join(deg, "u")
      .repartition(col("u")).sortWithinPartitions("u")
      .transform(graft.Transients.cut))
    val n = adjd.select(col("u")).distinct().count()
    // an edge-free graph has no nodes to rank: empty frame, not /0 below
    if (n == 0L) return adjd.select(col("u").as("node"), lit(0L).as("r")).limit(0)
    val base = (scale * 15L / 100L) / n
    var rank = adjd.select(col("u").as("node")).distinct()
      .select(col("node"), lit(scale / n).as("r"))
    for (_ <- 1 to iterations) {
      rank = adjd
        .join(rank.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), expr("r div deg").as("c"))
        .groupBy("node")
        // width certificate: a node's inbound Σc is bounded by the TOTAL
        // conserved rank mass `scale` (= 1e6·n), so sum(c)·85 stays under
        // 2^63 while n ≤ ~1e11 nodes — beyond that, widen the rank grid
        // to DECIMAL(38,0) (both engines; the oracle replays this integer
        // recurrence verbatim)
        .agg((lit(base) + expr("(sum(c) * 85L) div 100L")).as("r"))
    }
    rank
  }

  /** WEIGHTED integer-grid PageRank over a canonical undirected edge list
    * (columns `u` < `v`, weight `w` > 0): the [[pageRankScaled]] sibling
    * where a neighbor's vote is proportional to the edge weight —
    * r'_v = ⌊0.15·S/n⌋ + ⌊85·Σ_u ⌊r_u·p_uv/10⁶⌋/100⌋ with per-edge
    * transition probabilities pre-quantized to ppm: p_uv =
    * ⌊10⁶·w_uv/W_u⌋. The ppm grid is the overflow guard that makes this
    * safe at ANY corpus scale: r_u ≤ 10¹² and p ≤ 10⁶, so r·p ≤ 10¹⁸ <
    * 2⁶³ no matter how large the raw weights grow (a direct r·w/W form
    * would overflow once W_u passes ~9·10⁶). Like the unweighted core:
    * probabilities attach to the adjacency ONCE at checkpoint time, each
    * iteration is one join + one integer aggregate, all order-free. */
  def pageRankWeightedScaled(edges: DataFrame, iterations: Int,
                             scale: Long = 1000000000000L): DataFrame = {
    val adj = symmetrized(edges, "u", "v", "w")
    val wt = adj.groupBy("u").agg(sum("w").as("wtot"))
    // hash-partitioned + sorted on `u` before the cut, for the measured
    // reason on [[pageRankScaled]]'s adjd: the iterations' reused
    // adjacency exchange fetches fewer (sorted-run-compressed) bytes and
    // the per-iteration sorts start from sorted runs
    val adjp = graft.Transients.track(adj.join(wt, "u")
      .select(col("u"), col("v"), expr("(1000000 * w) div wtot").as("p"))
      .repartition(col("u")).sortWithinPartitions("u")
      .transform(graft.Transients.cut))
    val n = adjp.select(col("u")).distinct().count()
    // an edge-free graph has no nodes to rank: empty frame, not /0 below
    if (n == 0L) return adjp.select(col("u").as("node"), lit(0L).as("r")).limit(0)
    val base = (scale * 15L / 100L) / n
    var rank = adjp.select(col("u").as("node")).distinct()
      .select(col("node"), lit(scale / n).as("r"))
    for (_ <- 1 to iterations) {
      rank = adjp
        .join(rank.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), expr("(r * p) div 1000000").as("c"))
        .groupBy("node")
        .agg((lit(base) + expr("(sum(c) * 85L) div 100L")).as("r"))
    }
    rank
  }

  def q105PageRank(s: SparkSession, d: String,
                   iterations: Int = 3): DataFrame =
    pageRankScaled(cachedCoOrderEdges(s, d), iterations)
      .select(col("node"), col("r").as("rank_scaled"),
        (col("r").cast("double") / 1000000000000L).as("rank"))
      .orderBy(col("rank_scaled").desc, col("node"))
      .limit(25)

  // ---------------------------------------------------------------- q112
  /** COMMUNITY DETECTION via weighted label propagation — the coarser,
    * modularity-seeking sibling of [[connectedComponents]] (CC answers
    * "reachable at all?"; LPA answers "which densely-linked cluster?").
    * Synchronous rounds on the mutually-capped co-order graph: every node
    * adopts the label with the highest incident edge-weight sum among its
    * neighbors, ties broken by the SMALLER label id — a deterministic
    * total order, which is what makes the whole operator engine-exact
    * (classic async LPA with random tie-breaks is unreproducible by
    * design; fixing sweep order + tie order trades a little convergence
    * speed for a bit-stable result). Labels start as node ids; two
    * synchronous rounds are unrolled — at 100 TB each round is one
    * edge-join + (node, label) weight aggregation + one argmax window
    * over per-(node,label) sums, all shuffling bare longs, and the round
    * count is the explicit cost knob (LPA quality saturates within a few
    * rounds on weighted graphs).
    *
    * The oracle unrolls the same two rounds in SQL — integer sums and
    * (sum DESC, label ASC) ranking only, no floats anywhere. */
  def labelPropagate(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the union-collapse aliasing guard lives in [[symmetrized]] — this
    // site is where the "key not found" constraint-rewrite crash was
    // first hit (checkpointed LogicalRDD input)
    val adj = graft.Transients.track(
      symmetrized(edges, "u", "v", "w").transform(graft.Transients.cut))
    var labels = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val byVote = Window.partitionBy("node")
      .orderBy(col("wsum").desc, col("label"))
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u").as("node"), col("label"))
        .agg(sum(col("w")).as("wsum"))
        .withColumn("rk", row_number().over(byVote))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
    }
    labels
  }

  /** q112: two-round weighted LPA over the co-order graph; communities of
    * size >= 3 reported with size, total internal weight rank basis and
    * deterministic ordering. */
  def q112LabelCommunities(s: SparkSession, d: String): DataFrame = {
    val labels = labelPropagate(cachedCoOrderEdges(s, d), rounds = 2)
    labels.groupBy("label")
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_member"))
      .filter(col("n_members") >= 3)
      .orderBy(col("n_members").desc, col("label"))
      .limit(25)
  }

  // ------------------------------------------------------------------------
  // ---------------------------------------------------------------- q136
  /** DEGREE DISTRIBUTION of the co-order graph — the first profile anyone
    * runs on a graph before picking algorithms (a heavy tail says "cap or
    * salt the hot nodes"; this engine's mutual top-64 cap is visible here
    * as the hard right edge of the histogram). Nodes bucket by
    * floor(log2(degree)), computed EXACTLY as length(bin(deg)) − 1 —
    * integer bit-length, no float log whose engine rounding could flip a
    * power-of-two boundary bucket.
    *
    * Scale: degrees are one aggregation over the (cached) edge list; the
    * histogram is |buckets|-sized. Consumer of the session edge memo, same
    * as q99/q112. Exact DuckDB oracle over the shared capped-edge CTE. */
  def q136DegreeHistogram(s: SparkSession, d: String): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .select(col("node"), col("deg"),
        (length(bin(col("deg"))) - 1).cast("int").as("bucket_log2"))
      .groupBy("bucket_log2")
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"), sum(col("deg")).as("sum_deg"))
      .orderBy("bucket_log2")
  }

  // ---------------------------------------------------------------- q160
  /** LOCAL CLUSTERING COEFFICIENT — per node of the mutually-capped
    * co-order graph: how close its neighborhood is to a clique,
    * cc(u) = 2·tri(u) / (deg(u)·(deg(u)−1)). The community-structure
    * companion to q99's triangle enumeration: q99 ranks the heaviest
    * triangles, this attributes EVERY triangle back to its three corners
    * and normalizes by the wedge count.
    *
    * Shape: the triangle join is exactly q99's id-oriented wedge probe
    * over the shared session edge memo (bounded at n·C(cap,2) wedges by
    * the mutual-cap pruning), each triangle then explodes into its three
    * corners — a 3× fan-out of an already-small triangle set — and the
    * counts join back to the degree table. Integer counts end to end; the
    * one IEEE division runs on exact sub-2^53 operands, so DuckDB lands
    * identical doubles. deg-1 nodes report NULL (no wedge exists), never
    * 0/0. */
  def q160ClusteringCoeff(s: SparkSession, d: String): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    val adj = symmetrized(e)
    val deg = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(e.as("e3"),
        col("e1.v") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tn = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(tn, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          (lit(2L) * col("n_tri")).cast("double")
            / (col("deg") * (col("deg") - 1)).cast("double")))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- q161
  /** ITEM-ITEM SIMILARITY (association ranking) — the "customers also
    * bought" primitive: co-order edge weights normalized to the Ochiai /
    * cosine coefficient w/√(n_u·n_v) (w = orders containing both, n_x =
    * orders containing x), top-k neighbors per item. Raw co-counts rank
    * popular items everywhere; the support normalization is what turns
    * co-occurrence into similarity.
    *
    * Shape: rides the shared capped edge memo (mutual-top-64 pruning is
    * the candidate bound — at 100 TB the ranking never sees the raw m²
    * co-occurrence blowup), joins the per-item support table twice by
    * key, and ranks through the NATIVE TopKPerGroup operator (bounded
    * per-group heaps, map-side partial pass) rather than a window sort.
    * Exactness: w, n_u, n_v are exact longs; sim is division-by-sqrt on
    * exact sub-2^53 operands — two correctly-rounded IEEE ops both
    * engines evaluate identically, and the (sim DESC, v) rank tiebreak
    * pins the order. */
  def q161ItemSimilarity(s: SparkSession, d: String, topK: Int = 10): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    val op = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val support = op.groupBy(col("p")).agg(count(lit(1)).as("n_ord"))
    // symmetrize via ONE generator pass instead of a Union: the memoized
    // edge relation carries its u < v constraint, and Union's constraint
    // rewrite crashes on it under the swapped projection (key-not-found
    // on the dropped exprId — a Spark constraint-propagation corner);
    // inline(array(struct…)) emits both orientations with no Union node
    // and scans the edge memo once
    val sym = e.select(inline(array(
      struct(col("u"), col("v"), col("w")),
      struct(col("v").as("u"), col("u").as("v"), col("w")))))
    val scored = sym
      .join(support.select(col("p").as("u"), col("n_ord").as("nu")), Seq("u"))
      .join(support.select(col("p").as("v"), col("n_ord").as("nv")), Seq("v"))
      .withColumn("sim",
        col("w").cast("double") / sqrt((col("nu") * col("nv")).cast("double")))
    graft.plans.TopK.perGroup(
      scored.select("u", "v", "w", "nu", "nv", "sim"),
      groupCols = Seq("u"),
      orderBy = Seq(("sim", false), ("v", true)),
      k = topK, rankName = "rk")
      .orderBy("u", "rk")
  }

  // ---------------------------------------------------------------- q174
  /** HITS hubs-and-authorities as a DIVISION-FREE integer certificate —
    * the bipartite-importance sibling of q105's PageRank, over the
    * (user → event_type) interaction graph with edge weight = interaction
    * count. Classic HITS renormalizes each half-step with an L2 divide;
    * this operator instead seeds every hub at 1 and runs the two
    * unnormalized half-step pairs
    *   auth₁ = Wᵀ·1,  hub₁ = W·auth₁,  auth₂ = Wᵀ·hub₁
    * emitting raw auth₁/auth₂ — the same RANKING as normalized HITS
    * (normalization is a positive scalar per step) with zero division, so
    * the result is engine-exact (the q167 certificate discipline applied
    * to an iterative graph kernel). Magnitude: auth₂ ≤ (total rows)³ —
    * 1e12 rows → 1e36, inside DECIMAL(38,0) with the sums cast before
    * multiplication.
    *
    * Scale: the edge list is a (user, type)-grained groupBy of the scan
    * (map-side combined); auth relations are |types| rows and ride
    * broadcast joins; the only row-scale shuffles are the two groupBys on
    * bare ids. The edge subtree feeds three consumers, so it
    * checkpoints once (the q147 discipline). */
  def q174HitsScores(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val edges = graft.Transients.track(Tables.load(s, d, "events")
      .groupBy(col("user_id").as("u"), col("event_type").as("item"))
      .agg(count(lit(1)).as("w")).transform(graft.Transients.cut))
    val auth1 = edges.groupBy("item")
      .agg(sum(col("w").cast(dec38)).as("auth1"))
    val hub1 = edges.join(broadcast(auth1), "item")
      .groupBy("u").agg(sum(col("w").cast(dec38) * col("auth1")).as("hub1"))
    val auth2 = edges.join(hub1, "u")
      .groupBy("item").agg(sum(col("w").cast(dec38) * col("hub1")).as("auth2"))
    auth1.join(auth2, "item")
      .select(col("item").as("event_type"), col("auth1"), col("auth2"))
      .orderBy("event_type")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q175
  /** Multi-source BFS HOP DISTANCES — the traversal primitive the graph
    * family lacked (components, ranks and triangles all measure structure;
    * this measures REACH): from the `nSeeds` highest-degree hubs of the
    * mutually-capped co-order graph, the minimum hop count to every node
    * within `maxHops`, rolled up per distance ring (plus a `-1` ring for
    * nodes the horizon never reaches). The "how far is the catalog from
    * its hubs" / blast-radius audit.
    *
    * Shape is textbook synchronous frontier BFS: each round joins the
    * CURRENT frontier (bare node ids) against the adjacency, dedups, and
    * anti-joins the visited set — per-round cost is one id-only shuffle
    * bounded by the capped edge list (n·cap), never by paths (the visited
    * anti-join is what kills the exponential path blowup a naive
    * recursive expansion would hit). Frontiers localCheckpoint per round
    * (registered in [[graft.Transients]]) because round k+1's anti-join
    * and the final union both re-reference them — the multi-reference
    * iterative shape that needs checkpoints (q66's lesson), at ≤ n rows
    * per round. Seeds are deterministic (degree DESC, id tiebreak), so
    * the whole result carries an exact DuckDB oracle (unrolled frontier
    * CTEs over the shared capped-edges fragment). */
  def q175BfsHops(s: SparkSession, d: String,
                  maxHops: Int = 3, nSeeds: Int = 8): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    val adj = symmetrized(e)
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    val seeds = deg.orderBy(col("deg").desc, col("u"))
      .limit(nSeeds).select(col("u").as("node"))
    var visited = graft.Transients.track(
      seeds.withColumn("dist", lit(0)).transform(graft.Transients.cut))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = graft.Transients.track(
        frontier.join(adj, frontier("node") === adj("u"))
          .select(adj("v").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(h))
          .transform(graft.Transients.cut))
      visited = visited.union(next)
      frontier = next
    }
    val unreached = deg.select(col("u").as("node"))
      .join(visited, Seq("node"), "left_anti")
      .withColumn("dist", lit(-1))
    visited.union(unreached)
      .groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
        max("node").as("max_node"), sum("node").as("sum_node"))
      .orderBy("dist")
  }

  // ---------------------------------------------------------------- q183
  /** PERSONALIZED PAGERANK from the hub seed set — "importance relative
    * to THESE nodes", the related-items / neighborhood-relevance ranking
    * (global q105 answers "important overall"; this answers "important
    * NEAR the hubs", q175's reachability question upgraded from hop count
    * to mass). Same exact-integer discipline as q105: ranks on the 1e-12
    * grid, every update an integer multiply / floor-divide, so the
    * fixpoint iteration is order-free and engine-portable —
    *
    *   r' = [node ∈ seeds]·⌊15·S/(100·k)⌋ + ⌊85·Σ⌊r_u/deg_u⌋/100⌋
    *
    * with the teleport mass restricted to the k top-degree seeds (q175's
    * deterministic seed rule). The rank relation stays SPARSE: it starts
    * at k rows and only ever covers nodes the mass has reached — on a
    * 100 TB graph the 3-iteration relation is the seeds' 3-hop
    * neighborhood, not the node set. Each iteration is one rank⋈adjacency
    * join + ONE bare-(node, long) aggregate — the k teleport rows ride
    * the SAME aggregate as tagged zero-contribution rows (a union of k
    * map-side rows), because no join can stitch them cheaply: Spark
    * cannot broadcast either side of a full-outer join, so a full-outer
    * stitch would sort-merge the whole rank relation against 8 rows
    * every round (caught by plan review; the hint is silently dropped
    * with a HintErrorLogger warning). The degree-annotated adjacency
    * checkpoints once for its three consumers. k reaches the driver as
    * a single bounded count (like the IVF centroids — documented,
    * O(nSeeds)). */
  def q183PersonalizedPagerank(s: SparkSession, d: String,
                               iterations: Int = 3, nSeeds: Int = 8,
                               scale: Long = 1000000000000L): DataFrame = {
    val e = cachedCoOrderEdges(s, d)
    val adj0 = symmetrized(e)
    val deg = adj0.groupBy("u").agg(count(lit(1)).as("deg"))
    val adj = graft.Transients.track(
      adj0.join(deg, "u").transform(graft.Transients.cut))
    val seeds = deg.orderBy(col("deg").desc, col("u"))
      .limit(nSeeds).select(col("u").as("node"))
    val k = seeds.count()
    // an edge-free graph seeds nothing: empty frame, not /0 below
    if (k == 0L) return seeds.select(col("node"),
      lit(0L).as("ppr_scaled"), lit(0.0).as("ppr")).limit(0)
    val tele = (15L * scale) / (100L * k)
    val teleRows = seeds.select(col("node"), lit(0L).as("c"),
      lit(tele).as("tp"))
    var r = seeds.withColumn("r", lit(scale / k))
    for (_ <- 1 to iterations) {
      r = adj.join(r, adj("u") === r("node"))
        .select(col("v").as("node"), expr("r div deg").as("c"),
          lit(0L).as("tp"))
        .unionAll(teleRows)
        .groupBy("node")
        .agg((expr("(85 * sum(c)) div 100") + max(col("tp"))).as("r"))
    }
    r.orderBy(col("r").desc, col("node")).limit(25)
      .select(col("node"), col("r").as("ppr_scaled"),
        (col("r").cast("double") / scale).as("ppr"))
  }

  // ---------------------------------------------------------------- q191
  /** K-CORE PEEL — the density-decomposition member of the graph family
    * (triangles count closure, LPA labels communities; the k-core is the
    * standard "dense backbone" extraction — Matula & Beck's peeling,
    * bounded here to a fixed round count so the result is a deterministic
    * certificate rather than an open-ended fixpoint). Each round drops
    * every node whose CURRENT degree is < k, then re-derives degrees —
    * the synchronous peel. Output is one certificate row per round
    * (surviving nodes/edges + min/max/sum node-id identity), which is
    * what a scheduler needs to size the next stage; convergence is
    * data-dependent and the certificate rows EXPOSE it (identical
    * consecutive rows = fixpoint reached), and full coreness is the same
    * per-round plan looped to fixpoint with the CC operator's checkpoint
    * cadence.
    *
    * Scale: one degree aggregate (node-keyed shuffle) + two semi joins
    * per round over an edge relation that only SHRINKS; per-round
    * localCheckpoint cuts the iterative lineage exactly like
    * connectedComponents/BFS. Nothing here materializes anything larger
    * than the capped edge memo (≤ n·cap rows by construction). */
  def q191KcorePeel(s: SparkSession, d: String, k: Int = 32,
      rounds: Int = 3): DataFrame = {
    var e = graft.Transients.track(
      cachedCoOrderEdges(s, d).select("u", "v").transform(graft.Transients.cut))
    def cert(round: Int, edges: DataFrame): DataFrame = {
      val nodes = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n"))).distinct()
      nodes.agg(count(lit(1)).as("n_nodes"), min("n").as("min_node"),
          max("n").as("max_node"), sum("n").as("sum_node"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
        .select(lit(round).as("round"), col("n_nodes"), col("n_edges"),
          col("min_node"), col("max_node"), col("sum_node"))
    }
    var out = cert(0, e)
    for (r <- 1 to rounds) {
      val adj = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val keep = adj.groupBy("u").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("u").as("kn"))
      e = graft.Transients.track(
        e.join(keep, col("u") === col("kn"), "left_semi")
          .join(keep, col("v") === col("kn"), "left_semi")
          .transform(graft.Transients.cut))
      out = out.unionAll(cert(r, e))
    }
    out.orderBy("round")
  }

  // ---------------------------------------------------------------- q223
  /** ADAMIC-ADAR LINK PREDICTION — score the NON-edges of the co-order
    * graph by Σ_z 1/ln(deg z) over common neighbors z: the classic
    * "products frequently bought alongside the same intermediaries but
    * never yet together" recommender signal (common-neighbor count rides
    * along as the unweighted baseline). Completes the graph family's
    * missing-link face — everything else (triangles, PageRank, k-core,
    * communities) describes edges that exist.
    *
    * Exactness: the per-neighbor weight 1/ln(deg) is one libm call on a
    * small-integer argument (deg ≤ 2·cap), snapped to the 1e-7 decimal
    * grid — then carried as a LONG count of 1e-7 units, so the per-pair
    * sum is an integer sum: order-free and exact, never dependent on FP
    * accumulation order (the q90 round-then-sum discipline; units→value
    * at the end is one exact decimal multiply by 10^-7, so the emitted
    * double is bit-identical to the decimal-sum formulation the oracle
    * uses). z with deg < 2 cannot be a common neighbor, so 1/ln(1)
    * never evaluates.
    *
    * Scale: wedges enumerate per-z neighbor pairs — bounded n·C(cap,2)
    * by the mutual-cap basis, the same bound that keeps q99's triangle
    * join alive; the weight join is node-keyed, the non-edge filter is a
    * pair-keyed LEFT ANTI against the n·cap-bounded edge list, and the
    * final top-N is TakeOrderedAndProject (no global sort materializes).
    * The wedge aggregate is the dominant cost (~16M groups from ~19M
    * wedges at sf0.1 — partial agg buys almost nothing at this group/row
    * ratio), so the hot path minimizes bytes-per-group: when every node
    * id fits in 32 bits (probed with one sub-second max() over the
    * checkpointed edge memo), the pair key packs into ONE long and the
    * aggregate is (long key → long sum, long count); wider id domains
    * (a 100 TB corpus can exceed 2^32 parts) keep the two-column key —
    * same exact result, measured r8 at local[32]/sf0.1: 5.6 s decimal →
    * 4.3 s long-units → 3.2 s packed. */
  def q223AdamicAdar(s: SparkSession, d: String, topN: Int = 25): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = cachedCoOrderEdges(s, d)
    val adj = symmetrized(e)
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    val invln = deg.filter(col("deg") >= 2)
      .select(col("u").as("z"),
        (round(lit(1.0).cast("double") / log(col("deg").cast("double")), 7)
          .cast(DecimalType(18, 7)) * lit(10000000L)).cast("long").as("ilu"))
    val nbr = adj.select(col("u").as("z"), col("v").as("n"))
    // attach the center's weight BEFORE the wedge self-join: the weight
    // join is node-sized there, wedge-sized after (measured 8.2 s → the
    // post-wedge join re-shuffled every enumerated pair against invln)
    val nbrIl = nbr.join(invln, "z")
    // units → value: one exact decimal multiply (20+7+1 = 28 ≤ 38 digits,
    // so Spark keeps scale 7 — a wider cast would silently drop to scale
    // 6 under the precision cap and break hash-exactness)
    val unitsToScore =
      (col("aa_u").cast(DecimalType(20, 0)) *
        lit(new java.math.BigDecimal("0.0000001"))).cast("double")
    val probe = e.agg(max(greatest(col("u"), col("v"))),
      min(least(col("u"), col("v"))), count(lit(1))).first()
    // the pack needs BOTH bounds, and the ceiling is 2^31, not 2^32: the
    // high half lands on the signed long's sign bit, so an id in
    // [2^31, 2^32) would wrap pk negative — corrupting both the unpacked
    // x and the pk tiebreak order as silently as a negative id would.
    // An empty memo probes (null, null, 0): no packing, and the
    // two-column branch flows an empty frame through unchanged.
    val idsFit32 = !probe.isNullAt(0) &&
      probe.getLong(0) < (1L << 31) && probe.getLong(1) >= 0L
    // broadcast the anti side only while it is actually small — the edge
    // memo is n·cap rows and outgrows a broadcast long before the packed
    // key overflows; past the threshold the anti join reuses the (pk)
    // hash partitioning the aggregate just produced (exchange-free SMJ)
    val bcastAnti = probe.getLong(2) < 4_000_000L
    if (idsFit32) {
      val wedges = nbrIl.as("a").join(nbr.as("b"),
          col("a.z") === col("b.z") && col("a.n") < col("b.n"))
        .select(col("a.ilu").as("ilu"),
          (shiftleft(col("a.n"), 32) + col("b.n")).as("pk"))
      // pk order ≡ (x, y) lexicographic for non-negative ids < 2^32
      wedges.groupBy("pk")
        .agg(count(lit(1)).as("common_n"), sum(col("ilu")).as("aa_u"))
        .join({
            val ep = e.select((shiftleft(col("u"), 32) + col("v")).as("pk"))
            if (bcastAnti) broadcast(ep) else ep
          }, Seq("pk"), "left_anti")
        .orderBy(col("aa_u").desc, col("pk"))
        .limit(topN)
        .select(shiftright(col("pk"), 32).as("x"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("y"), col("common_n"),
          unitsToScore.as("aa_score"))
    } else {
      val wedges = nbrIl.as("a").join(nbr.as("b"),
          col("a.z") === col("b.z") && col("a.n") < col("b.n"))
        .select(col("a.ilu").as("ilu"), col("a.n").as("x"), col("b.n").as("y"))
      wedges.groupBy("x", "y")
        .agg(count(lit(1)).as("common_n"), sum(col("ilu")).as("aa_u"))
        // same size-gated broadcast as the packed branch: a wide-id corpus
        // with a small edge memo should not pay a shuffle anti-join
        .join({
            val ep = e.select(col("u").as("x"), col("v").as("y"))
            if (bcastAnti) broadcast(ep) else ep
          }, Seq("x", "y"), "left_anti")
        .orderBy(col("aa_u").desc, col("x"), col("y"))
        .limit(topN)
        .select(col("x"), col("y"), col("common_n"),
          unitsToScore.as("aa_score"))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_adamic_adar" -> ((s: SparkSession, d: String) => q223AdamicAdar(s, d)),
    "q191_kcore_peel" -> ((s: SparkSession, d: String) => q191KcorePeel(s, d)),
    "q183_personalized_pagerank" ->
      ((s: SparkSession, d: String) => q183PersonalizedPagerank(s, d)),
    "q175_bfs_hops" -> ((s: SparkSession, d: String) => q175BfsHops(s, d)),
    "q174_hits_scores" -> (q174HitsScores _),
    "q161_item_similarity" -> ((s: SparkSession, d: String) => q161ItemSimilarity(s, d)),
    "q160_clustering_coeff" -> (q160ClusteringCoeff _),
    "q112_label_communities" -> (q112LabelCommunities _),
    "q66_dedup_components" -> (q66DedupComponents _),
    "q148_cluster_survivor" -> (q148ClusterSurvivor _),
    "q150_entity_clusters" -> (q150EntityClusters _),
    "q99_triangle_cooccur" -> (q99TriangleCooccur _),
    "q136_degree_histogram" -> (q136DegreeHistogram _),
    "q105_pagerank" -> ((s: SparkSession, d: String) => q105PageRank(s, d)))

  /** Exact oracle: the same thresholded pair basis as q38, closed with a
    * recursive transitive-closure CTE, min-labeled per doc. */
  /** Shared oracle fragment: the mutually-capped co-order graph —
    * one definition for the q99 and q105 oracles, mirroring
    * [[coOrderEdges]]. */
  /** `hint` = "" (planner default) or "MATERIALIZED " — q191's unrolled
    * peel references the capped relation transitively from every round,
    * where DuckDB's inline-by-default CTE expansion goes exponential;
    * the explicit hint pins one evaluation (measured 0.1 s vs >2 min). */
  private def duckCappedEdgesHint(hint: String): String =
    s"""op AS $hint(SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |pw AS (
       | SELECT a.p AS u, b.p AS v, count(*) AS w
       | FROM op a JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
       |adjw AS (SELECT u, v, w FROM pw UNION ALL SELECT v, u, w FROM pw),
       |rk AS $hint(
       | SELECT u, v, w,
       |  row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS r
       | FROM adjw),
       |capped AS $hint(
       | SELECT x.u, x.v, x.w
       | FROM rk x JOIN rk y ON x.u = y.v AND x.v = y.u
       | WHERE x.u < x.v AND x.r <= 64 AND y.r <= 64)""".stripMargin

  /** Three unrolled integer-PageRank iterations (the q105 twin). */
  /** Unrolled WEIGHTED PageRank iterations (the [[pageRankWeightedScaled]]
    * twin) — expects CTEs `a(u, v, p)` (ppm transition probs), `nodes(u)`,
    * `nn(n)`, `r0(node, r)`; ends in `r3`. Shared by the q206 oracle. */
  private[ops] val duckPageRankWeightedIters: String = (1 to 3).map { i =>
    s"""c$i AS (
       | SELECT a.v AS node, sum((r${i - 1}.r * a.p) // 1000000) AS inr
       | FROM a JOIN r${i - 1} ON a.u = r${i - 1}.node GROUP BY a.v),
       |r$i AS (
       | SELECT nodes.u AS node,
       |  150000000000 // n + (coalesce(c$i.inr, 0) * 85) // 100 AS r
       | FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.u = c$i.node)""".stripMargin
  }.mkString(",\n")

  private[ops] val duckPageRankIters: String = (1 to 3).map { i =>
    s"""c$i AS (
       | SELECT a.v AS node, sum(r${i - 1}.r // deg.deg) AS inr
       | FROM a JOIN deg ON a.u = deg.u JOIN r${i - 1} ON a.u = r${i - 1}.node
       | GROUP BY a.v),
       |r$i AS (
       | SELECT deg.u AS node,
       |  150000000000 // n + (coalesce(c$i.inr, 0) * 85) // 100 AS r
       | FROM deg CROSS JOIN nn LEFT JOIN c$i ON deg.u = c$i.node)""".stripMargin
  }.mkString(",\n")

  /** Two unrolled synchronous LPA rounds (the q112 twin). */
  private val duckLpaRounds: String = (1 to 2).map { i =>
    s"""v$i AS (
       | SELECT a.u AS node, l${i - 1}.label, CAST(sum(a.w) AS BIGINT) AS wsum
       | FROM a JOIN l${i - 1} ON a.v = l${i - 1}.node GROUP BY 1, 2),
       |l$i AS (
       | SELECT node, label FROM (
       |  SELECT node, label,
       |   row_number() OVER (PARTITION BY node ORDER BY wsum DESC, label) AS rk
       |  FROM v$i) WHERE rk = 1)""".stripMargin
  }.mkString(",\n")

  /** Unrolled BFS frontiers (the q175 twin): f_k = neighbors of f_{k-1}
    * not seen in any earlier ring. */
  private val duckBfsRings: String = (1 to 3).map { i =>
    val seen = (0 until i).map(j => s"SELECT node FROM d$j").mkString(" UNION ALL ")
    s"""d$i AS (
       | SELECT DISTINCT a.v AS node, $i AS dist
       | FROM d${i - 1} JOIN a ON a.u = d${i - 1}.node
       | WHERE a.v NOT IN ($seen))""".stripMargin
  }.mkString(",\n")

  /** Three unrolled sparse PPR iterations (the q183 twin): contributions
    * from the previous rank relation, full-outer-stitched against the
    * seed teleport side. */
  private val duckPprIters: String = (1 to 3).map { i =>
    s"""c$i AS (
       | SELECT a.v AS node, sum(r${i - 1}.r // deg.deg) AS inr
       | FROM a JOIN deg ON a.u = deg.u JOIN r${i - 1} ON a.u = r${i - 1}.node
       | GROUP BY a.v),
       |r$i AS (
       | SELECT coalesce(c$i.node, s0.node) AS node,
       |  coalesce((85 * c$i.inr) // 100, 0) + CASE WHEN s0.node IS NULL
       |    THEN 0 ELSE (15 * 1000000000000) // (100 * kk.k) END AS r
       | FROM c$i FULL JOIN s0 ON c$i.node = s0.node CROSS JOIN kk)""".stripMargin
  }.mkString(",\n")

  /** Unrolled synchronous peel rounds (the q191 twin): per round, keep =
    * nodes at degree ≥ k, next edge set = both-endpoints-kept edges. */
  private def duckPeelRounds(k: Int, rounds: Int): String =
    (0 until rounds).map { i =>
      s"""a$i AS (SELECT u, v FROM e$i UNION ALL SELECT v, u FROM e$i),
         |deg$i AS (SELECT u, count(*) AS dg FROM a$i GROUP BY u),
         |keep$i AS MATERIALIZED (SELECT u FROM deg$i WHERE dg >= $k),
         |e${i + 1} AS MATERIALIZED (
         | SELECT e.u, e.v FROM e$i e
         | JOIN keep$i x ON e.u = x.u JOIN keep$i y ON e.v = y.u)""".stripMargin
    }.mkString(",\n")

  private def duckPeelCert(round: Int): String =
    s"""SELECT $round AS round, count(DISTINCT n) AS n_nodes,
       | (SELECT count(*) FROM e$round) AS n_edges,
       | min(n) AS min_node, max(n) AS max_node,
       | CAST(sum(n) AS BIGINT) AS sum_node
       |FROM (SELECT u AS n FROM e$round UNION SELECT v FROM e$round)""".stripMargin

  val oracle: Map[String, String] = Map(
    // MATERIALIZED hints: the peel references each round's edge set from
    // the next round AND the certificate — DuckDB's inline-by-default
    // expansion re-evaluates the capped-graph subtree exponentially
    "q191_kcore_peel" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |e0 AS MATERIALIZED (SELECT u, v FROM capped),
         |${duckPeelRounds(32, 3)}
         |SELECT * FROM (
         | ${(0 to 3).map(duckPeelCert).mkString("\n UNION ALL\n ")}
         |) ORDER BY round""".stripMargin,
    "q183_personalized_pagerank" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u, v FROM capped UNION ALL SELECT v, u FROM capped),
         |deg AS (SELECT u, count(*) AS deg FROM a GROUP BY u),
         |s0 AS (SELECT u AS node FROM deg ORDER BY deg DESC, u LIMIT 8),
         |kk AS (SELECT count(*) AS k FROM s0),
         |r0 AS (SELECT node, 1000000000000 // k AS r FROM s0 CROSS JOIN kk),
         |$duckPprIters
         |SELECT node, CAST(r AS BIGINT) AS ppr_scaled,
         | CAST(r AS DOUBLE) / 1000000000000 AS ppr
         |FROM r3 ORDER BY ppr_scaled DESC, node LIMIT 25""".stripMargin,
    "q175_bfs_hops" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u, v FROM capped UNION ALL SELECT v, u FROM capped),
         |deg AS (SELECT u, count(*) AS deg FROM a GROUP BY u),
         |d0 AS (
         | SELECT u AS node, 0 AS dist FROM deg ORDER BY deg DESC, u LIMIT 8),
         |$duckBfsRings,
         |vis AS (
         | SELECT * FROM d0 UNION ALL SELECT * FROM d1
         | UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3),
         |rings AS (
         | SELECT * FROM vis
         | UNION ALL
         | SELECT u AS node, -1 AS dist FROM deg
         | WHERE u NOT IN (SELECT node FROM vis))
         |SELECT dist, count(*) AS n_nodes,
         | min(node) AS min_node, max(node) AS max_node,
         | CAST(sum(node) AS BIGINT) AS sum_node
         |FROM rings GROUP BY dist ORDER BY dist""".stripMargin,
    // same unnormalized half-steps in HUGEINT, cast to DECIMAL(38,0)
    "q174_hits_scores" ->
      """WITH e AS (
        | SELECT user_id AS u, event_type AS item, count(*) AS w
        | FROM events GROUP BY 1, 2),
        |a1 AS (SELECT item,
        |  CAST(sum(CAST(w AS HUGEINT)) AS DECIMAL(38,0)) AS auth1
        | FROM e GROUP BY item),
        |h1 AS (SELECT u,
        |  CAST(sum(CAST(e.w AS HUGEINT) * CAST(a1.auth1 AS HUGEINT))
        |    AS DECIMAL(38,0)) AS hub1
        | FROM e JOIN a1 USING (item) GROUP BY u),
        |a2 AS (SELECT item,
        |  CAST(sum(CAST(e.w AS HUGEINT) * CAST(h1.hub1 AS HUGEINT))
        |    AS DECIMAL(38,0)) AS auth2
        | FROM e JOIN h1 USING (u) GROUP BY item)
        |SELECT item AS event_type, CAST(auth1 AS VARCHAR) AS auth1,
        | CAST(auth2 AS VARCHAR) AS auth2
        |FROM a1 JOIN a2 USING (item) ORDER BY event_type""".stripMargin,
    "q136_degree_histogram" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u AS node FROM capped UNION ALL SELECT v FROM capped),
         |deg AS (SELECT node, count(*) AS deg FROM a GROUP BY node),
         |b AS (
         | SELECT deg, CAST(length(printf('%b', deg)) - 1 AS INT) AS bucket_log2
         | FROM deg)
         |SELECT bucket_log2, count(*) AS n_nodes,
         | CAST(min(deg) AS BIGINT) AS min_deg, CAST(max(deg) AS BIGINT) AS max_deg,
         | CAST(sum(deg) AS BIGINT) AS sum_deg
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q112_label_communities" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u, v, w FROM capped UNION ALL SELECT v, u, w FROM capped),
         |l0 AS (SELECT DISTINCT u AS node, u AS label FROM a),
         |$duckLpaRounds
         |SELECT label, count(*) AS n_members, min(node) AS min_member
         |FROM l2 GROUP BY label HAVING count(*) >= 3
         |ORDER BY n_members DESC, label LIMIT 25""".stripMargin,
    "q161_item_similarity" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |support AS (
         | SELECT p, CAST(count(*) AS BIGINT) AS n_ord FROM op GROUP BY 1),
         |sym AS (
         | SELECT u, v, w FROM capped UNION ALL SELECT v, u, w FROM capped),
         |scored AS (
         | SELECT sym.u, sym.v, CAST(sym.w AS BIGINT) AS w,
         |  su.n_ord AS nu, sv.n_ord AS nv,
         |  CAST(sym.w AS DOUBLE) / sqrt(CAST(su.n_ord * sv.n_ord AS DOUBLE))
         |   AS sim
         | FROM sym JOIN support su ON sym.u = su.p
         |          JOIN support sv ON sym.v = sv.p),
         |ranked AS (
         | SELECT *, CAST(row_number() OVER (PARTITION BY u
         |   ORDER BY sim DESC, v) AS INT) AS rk
         | FROM scored)
         |SELECT u, v, w, nu, nv, sim, rk
         |FROM ranked WHERE rk <= 10 ORDER BY u, rk""".stripMargin,
    "q160_clustering_coeff" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |tri AS (
         | SELECT e1.u AS a, e1.v AS b, e2.v AS c
         | FROM capped e1
         | JOIN capped e2 ON e1.u = e2.u AND e1.v < e2.v
         | JOIN capped e3 ON e3.u = e1.v AND e3.v = e2.v),
         |tn AS (
         | SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
         |  SELECT a AS node FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         | GROUP BY 1),
         |dg AS (
         | SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT u AS node FROM capped UNION ALL SELECT v FROM capped)
         | GROUP BY 1)
         |SELECT dg.node, dg.deg,
         | coalesce(tn.n_tri, 0) AS n_tri,
         | CASE WHEN dg.deg >= 2
         |  THEN CAST(2 * coalesce(tn.n_tri, 0) AS DOUBLE)
         |    / CAST(dg.deg * (dg.deg - 1) AS DOUBLE) END AS clustering
         |FROM dg LEFT JOIN tn USING (node)
         |ORDER BY node""".stripMargin,
    // 1/ln(deg) snapped to the 1e-7 decimal grid in both engines, summed
    // in DECIMAL (order-free); non-edges via NOT EXISTS against capped
    "q223_adamic_adar" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u, v FROM capped UNION ALL SELECT v, u FROM capped),
         |dg AS (SELECT u AS z, CAST(count(*) AS BIGINT) AS deg
         |       FROM a GROUP BY 1),
         |il AS (
         | SELECT z, CAST(round(CAST(1 AS DOUBLE) / ln(CAST(deg AS DOUBLE)),
         |   7) AS DECIMAL(18,7)) AS ilz
         | FROM dg WHERE deg >= 2),
         |wd AS (
         | SELECT a1.u AS z, a1.v AS x, a2.v AS y
         | FROM a a1 JOIN a a2 ON a1.u = a2.u AND a1.v < a2.v),
         |sc AS (
         | SELECT x, y, CAST(count(*) AS BIGINT) AS common_n,
         |  sum(il.ilz) AS aa
         | FROM wd JOIN il USING (z) GROUP BY 1, 2),
         |ne AS (
         | SELECT * FROM sc
         | WHERE NOT EXISTS (SELECT 1 FROM capped e
         |   WHERE e.u = sc.x AND e.v = sc.y))
         |SELECT x, y, common_n, CAST(aa AS DOUBLE) AS aa_score
         |FROM ne ORDER BY aa DESC, x, y LIMIT 25""".stripMargin,
    "q99_triangle_cooccur" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")}
         |SELECT e1.u AS a, e1.v AS b, e2.v AS c,
         | e1.w + e2.w + e3.w AS tw
         |FROM capped e1
         |JOIN capped e2 ON e1.u = e2.u AND e1.v < e2.v
         |JOIN capped e3 ON e3.u = e1.v AND e3.v = e2.v
         |ORDER BY tw DESC, a, b, c LIMIT 20""".stripMargin,
    "q105_pagerank" ->
      s"""WITH ${duckCappedEdgesHint("MATERIALIZED ")},
         |a AS (SELECT u, v FROM capped UNION ALL SELECT v, u FROM capped),
         |deg AS (SELECT u, count(*) AS deg FROM a GROUP BY u),
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT u AS node, 1000000000000 // n AS r FROM deg CROSS JOIN nn),
         |$duckPageRankIters
         |SELECT node, CAST(r AS BIGINT) AS rank_scaled,
         | CAST(r AS DOUBLE) / 1000000000000 AS rank
         |FROM r3 ORDER BY rank_scaled DESC, node LIMIT 25""".stripMargin,
    // fuzzy-pair transitive closure on name strings; canonical member by
    // frequency through the min(struct(-freq, name)) argmax
    "q150_entity_clusters" ->
      """WITH RECURSIVE names AS (
        | SELECT p_name, count(*) AS n_parts,
        |  split_part(p_name, ' ', 2) AS noun
        | FROM part WHERE p_name IS NOT NULL GROUP BY p_name),
        |p AS (
        | SELECT a.p_name AS u, b.p_name AS v
        | FROM names a JOIN names b
        |   ON a.noun = b.noun AND a.p_name < b.p_name
        | WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |e AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
        |reach(id, r) AS (
        | SELECT p_name, p_name FROM names
        | UNION
        | SELECT reach.id, e.v FROM reach JOIN e ON e.u = reach.r),
        |lbl AS (SELECT id, min(r) AS ck FROM reach GROUP BY id),
        |j AS (SELECT n.p_name, n.n_parts, l.ck
        |      FROM names n JOIN lbl l ON l.id = n.p_name),
        |m AS (
        | SELECT ck, count(*) AS n_names,
        |  CAST(sum(n_parts) AS BIGINT) AS total_parts,
        |  min(struct_pack(nn := -n_parts, nm := p_name)) AS c
        | FROM j GROUP BY ck)
        |SELECT ck AS cluster_key, n_names, total_parts,
        | c.nm AS canonical_name, CAST(-(c.nn) AS BIGINT) AS canonical_parts
        |FROM m ORDER BY cluster_key""".stripMargin,
    // q66's closure + q33's quality, canonical member = max(struct) argmax.
    // The pair basis is DedupOps.ngramPairCtes — the ONE family spelling —
    // and pe/e are MATERIALIZED: referenced from inside the recursive
    // union, an inlined basis re-evaluates per closure round (measured
    // >20 min at sf0.1 vs ~10 s materialized; same class as q191's hint).
    "q148_cluster_survivor" ->
      s"""WITH RECURSIVE ${DedupOps.ngramPairCtes},
         |pe AS MATERIALIZED (
         | SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.5),
         |e AS MATERIALIZED (
         | SELECT doc_a AS u, doc_b AS v FROM pe
         | UNION ALL SELECT doc_b, doc_a FROM pe),
         |reach(id, r) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT reach.id, e.v FROM reach JOIN e ON e.u = reach.r),
         |lbl AS (
         | SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
         |q AS (SELECT doc_id, ${TextOps.duckQualityScore} AS qs FROM documents),
         |j AS (SELECT lbl.doc_id, lbl.component, q.qs
         |      FROM lbl JOIN q USING (doc_id)),
         |m AS (
         | SELECT component, count(*) AS component_size,
         |  max(struct_pack(q := qs, nid := -doc_id)) AS best,
         |  min(CASE WHEN doc_id = component THEN qs END) AS minid_quality
         | FROM j GROUP BY component)
         |SELECT component, component_size,
         | -(best.nid) AS survivor_id, best.q AS survivor_quality,
         | minid_quality
         |FROM m ORDER BY component""".stripMargin,
    // same basis + materialization discipline as q148 above
    "q66_dedup_components" ->
      s"""WITH RECURSIVE ${DedupOps.ngramPairCtes},
        |pe AS MATERIALIZED (
        | SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.5),
        |e AS MATERIALIZED (
        | SELECT doc_a AS u, doc_b AS v FROM pe
        | UNION ALL SELECT doc_b, doc_a FROM pe),
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
