package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum (the case pairwise min-id misses)") {
    // 1-2, 2-3, 3-4: node 4 never pairs with 1 directly
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("long path converges (log-round star contraction, not diameter walk)") {
    // a 200-node path: min-label propagation would need 200 rounds; the
    // alternating algorithm must finish inside the iteration cap (50)
    val path = (1L until 200L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.size === 200)
    assert(labels.values.toSet === Set(1L))
  }

  test("separate components keep separate minima; ids need not be dense") {
    val labels = cc(Seq((10L, 7L), (7L, 42L), (100L, 90L), (5L, 5L)))
    // 5-5 is a self-loop: dropped, node never appears in output
    assert(labels === Map(7L -> 7L, 10L -> 7L, 42L -> 7L, 90L -> 90L, 100L -> 90L))
  }

  test("duplicate and reversed edges do not change the labeling") {
    val labels = cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge list yields empty labeling") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("q66 labels every document; survivors are component minima") {
    val out = GraphOps.q66DedupComponents(spark, TestSpark.sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val docCount = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(out.length === docCount)
    out.foreach { case (id, comp, size, survivor) =>
      assert(comp <= id)
      assert(size >= 1)
      assert(survivor === (id == comp))
    }
    // exactly one survivor per component, and sizes agree with membership
    val byComp = out.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._4) === 1, s"component $comp")
      assert(members.map(_._3).toSet === Set(members.length.toLong))
      assert(members.map(_._1).min === comp)
    }
    // sf0.001 plants near-dups: at least one non-singleton component
    assert(byComp.exists(_._2.length > 1))
  }

  test("cluster survivor is the component's quality argmax, tie-broken to smaller id") {
    val labels = GraphOps.q66DedupComponents(spark, TestSpark.sf)
      .select("doc_id", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val qual = graft.ops.TextOps.q33TextQuality(spark, TestSpark.sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = labels.groupBy(_._2).map { case (comp, members) =>
      val ids = members.map(_._1)
      val best = ids.map(id => (qual(id), -id)).max
      (comp, ids.length.toLong, -best._2, best._1, qual(comp))
    }.toSet
    val got = GraphOps.q148ClusterSurvivor(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got === want)
    // the survivor always at least matches the min-id member's quality
    got.foreach { case (_, _, _, sq, mq) => assert(sq >= mq) }
  }

  test("entity clusters absorb every fuzzy pair and conserve the name catalog") {
    val clusters = GraphOps.q150EntityClusters(spark, TestSpark.sf).collect()
    val names = Tables.load(spark, TestSpark.sf, "part")
      .select("p_name").distinct().count()
    assert(clusters.map(_.getAs[Long]("n_names")).sum === names)
    // rebuild the member→cluster map by driver-side closure over q91 pairs
    val pairs = graft.ops.DedupOps.q91FuzzyBlocked(spark, TestSpark.sf)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering.String.max(ra, rb)) = // union by min
        math.Ordering.String.min(ra, rb)
    }
    val grouped = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (_, ms) => ms.toSet }
    // every driver-side cluster appears as one operator cluster keyed by
    // its min name, with matching size (plus singletons we didn't build)
    val bySize = clusters.map(r =>
      r.getAs[String]("cluster_key") -> r.getAs[Long]("n_names")).toMap
    grouped.foreach { ms =>
      assert(bySize(ms.min) === ms.size.toLong)
    }
    assert(grouped.exists(_.size > 2)) // chaining actually happened
  }

  test("co-order graph: mutual cap bounds degree and keeps edges symmetric-canonical") {
    val e = GraphOps.coOrderEdges(Tables.load(spark, TestSpark.sf, "lineitem"), cap = 8)
      .as[(Long, Long, Long)].collect()
    assert(e.nonEmpty)
    e.foreach { case (u, v, w) => assert(u < v); assert(w >= 1) }
    assert(e.map(p => (p._1, p._2)).distinct.length === e.length)
    // mutual top-8 pruning: no endpoint can exceed degree 8
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map(_._2.length)
    assert(deg.max <= 8)
  }

  test("q99 triangles are real: all three capped edges exist, ordering is canonical") {
    val edges = GraphOps.coOrderEdges(Tables.load(spark, TestSpark.sf, "lineitem"))
      .as[(Long, Long, Long)].collect()
    val wByEdge = edges.map(e => (e._1, e._2) -> e._3).toMap
    val tris = GraphOps.q99TriangleCooccur(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(tris.nonEmpty && tris.length <= 20)
    tris.foreach { case (a, b, c, tw) =>
      assert(a < b && b < c)
      assert(wByEdge.contains(a -> b) && wByEdge.contains(a -> c) && wByEdge.contains(b -> c))
      assert(tw === wByEdge(a -> b) + wByEdge(a -> c) + wByEdge(b -> c))
    }
    // ranked by total weight, descending
    assert(tris.map(_._4).toSeq === tris.map(_._4).sortBy(-_).toSeq)
  }

  test("integer PageRank: star center dominates, leaves tie, mass stays bounded") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    val r = GraphOps.pageRankScaled(star, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(r(2L) === r(3L) && r(3L) === r(4L) && r(4L) === r(5L)) // symmetry
    assert(r(1L) > r(2L)) // the hub holds more mass
    // total mass stays within the damping fixed point (≤ scale; floor-div
    // loses at most a few units per node per round)
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.forall(_ > 0L))
  }

  test("q105 output is deterministically ordered and positive") {
    val out = GraphOps.q105PageRank(spark, TestSpark.sf)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 25)
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    out.foreach { case (_, rs, rd) => assert(rs > 0); assert(rd === rs.toDouble / 1e12) }
  }

  test("label propagation: two triangles joined by one bridge edge split apart") {
    // nodes 1-2-3 heavily intra-linked, 4-5-6 likewise, 3-4 a weak bridge:
    // each triangle must converge onto its own label, bridge notwithstanding
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L), (3L, 4L, 1L))
      .toDF("u", "v", "w")
    val labels = GraphOps.labelPropagate(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(labels(1), labels(2), labels(3)).size === 1)
    assert(Set(labels(4), labels(5), labels(6)).size === 1)
    assert(labels(1) !== labels(4))
  }

  test("label propagation ties break toward the smaller label (determinism)") {
    // node 3 sees labels 1 and 2 with equal weight in round 1 → must pick 1
    val edges = Seq((1L, 3L, 5L), (2L, 3L, 5L)).toDF("u", "v", "w")
    val labels = GraphOps.labelPropagate(edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(3L) === 1L)
  }

  test("q112 communities: sizes ordered, members real, sizes tie out") {
    val out = GraphOps.q112LabelCommunities(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    val sizes = out.map(_.getAs[Long]("n_members"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
    assert(sizes.forall(_ >= 3))
    // recompute the full labeling: reported sizes must match exactly
    val full = GraphOps.labelPropagate(
      GraphOps.cachedCoOrderEdges(spark, TestSpark.sf), rounds = 2)
      .groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(full(r.getAs[Long]("label")) === r.getAs[Long]("n_members"))
      assert(!r.isNullAt(r.fieldIndex("min_member")))
    }
  }

  test("degree histogram: buckets tile powers of two and conserve nodes and degree mass") {
    val h = GraphOps.q136DegreeHistogram(spark, TestSpark.sf).collect()
    assert(h.nonEmpty)
    h.foreach { r =>
      val b = r.getAs[Int]("bucket_log2")
      assert(r.getAs[Long]("min_deg") >= (1L << b))
      assert(r.getAs[Long]("max_deg") < (1L << (b + 1)))
    }
    val e = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
    val nodes = e.select(col("u").as("n")).union(e.select(col("v")))
      .distinct().count()
    assert(h.map(_.getAs[Long]("n_nodes")).sum === nodes)
    // every undirected edge contributes exactly 2 to total degree
    assert(h.map(_.getAs[Long]("sum_deg")).sum === 2 * e.count())
    // the mutual cap is the histogram's hard right edge
    assert(h.map(_.getAs[Long]("max_deg")).max <= 64L)
  }

  // ------------------------------------------------------------ q161 sim
  test("item similarity: native top-k equals the window form and sim is normalized") {
    import org.apache.spark.sql.expressions.Window
    val got = GraphOps.q161ItemSimilarity(spark, TestSpark.sf)
    val e = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
    val op = Tables.load(spark, TestSpark.sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val support = op.groupBy(col("p")).agg(count(lit(1)).as("n_ord"))
    // inline, not union: the edge memo's u < v constraint crashes Union's
    // constraint rewrite once a join sits above (same dodge as the operator)
    val sym = e.select(inline(array(
      struct(col("u"), col("v"), col("w")),
      struct(col("v").as("u"), col("u").as("v"), col("w")))))
    val scored = sym
      .join(support.select(col("p").as("u"), col("n_ord").as("nu")), Seq("u"))
      .join(support.select(col("p").as("v"), col("n_ord").as("nv")), Seq("v"))
      .withColumn("sim",
        col("w").cast("double") / sqrt((col("nu") * col("nv")).cast("double")))
    val w = Window.partitionBy("u").orderBy(col("sim").desc, col("v"))
    val exp = scored.select("u", "v", "w", "nu", "nv", "sim")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .orderBy("u", "rk")
    assert(got.collect().map(_.toSeq).toSeq === exp.collect().map(_.toSeq).toSeq)
    // Ochiai is normalized: w <= min(nu, nv) ⇒ 0 < sim <= 1
    assert(got.filter(col("sim") <= 0.0 || col("sim") > 1.0).count() === 0)
  }

  // ------------------------------------------------------------ q160 cc
  test("clustering coefficient matches a driver-side neighborhood recompute") {
    val got = GraphOps.q160ClusteringCoeff(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val es = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
      .select("u", "v").as[(Long, Long)].collect()
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    es.foreach { case (u, v) => nbrs(u) += v; nbrs(v) += u }
    assert(got.keySet === nbrs.keySet)
    nbrs.foreach { case (n, ns) =>
      val deg = ns.size.toLong
      val tri = ns.toSeq.sorted.combinations(2)
        .count { case Seq(x, y) => nbrs(x).contains(y); case _ => false }
        .toLong
      val exp = if (deg >= 2)
        Some((2L * tri).toDouble / (deg * (deg - 1)).toDouble) else None
      assert(got(n) === ((deg, tri, exp)), s"node $n")
    }
    // at least one node actually closes a triangle
    assert(got.values.exists(_._2 > 0))
  }

  test("HITS certificate matches brute-force unnormalized half-steps") {
    val got = GraphOps.q174HitsScores(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (BigInt(r.getAs[String]("auth1")),
          BigInt(r.getAs[String]("auth2")))).toMap
    val w = Tables.load(spark, TestSpark.sf, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> BigInt(r.getLong(2))).toMap
    val auth1 = w.groupMapReduce(_._1._2)(_._2)(_ + _)
    val hub1 = w.groupMapReduce(_._1._1) { case ((_, i), x) => x * auth1(i) }(_ + _)
    val auth2 = w.groupMapReduce(_._1._2) { case ((u, _), x) => x * hub1(u) }(_ + _)
    assert(got.keySet === auth1.keySet)
    got.foreach { case (item, (a1, a2)) =>
      assert(a1 === auth1(item), s"auth1 $item")
      assert(a2 === auth2(item), s"auth2 $item")
    }
    // the two iterations genuinely reorder nothing only if rankings agree;
    // assert auth2 preserves a strict positive ordering (sanity, not parity)
    assert(got.values.forall { case (a1, a2) => a1 > 0 && a2 > 0 })
  }

  // ------------------------------------------------------------ q175 bfs
  test("BFS hop rings match a driver-side frontier recompute") {
    val got = GraphOps.q175BfsHops(spark, TestSpark.sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val es = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
      .select("u", "v").as[(Long, Long)].collect()
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    es.foreach { case (u, v) => nbrs(u) += v; nbrs(v) += u }
    val seeds = nbrs.toSeq.map { case (n, ns) => (n, ns.size) }
      .sortBy { case (n, deg) => (-deg, n) }.take(8).map(_._1).toSet
    var visited = seeds
    var frontier = seeds
    val rings = scala.collection.mutable.Map(0 -> seeds)
    (1 to 3).foreach { h =>
      val next = frontier.flatMap(nbrs) -- visited
      rings(h) = next
      visited ++= next
      frontier = next
    }
    rings(-1) = nbrs.keySet.toSet -- visited
    rings.filter(_._2.nonEmpty).foreach { case (dist, ns) =>
      val exp = (ns.size.toLong, ns.min, ns.max, ns.sum)
      assert(got(dist) === exp, s"ring $dist")
    }
    assert(got.keySet === rings.filter(_._2.nonEmpty).keys.toSet)
    // rings partition the reachable set: totals reconcile with the graph
    assert(got.values.map(_._1).sum === nbrs.size.toLong)
  }

  // ------------------------------------------------------------ q183 ppr
  test("personalized PageRank matches a driver-side integer recompute") {
    val got = GraphOps.q183PersonalizedPagerank(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val es = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
      .select("u", "v").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    es.foreach { case (u, v) => adj(u) ::= v; adj(v) ::= u }
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val seeds = deg.toSeq.sortBy { case (n, dg) => (-dg, n) }
      .take(8).map(_._1)
    val scale = 1000000000000L
    val k = seeds.size
    val tele = 15L * scale / (100L * k)
    var r: Map[Long, Long] = seeds.map(_ -> scale / k).toMap
    (1 to 3).foreach { _ =>
      val inr = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      r.foreach { case (u, ru) =>
        val c = ru / deg(u)
        adj(u).foreach(v => inr(v) += c)
      }
      r = (inr.keySet ++ seeds).map { n =>
        n -> ((85L * inr(n)) / 100L + (if (seeds.contains(n)) tele else 0L))
      }.toMap
    }
    val exp = r.toSeq.sortBy { case (n, rv) => (-rv, n) }.take(25)
    assert(got.toSeq === exp)
    // mass sanity: every seed carries at least its teleport share
    seeds.foreach(sd => assert(r(sd) >= tele))
  }

  test("PPR plan carries no full-outer stitch (teleport rides the aggregate)") {
    // Spark silently drops broadcast hints on full-outer joins, so a
    // full-outer teleport stitch would sort-merge the whole rank relation
    // against 8 rows per round — pin the shape that avoids it
    val plan = GraphOps.q183PersonalizedPagerank(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FullOuter"), "teleport must not full-outer join")
  }

  test("k-core peel certificates match a driver-side synchronous peel") {
    val k = 32
    val raw = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
      .select("u", "v").as[(Long, Long)].collect().toSeq
    def certOf(round: Int, es: Seq[(Long, Long)]) = {
      val ns = (es.map(_._1) ++ es.map(_._2)).distinct
      (round, ns.size.toLong, es.size.toLong, ns.min, ns.max, ns.sum)
    }
    var es = raw
    val expect = scala.collection.mutable.ArrayBuffer(certOf(0, es))
    for (r <- 1 to 3) {
      val deg = (es.map(_._1) ++ es.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      es = es.filter { case (u, v) => keep(u) && keep(v) }
      expect += certOf(r, es)
    }
    val got = GraphOps.q191KcorePeel(spark, TestSpark.sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect.toSeq)
    // the peel is monotone: nodes and edges never grow round-over-round
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, "peel must shrink monotonically")
    }
  }

  test("q223 adamic-adar: scores only non-edges, top pair matches a local recompute") {
    val rows = GraphOps.q223AdamicAdar(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val edges = GraphOps.cachedCoOrderEdges(spark, TestSpark.sf)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every scored pair is a NON-edge of the capped graph
    rows.foreach { r =>
      assert(!edges.contains((r.getLong(0), r.getLong(1))),
        s"pair ${r.getLong(0)},${r.getLong(1)} is an existing edge")
      assert(r.getAs[Long]("common_n") >= 1L)
      assert(r.getAs[Double]("aa_score") > 0.0)
    }
    // scores are ranked descending
    val scores = rows.map(_.getAs[Double]("aa_score")).toSeq
    assert(scores === scores.sorted.reverse)
    // local recompute of the top pair's score from the adjacency
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val (x, y) = (rows.head.getLong(0), rows.head.getLong(1))
    val common = adj(x).intersect(adj(y))
    assert(rows.head.getAs[Long]("common_n") === common.size.toLong)
    val expected = common.toSeq.map { z =>
      BigDecimal(1.0 / math.log(adj(z).size.toDouble))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(rows.head.getAs[Double]("aa_score") - expected) < 1e-9)
  }

  /** Write a minimal lineitem.parquet (the only table q223 reads) into a
    * fresh temp dir so the packed-key probe sees a controlled id domain. */
  private def adamicDir(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q223").toString
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q223 ids at or above 2^31 stay exact (no packed-key sign overflow)") {
    // wedge: orders {a,b} share z with x and y respectively; x-y is the
    // one non-edge with a common neighbor. Shift the whole id space by
    // 2^31 + 5: a pack bounded at 2^32 would wrap pk negative here and
    // emit a corrupted x — the probe must route these ids to the
    // two-column aggregate instead.
    val base = Seq(
      (1L, 1L), (1L, 3L), // order 1: parts 1,3  -> edge 1-3
      (2L, 2L), (2L, 3L), // order 2: parts 2,3  -> edge 2-3
      (3L, 3L), (3L, 4L)) // order 3: parts 3,4  -> edge 3-4 (deg(3)=3)
    val shift = (1L << 31) + 5L
    val small = GraphOps.q223AdamicAdar(spark, adamicDir(base)).collect()
    val big = GraphOps.q223AdamicAdar(spark,
      adamicDir(base.map { case (o, p) => (o, p + shift) })).collect()
    assert(big.nonEmpty)
    big.foreach { r =>
      assert(r.getLong(0) > shift && r.getLong(1) > shift,
        s"corrupted id in (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the shifted graph is isomorphic: same scores, ids shifted
    assert(big.map(r => (r.getLong(0) - shift, r.getLong(1) - shift,
        r.getLong(2), r.getDouble(3))).toSeq ===
      small.map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("q223 empty co-order graph yields an empty frame, not an error") {
    // every order holds ONE distinct part -> no co-order edges at all;
    // the id-domain probe sees (null, null, 0) and must not NPE
    val rows = GraphOps.q223AdamicAdar(spark,
      adamicDir(Seq((1L, 1L), (2L, 2L), (3L, 3L)))).collect()
    assert(rows.isEmpty)
  }

  test("PageRank cores on an empty edge list return empty frames, not /0") {
    // n = 0 distinct nodes previously threw ArithmeticException on the
    // driver before any job ran (scale/n); now both cores short-circuit
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(GraphOps.pageRankScaled(empty, iterations = 3).collect().isEmpty)
    val emptyW = Seq.empty[(Long, Long, Long)].toDF("u", "v", "w")
    assert(GraphOps.pageRankWeightedScaled(emptyW, iterations = 3)
      .collect().isEmpty)
  }

  test("q183 on a co-order-free corpus yields an empty frame, not /0") {
    // no order holds 2+ distinct parts -> no edges -> zero seeds; the
    // teleport split (scale / k) must not divide by the empty seed count
    val rows = GraphOps.q183PersonalizedPagerank(spark,
      adamicDir(Seq((1L, 1L), (2L, 2L)))).collect()
    assert(rows.isEmpty)
  }

  test("reliable-checkpoint mode: CC and PageRank identical, files durable") {
    // spark.graft.reliableCheckpointDir switches every per-round lineage
    // cut (Transients.cut) from executor-resident localCheckpoint to a
    // reliable checkpoint() against the directory — the form a 1000-
    // executor multi-hour run needs, where one lost node must not restart
    // the iteration from round zero. Same rounds, same results.
    val edges = ((1L until 120L).map(i => (i, i + 1)) ++ // a long path
      Seq((200L, 201L), (201L, 202L), (300L, 300L))).toDF("src", "dst")
    val pr = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("u", "v")
    val ccBefore = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val prBefore = GraphOps.pageRankScaled(pr, iterations = 5)
      .as[(Long, Long)].collect().toMap
    // ONE stable per-JVM dir, deleted only at JVM exit — NOT a per-test
    // temp dir deleted in finally: SparkContext.setCheckpointDir is
    // first-cut-wins and can never be unset, so deleting the dir here
    // would leave the shared test session's context permanently pointing
    // at a dead path, silently breaking any LATER suite that enables
    // reliable mode in the same JVM (it would checkpoint under the stale
    // deleted dir instead of its configured one).
    val dir = GraphOpsSpec.reliableCkptDir
    spark.conf.set("spark.graft.reliableCheckpointDir", dir.toString)
    // the dir is shared by every reliable-mode test in the JVM and never
    // cleaned mid-run, so the durability assertion must count the DELTA —
    // a pre-existing rdd-* from another test must not satisfy it
    import scala.jdk.CollectionConverters._
    def rddDirs(): Long = scala.util.Using.resource(
      java.nio.file.Files.walk(dir))(_.iterator().asScala.count(p =>
        p.getFileName.toString.startsWith("rdd-")))
    val before = rddDirs()
    try {
      assert(GraphOps.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap === ccBefore)
      assert(GraphOps.pageRankScaled(pr, iterations = 5)
        .as[(Long, Long)].collect().toMap === prBefore)
      // the rounds really went through the reliable path: NEW checkpoint
      // data landed under the configured dir (setCheckpointDir nests a
      // UUID dir per context)
      assert(rddDirs() > before, "no reliable checkpoint data was written")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpointDir")
    }
  }

  test("reliable cut computes its plan exactly once (persist-then-checkpoint)") {
    // Dataset.checkpoint() is eager: one job materializes, then the RDD's
    // partitions are recomputed to WRITE the checkpoint files. On an
    // unpersisted plan that write pass re-executes the whole plan — every
    // cut would run twice. The cut persists first, so the write pass reads
    // cache: the accumulator below must tick exactly once per row, and
    // must NOT tick again when downstream reads come off the checkpoint.
    spark.conf.set("spark.graft.reliableCheckpointDir",
      GraphOpsSpec.reliableCkptDir.toString)
    try {
      val acc = spark.sparkContext.longAccumulator("cut_compute")
      val base = spark.range(1000).as[Long]
        .map { x => acc.add(1L); x }.toDF("v")
      val cp = Transients.track(Transients.cut(base))
      assert(acc.value === 1000L,
        s"cut executed its plan ${acc.value / 1000.0}x, expected once")
      assert(cp.count() === 1000L)
      assert(acc.value === 1000L, "downstream read recomputed the plan")
      // and the cut released its own cache — no block residue pinned
      assert(base.storageLevel ===
        org.apache.spark.storage.StorageLevel.NONE)
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpointDir")
      Transients.drop(spark)
    }
  }
}

object GraphOpsSpec {
  /** One stable reliable-checkpoint dir per JVM: setCheckpointDir is
    * first-cut-wins and can never be reset, so this path must outlive
    * every suite that might exercise reliable mode in the shared test
    * session — deleted by a shutdown hook at JVM exit, never mid-run. */
  lazy val reliableCkptDir: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    sys.addShutdownHook(FsUtil.deleteRec(d))
    d
  }
}
