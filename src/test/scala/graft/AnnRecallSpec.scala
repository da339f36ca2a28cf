package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.ops.SimilarityOps

/** Adversarial ANN recall harness (round-5 verdict item 6).
  *
  * The q42/q56 quality specs bound ANN results by brute force but say
  * nothing about RECALL on hostile geometry. These fixtures construct the
  * two known worst cases and pin measured floors:
  *
  *  - LSH: points lying ON hyperplane boundaries, where an ε-perturbed
  *    true neighbor flips boundary bits with p≈1/2 each and single-table
  *    collisions collapse — the failure mode more tables (not more bits)
  *    repairs;
  *  - IVF: queries equidistant between two learned cells, whose true
  *    neighbors live across the boundary — the failure mode nprobe
  *    repairs, with nprobe == nlist provably identical to brute force.
  *
  * Floors are pinned from measured values with margin; the real-corpus
  * floor at sf0.1 guards the production default. */
class AnnRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def toDf(rows: Seq[(Long, Array[Double])]): DataFrame =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
      .repartition(8)

  /** recall@k of `ann` against the brute-force ground truth on the same
    * frame: mean per-query overlap of the returned id sets. */
  private def recallAt(df: DataFrame, k: Int, ann: DataFrame): Double = {
    val truth = SimilarityOps.bruteTopKOn(df, k)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = ann.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test("LSH adversarial: boundary-hugging corpus — more tables restore the floor") {
    val rnd = new scala.util.Random(7)
    // project queries orthogonal to the first 4 hyperplanes of each of the
    // default 4 tables: 16 near-zero margins, each flipping with p≈1/2
    // under the ε-perturbation that defines the true neighbors
    val planes = SimilarityOps.hyperplanes(tables = 4, bits = 8, dim = dim)
    // ORTHONORMALIZED basis of the boundary planes (classical Gram-Schmidt):
    // projecting against the raw (non-orthogonal) planes leaves residual
    // margins ~the perturbation size and the fixture stops being hostile
    val boundary = planes.flatMap(_.take(4)).map(normalize)
      .foldLeft(Vector.empty[Array[Double]]) { (basis, p) =>
        var v = p
        basis.foreach { b =>
          val d = v.zip(b).map { case (a, x) => a * x }.sum
          v = v.zip(b).map { case (a, x) => a - d * x }
        }
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 1e-9) basis :+ v.map(_ / n) else basis
      }
    def orthogonalized(): Array[Double] = {
      var v = Array.fill(dim)(rnd.nextGaussian())
      boundary.foreach { p =>
        val d = v.zip(p).map { case (a, b) => a * b }.sum
        v = v.zip(p).map { case (a, b) => a - d * b }
      }
      normalize(v)
    }
    val queries = (0L until 10L).map(i => i -> orthogonalized())
    val neighbors = queries.zipWithIndex.flatMap { case ((qid, q), qi) =>
      (0 until 3).map { j =>
        (100L + qi * 10 + j) ->
          normalize(q.map(_ + 0.02 * rnd.nextGaussian()))
      }
    }
    val distractors = (1000L until 1300L)
      .map(i => i -> normalize(Array.fill(dim)(rnd.nextGaussian())))
    val df = toDf(queries ++ neighbors ++ distractors)
    // premise: brute top-3 is exactly the planted neighbors
    val truth = SimilarityOps.bruteTopKOn(df, 3)
      .select("q_id", "c_id").as[(Long, Long)].collect()
    assert(truth.forall { case (q, c) => c >= 100L && c < 1000L },
      "planted neighbors must be the exact top-3")
    val r4 = recallAt(df, 3, SimilarityOps.annLshOn(df, tables = 4, bits = 8, k = 3))
    val r16 = recallAt(df, 3, SimilarityOps.annLshOn(df, tables = 16, bits = 8, k = 3))
    // the default budget measurably degrades on boundary mass; the
    // documented mitigation is MORE TABLES at the same bit width
    assert(r16 >= r4 - 1e-9, s"more tables must not lose recall ($r4 -> $r16)")
    assert(r16 >= 0.85, s"16-table floor on the adversarial fixture: got $r16")
    info(f"adversarial LSH recall: 4 tables $r4%.3f, 16 tables $r16%.3f")
  }

  test("IVF adversarial: cell-straddling queries — nprobe repairs, nprobe=nlist is brute") {
    val rnd = new scala.util.Random(11)
    // 16 well-separated cluster directions; queries straddle disjoint pairs
    val centers = Array.fill(16)(normalize(Array.fill(dim)(rnd.nextGaussian())))
    def member(c: Array[Double], eps: Double) =
      normalize(c.zipWithIndex.map { case (x, _) => x + eps * rnd.nextGaussian() })
    // ids 0..4: straddle queries of pairs (0,1),(2,3),(4,5),(6,7),(8,9)
    val queries = (0 until 5).map { i =>
      i.toLong -> normalize(
        centers(2 * i).zip(centers(2 * i + 1)).map { case (a, b) => a + b }
          .map(_ + 0.01 * rnd.nextGaussian()))
    }
    // ids 5..15 seed the k-means init with genuine cluster members
    val seeds = (5 to 15).map(i => i.toLong -> member(centers(i - 5), 0.05))
    val members = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 30).map(j => (100L + ci * 100 + j) -> member(c, 0.05))
    }
    val df = toDf(queries ++ seeds ++ members)
    val rGot = Seq(1, 2, 16).map(np =>
      np -> recallAt(df, 3, SimilarityOps.annIvfOn(df, nlist = 16, nprobe = np, k = 3)))
    val r = rGot.toMap
    info(f"adversarial IVF recall: nprobe 1 ${r(1)}%.3f, 2 ${r(2)}%.3f, 16 ${r(16)}%.3f")
    // single-probe misses across the straddle; widening probes repairs
    assert(r(1) <= r(2) + 1e-9 && r(2) <= r(16) + 1e-9,
      s"recall must be monotone in nprobe: $rGot")
    assert(r(16) === 1.0, "probing every list must recover brute force")
    // the equivalence is exact, not just recall-1: same rows, same ranks
    val brute = SimilarityOps.bruteTopKOn(df, 3)
      .select("q_id", "c_id", "rk").as[(Long, Long, Int)].collect().toSet
    val all = SimilarityOps.annIvfOn(df, nlist = 16, nprobe = 16, k = 3)
      .select("q_id", "c_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(all === brute, "nprobe == nlist must BE brute force")
  }

  test("real-corpus recall floors at sf0.1, each index in its designed regime") {
    val sf01 = s"${GenEdge.TestdataRoot}/sf0.1"
    TestSpark.requireTestdata(sf01)
    val e = Tables.spread(Tables.load(spark, sf01, "embeddings"), "vec_id")
    // IVF serves weak-similarity top-k (this corpus' true top-3 sits at
    // cos 0.35-0.45): the learned coarse cells carry it — floor pinned
    val rIvf = recallAt(e, 3, SimilarityOps.annIvfOn(e, nlist = 16, nprobe = 4, k = 3))
    // Hyperplane LSH serves the HIGH-similarity (near-dup / q61) regime:
    // collision probability for a 67-degree "neighbor" is ~0 at any sane
    // budget, by design — so its real-corpus floor is measured on planted
    // ε-perturbed twins of real corpus vectors (cos ≈ 0.999) ranked
    // against the full real corpus as distractors
    val rnd = new scala.util.Random(13)
    import org.apache.spark.sql.functions.col
    val qs = e.filter(col("vec_id") < 10)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val planted = qs.map { case (id, v) =>
      (5000L + id) -> normalize(v.map(_.toDouble).map(_ + 0.02 * rnd.nextGaussian()))
    }
    val e2 = e.select("vec_id", "embedding").unionAll(toDf(planted.toSeq))
    val truth1 = SimilarityOps.bruteTopKOn(e2, 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(truth1.forall { case (q, c) => c == 5000L + q },
      "planted twin must be every query's exact nearest neighbor")
    val ann1 = SimilarityOps.annLshOn(e2, tables = 4, bits = 8, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val rLsh = truth1.count { case (q, c) => ann1.get(q).contains(c) }.toDouble / truth1.size
    info(f"sf0.1 recall: LSH(planted twins) $rLsh%.3f, IVF(weak-sim top-3) $rIvf%.3f")
    assert(rLsh >= 0.9, s"q42 high-sim recall floor at sf0.1: got $rLsh")
    assert(rIvf >= 0.85, s"q56 default-budget recall floor at sf0.1: got $rIvf")
  }

  test("recall floors hold at sf1 (10x corpus; runs only when /tmp/sf1 exists)") {
    // the sf0.1 floors could in principle erode as distractor mass grows
    // 10x (more near-boundary vectors per bucket/cell); assert them once
    // against the GenScale output. Gated: the scale corpus is generated
    // out-of-band (runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1),
    // so its absence cancels rather than fails.
    assume(new java.io.File("/tmp/sf1/embeddings.parquet").exists(),
      "sf1 corpus not generated")
    val e = Tables.spread(
      Tables.load(spark, "/tmp/sf1", "embeddings"), "vec_id")
    val rIvf = recallAt(e, 3, SimilarityOps.annIvfOn(e, nlist = 16, nprobe = 4, k = 3))
    val rnd = new scala.util.Random(13)
    import org.apache.spark.sql.functions.{col, max => fmax}
    // planted ids start past the real id domain (5000L + q collides at sf1)
    val base = e.agg(fmax("vec_id")).head.getLong(0) + 1L
    val qs = e.filter(col("vec_id") < 10)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val planted = qs.map { case (id, v) =>
      (base + id) -> normalize(v.map(_.toDouble).map(_ + 0.02 * rnd.nextGaussian()))
    }
    val e2 = e.select("vec_id", "embedding").unionAll(toDf(planted.toSeq))
    // at sf1 the corpus ALREADY holds a closer neighbor than the planted
    // twin: GenScale's replicas jitter each component by ±0.01, so
    // replica copies of the query sit at cos ≈ 0.9999. The premise is
    // therefore "the true nearest neighbor is in the high-sim regime",
    // not "it is the planted row" — recall is measured against brute
    // top-1 whichever row that is (the plant guarantees the premise
    // even if a future generator drops the jitter scheme).
    val truthRows = SimilarityOps.bruteTopKOn(e2, 1)
      .select("q_id", "c_id", "sim").as[(Long, Long, Double)].collect()
    assert(truthRows.forall(_._3 >= 0.99),
      s"premise: every query needs a high-sim nearest neighbor, " +
        s"min sim ${truthRows.map(_._3).min}")
    val truth1 = truthRows.map(t => t._1 -> t._2).toMap
    val ann1 = SimilarityOps.annLshOn(e2, tables = 4, bits = 8, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val rLsh = truth1.count { case (q, c) => ann1.get(q).contains(c) }.toDouble / truth1.size
    info(f"sf1 recall: LSH(high-sim top-1) $rLsh%.3f, IVF(weak-sim top-3) $rIvf%.3f")
    assert(rLsh >= 0.9, s"q42 high-sim recall floor at sf1: got $rLsh")
    assert(rIvf >= 0.85, s"q56 default-budget recall floor at sf1: got $rIvf")
  }
}
