package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** The SPARSE-REGIME gate for the near-dup family. The graded documents
  * corpus is unrealistically dense (~40-word vocabulary), so the dedup
  * operators' designed regime — Zipf vocabularies where banding/prefix
  * selectivity collapses pair mass to the planted near-dups — was only a
  * per-round measurement (GenZipf at 5.25k/52.5k docs, BASELINE.md) until
  * this spec. Here the [[GenZipf]] generator itself runs inside `sbt test`
  * at a brute-force-feasible volume (1000 base docs + 50 planted twins)
  * and q36 (banded MinHash), q38 (banded shingle Jaccard) and q140
  * (guaranteed-recall prefix filter) are replayed ORACLE-EXACTLY against
  * a driver-side brute-force pair set — the designed-regime contract
  * can't silently rot. The corpus is a pure function of xxhash64 draws,
  * so every assertion is deterministic: no flake budget is being spent
  * on the banded paths' ~1e-4 at-threshold miss probability.
  */
class ZipfGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val nDocs = 1000L
  private val nTwins = (nDocs / 20).toInt // GenZipf plants nDocs/20 twins
  private lazy val corpus =
    GenZipf.corpus(spark, nDocs, vocab = 5000).localCheckpoint()
  private lazy val texts: Seq[(Long, String)] =
    corpus.select("doc_id", "text").as[(Long, String)].collect().toSeq

  // Spark round() = HALF_UP; compare on the rounded grid like the oracle
  private def r4(j: Double): BigDecimal =
    BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  private def bruteJaccard(sets: Seq[(Long, Set[String])])
  : Map[(Long, Long), BigDecimal] =
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j > 0
    } yield (a, b) -> r4(j)).toMap

  private lazy val tokenSets = texts.map { case (i, t) =>
    i -> t.toLowerCase.trim.split("[ \\t\\n\\x0B\\f\\r]+").toSet
  }
  private lazy val shingleSets = texts.map { case (i, t) =>
    i -> t.toLowerCase.trim.split("[ \\t\\n\\x0B\\f\\r]+")
      .sliding(3).map(_.mkString(" ")).toSet
  }

  test("q36 pipeline on the GenZipf corpus equals brute force exactly") {
    val got = DedupOps.minhashNearDupPairsMd5(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val brute = bruteJaccard(tokenSets)
      .collect { case (p, j) if j >= BigDecimal("0.8") => p }.toSet
    assert(got === brute)
    // designed regime: pair mass stays at the planted scale (the dense
    // corpus' ~n²/4 explosion cannot appear), and the planted twins
    // (twin 1000+j rewrites 3 of base 20j's 60 token draws) are found
    assert(got.size <= 3 * nTwins, s"pair explosion: ${got.size}")
    val planted = (0 until nTwins)
      .map(j => (20L * j, nDocs + j)).filter(brute)
    assert(planted.size >= (nTwins * 9) / 10,
      "fixture drifted: most twins should sit above the 0.8 design point")
    assert(planted.forall(got))
  }

  test("q38 banded and q140 prefix-filter pipelines equal brute force exactly") {
    val brute = bruteJaccard(shingleSets)
      .collect { case (p, j) if j >= BigDecimal("0.5") => p -> j }.toMap
    // q140: recall 1.0 by theorem — values included
    val pp = DedupOps.ppjoinPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r4(r.getDouble(2))).toMap
    assert(pp === brute)
    // q38: banded candidates, same exact verification; on this corpus the
    // deterministic draws leave no at-threshold pair for banding to miss
    val banded = DedupOps.ngramNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r4(r.getDouble(2))).toMap
    assert(banded === brute)
    assert(brute.size <= 3 * nTwins, s"pair explosion: ${brute.size}")
  }
}
