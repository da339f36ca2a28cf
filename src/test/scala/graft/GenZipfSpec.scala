package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sparse-corpus generator must actually produce the regime it
  * promises: deterministic output, graded-schema columns, a genuinely
  * sparse vocabulary, and planted twins at the q36 banding design point
  * (token-set Jaccard ≈ 0.9). The LSH/PPJoin behavior OVER such a corpus
  * is DedupSimilaritySpec's sparse-regime test; this spec pins the
  * generator itself. */
class GenZipfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def toks(t: String): Set[String] =
    t.toLowerCase.trim.split("[ \\t\\n\\x0B\\f\\r]+").toSet

  test("corpus is deterministic, schema-complete, and Zipf-sparse") {
    val a = GenZipf.corpus(spark, 400, 5000).orderBy("doc_id").collect()
    val b = GenZipf.corpus(spark, 400, 5000).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq, "regeneration must be byte-identical")
    assert(a.head.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(a.length === 420) // 400 base + 5% twins
    // sparse vocabulary: hundreds of distinct tokens (the graded corpus
    // has ~40), with Zipf mass concentrated on low ranks
    val vocab = a.flatMap(r => toks(r.getString(1))).toSet
    assert(vocab.size > 500, s"vocabulary must be sparse-regime, got ${vocab.size}")
    val low = a.flatMap(r => toks(r.getString(1)))
      .count(t => t.stripPrefix("w").toInt < 500)
    assert(low.toDouble / a.map(r => toks(r.getString(1)).size).sum > 0.3,
      "low ranks must carry disproportionate mass (Zipf shape)")
  }

  test("planted twins sit at the near-dup design point; base pairs do not") {
    val rows = GenZipf.corpus(spark, 400, 5000).collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val twinJ = (0 until 20).map { j =>
      val t = rows(400L + j); val base = rows(20L * j)
      t.intersect(base).size.toDouble / t.union(base).size
    }
    assert(twinJ.forall(_ >= 0.7), s"twin Jaccard floor: ${twinJ.min}")
    assert(twinJ.count(_ >= 0.85) >= 15,
      s"most twins at the ≈0.9 design point, got ${twinJ.count(_ >= 0.85)}")
    // independent base docs stay far below every dedup threshold
    val baseJ = for { a <- 0 until 60; b <- a + 1 until 60 } yield {
      val (sa, sb) = (rows(a.toLong), rows(b.toLong))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    assert(baseJ.max < 0.5, s"independent docs must not near-dup: ${baseJ.max}")
  }
}
