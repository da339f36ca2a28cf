package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Corpus-index operators: inverted-index postings and PMI collocations
  * must agree with directly-computed counts. */
class TextIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val pairs = Tables.load(spark, TestSpark.sf, "documents")
    .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    .distinct().cache()

  test("inverted index: df and postings head match direct counts") {
    val idx = TextOps.q89InvertedIndex(spark, TestSpark.sf).collect()
    assert(idx.nonEmpty)
    // df non-increasing down the report (the top-50 cut is by df)
    val dfs = idx.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.drop(1)).forall { case (a, b) => a >= b })
    val top = idx.head
    val term = top.getString(0)
    val expectDf = pairs.filter(col("term") === term).count()
    assert(top.getAs[Long]("df") === expectDf)
    val posted = top.getAs[String]("postings_head").split(",").map(_.toLong)
    assert(posted.length === math.min(expectDf, 20L).toInt)
    assert(posted.sorted.sameElements(posted))
    val expectHead = pairs.filter(col("term") === term)
      .orderBy("doc_id").limit(20).collect().map(_.getLong(0))
    assert(posted.sameElements(expectHead))
  }

  test("PMI pairs: ordered terms, bounded co-counts, recomputable score") {
    val pmi = TextOps.q90TokenPmi(spark, TestSpark.sf).collect()
    assert(pmi.nonEmpty)
    val nDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    pmi.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (ca, cb, cab) = (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("c_ab"))
      assert(cab <= math.min(ca, cb) && cab >= 1)
      val expect = BigDecimal(StrictMath.log(cab.toDouble * nDocs / (ca.toDouble * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pmi") - expect) < 2e-6)
    }
    // the top co-count is a real count: recompute one pair directly
    val h = pmi.head
    val direct = pairs.filter(col("term") === h.getString(0)).select("doc_id")
      .intersect(pairs.filter(col("term") === h.getString(1)).select("doc_id"))
      .count()
    assert(h.getAs[Long]("c_ab") === direct)
  }

  test("vocab coverage: monotone cumulative share reaching exactly 1.0 per language") {
    val rows = TextOps.q100VocabCoverage(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to rs.length))
      // counts non-increasing down the ranking; share strictly increasing to 1.0
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, lang)
      val shares = sorted.map(_.getAs[Double]("cum_share"))
      assert(shares.zip(shares.tail).forall { case (a, b) => a < b }, lang)
      assert(shares.last === 1.0, lang)
    }
  }

  test("bigram LM: P(w2|w1) sums to <=1 over the top-3 and matches direct counts") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q101BigramLm(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byHead = rows.groupBy(_.getString(0))
    assert(byHead.size <= 20)
    byHead.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("crk")).sorted.toSeq === (1 to rs.length))
      assert(rs.map(_.getAs[Double]("cond_p")).sum <= 1.0 + 1e-12)
    }
    // spot-check the single most frequent bigram against a direct count
    val top = rows.maxBy(_.getAs[Long]("n"))
    val toks = docs.selectExpr("split(trim(lower(text)), '\\\\s+') AS t")
      .selectExpr("explode(zip_with(slice(t, 1, greatest(size(t)-1, 0)), " +
        "slice(t, 2, greatest(size(t)-1, 0)), (a, b) -> struct(a AS w1, b AS w2))) AS x")
      .filter(col("x.w1") === top.getString(0) && col("x.w2") === top.getString(1))
      .count()
    assert(top.getAs[Long]("n") === toks)
  }

  test("contamination audit covers every eval doc; spot doc agrees with direct check") {
    import graft.ops.{DedupOps, TextOps}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q102Contamination(spark, TestSpark.sf).collect()
    val nEval = docs.filter(TextOps.splitAssign(col("text")) === "eval").count()
    assert(rows.length === nEval)
    rows.foreach { r =>
      val (g, h) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))
      assert(h >= 0 && h <= g)
      assert(r.getAs[Double]("contaminated_share") === h.toDouble / g)
    }
    // corpus plants near-dups, so some eval doc must hit train grams
    assert(rows.exists(_.getAs[Long]("n_hit") > 0))
    // direct recheck of the most contaminated doc
    graft.functions.GraftFunctions.register(spark)
    val top = rows.maxBy(r => (r.getAs[Double]("contaminated_share"), r.getAs[Long]("doc_id")))
    val withSplit = docs.select(col("doc_id"),
      TextOps.splitAssign(col("text")).as("split"),
      array_distinct(DedupOps.shingles(col("text"))).as("grams"))
    val trainGrams = withSplit.filter(col("split") === "train")
      .select(explode(col("grams")).as("gram")).distinct()
    val docGrams = withSplit.filter(col("doc_id") === top.getAs[Long]("doc_id"))
      .select(explode(col("grams")).as("gram"))
    assert(docGrams.join(trainGrams, Seq("gram"), "left_semi").count()
      === top.getAs[Long]("n_hit"))
  }
}
