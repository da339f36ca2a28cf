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
}
