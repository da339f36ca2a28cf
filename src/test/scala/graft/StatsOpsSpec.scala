package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{SimilarityOps, StatsOps}

class StatsOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("percentiles are ordered p25 <= p50 <= p75 <= p90") {
    val bad = StatsOps.q45Percentiles(spark, sf)
      .filter(col("p25") > col("p50") || col("p50") > col("p75") || col("p75") > col("p90"))
    assert(bad.count() === 0)
  }

  test("approx_count_distinct within 2% of exact") {
    val approx = StatsOps.q52ApproxDistinct(spark, sf)
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val joined = approx.join(exact, "l_returnflag")
      .withColumn("err", abs(col("approx_parts") - col("exact_parts")) / col("exact_parts"))
    assert(joined.filter(col("err") > 0.02).count() === 0)
  }

  test("UDAF stats agree with built-in aggregates") {
    val udafOut = StatsOps.q50Udaf(spark, sf)
    val builtin = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("c"), sum("l_quantity").as("s"),
        min("l_quantity").as("mn"), max("l_quantity").as("mx"))
    val diff = udafOut.join(builtin, "l_returnflag")
      .filter(col("n_rows") =!= col("c") || col("sum_qty") =!= col("s") ||
        col("min_qty") =!= col("mn") || col("max_qty") =!= col("mx"))
    assert(diff.count() === 0)
  }

  test("pivot cells sum to the group totals") {
    val p = StatsOps.q48Pivot(spark, sf)
      .withColumn("total", col("F") + col("O") + col("P"))
    val g = Tables.load(spark, sf, "orders").groupBy("o_orderpriority").count()
    val diff = p.join(g, "o_orderpriority").filter(col("total") =!= col("count"))
    assert(diff.count() === 0)
  }

  test("native cosine expression == composed higher-order form") {
    val native = SimilarityOps.q53CosineTopKNative(spark, sf).collect()
    val composed = SimilarityOps.q40CosineTopK(spark, sf).collect()
    assert(native.map(_.toSeq).toSeq === composed.map(_.toSeq).toSeq)
  }

  test("graft_cosine accepts raw float embeddings in SQL (builder inserts the cast)") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("embeddings")
    val self = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM embeddings LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("native cosine survives codegen (no fallback errors) and scores correctly") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 5.0))).toDF("a", "b")
      .withColumn("cos", call_function("graft_cosine", col("a"), col("b")))
    val vals = df.select("cos").as[Double].collect()
    assert(math.abs(vals(0) - 1.0) < 1e-12)
    assert(math.abs(vals(1)) < 1e-12)
  }
}
