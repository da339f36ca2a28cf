package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Source/sink coverage: every format the engine supports round-trips, and
  * partitioned writes prune at read time (the 100 TB layout story: partition
  * columns are the first-level index). */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_src").toString

  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")

  test("csv roundtrip preserves rows (header + schema)") {
    val dir = tmp() + "/csv"
    docs.select("doc_id", "lang", "n_chars").write
      .option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() === docs.count())
    assert(back.columns.toSeq === Seq("doc_id", "lang", "n_chars"))
  }

  test("json roundtrip preserves rows and values") {
    val dir = tmp() + "/json"
    docs.select("doc_id", "text", "lang").write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === docs.count())
    val orig = docs.select(sum(length(col("text")))).head.getLong(0)
    assert(back.select(sum(length(col("text")))).head.getLong(0) === orig)
  }

  test("xml roundtrip preserves rows (Spark 4 native xml source)") {
    val dir = tmp() + "/xml"
    docs.select("doc_id", "lang", "n_chars").write
      .option("rootTag", "docs").option("rowTag", "doc").format("xml").save(dir)
    val back = spark.read.option("rowTag", "doc").format("xml").load(dir)
    assert(back.count() === docs.count())
    assert(back.columns.sorted.toSeq === Seq("doc_id", "lang", "n_chars"))
  }

  test("orc roundtrip preserves rows") {
    val dir = tmp() + "/orc"
    docs.write.orc(dir)
    assert(spark.read.orc(dir).count() === docs.count())
  }

  test("partitioned parquet write prunes partitions at read") {
    val dir = tmp() + "/part"
    docs.write.partitionBy("lang").parquet(dir)
    val langs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(langs.length >= 2)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    // partition filter must reach the scan, not a post-scan Filter
    val plan = q.queryExecution.executedPlan
    val scan = plan.collectFirst { case s: FileSourceScanExec => s }
      .orElse(plan.collectFirst { case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst { case s: FileSourceScanExec => s } }.flatten)
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty)
    val expected = docs.filter(col("lang") === "en").count()
    assert(q.count() === expected)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val orders = Tables.load(spark, TestSpark.sf, "orders").select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, TestSpark.sf, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_bucketed")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() === li.count()) // FK join preserves fact rows
      val planStr = j.queryExecution.executedPlan.toString
      assert(!planStr.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$planStr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("single-file sink contract (coalesce(1)) produces exactly one part file") {
    val dir = tmp() + "/single"
    docs.limit(10).coalesce(1).write.parquet(dir)
    val parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts === 1)
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    import spark.implicits._
    // batch 1 predates the `score` column; batch 2 added it — the evolved
    // read must union the schemas and null-fill the old batch, which is
    // what lets an ingest pipeline add columns without rewriting history
    val dir = tmp() + "/evolving"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    assert(merged.count() === 3)
    assert(merged.filter(col("score").isNull).count() === 2)
    assert(merged.filter(col("id") === 3).head.getAs[Double]("score") === 9.5)
  }

  test("csv malformed-row modes: PERMISSIVE nulls+captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_malformed").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/rows.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\nbroken_line_only\n4,40\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the default): bad fields become NULL, the raw line is
    // captured in the corrupt-record column, every row survives
    val permissive = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(dir).cache()
    assert(permissive.count() === 5)
    val corrupt = permissive.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).sorted
    assert(corrupt.toSeq === Seq("2,notanumber", "broken_line_only"))
    assert(permissive.filter(col("id") === 2).head.isNullAt(1))
    // DROPMALFORMED: the two bad rows vanish
    val dropped = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(dir)
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
    // FAILFAST: the first bad row aborts the read
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.dropRight(1)))
        .option("header", "true").option("mode", "FAILFAST")
        .csv(dir).collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("malformed") ||
      Option(thrown.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
