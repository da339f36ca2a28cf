package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.IngestStream

class IngestStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("continuous csv ingest is incremental and exactly-once across drains") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_stream")
    val src = s"$root/src"; val dst = s"$root/dst"; val ckpt = s"$root/ckpt"

    def stage(rows: Seq[(Long, String, Double)], sub: String): Unit =
      TestSpark.writeSingleFile(rows.toDF("id", "name", "score"),
        s"$src/$sub.csv", format = "csv")

    stage(Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)), "batch1")
    IngestStream.drainCsvToParquet(spark, src, dst, ckpt, schema)
    assert(spark.read.parquet(dst).count() === 3)

    // second batch: only the new file is ingested
    stage(Seq((4L, "d", 4.5), (5L, "e", 5.5)), "batch2")
    IngestStream.drainCsvToParquet(spark, src, dst, ckpt, schema)
    val after = spark.read.parquet(dst)
    assert(after.count() === 5)
    // exactly-once: no id ingested twice
    assert(after.groupBy("id").count().filter(col("count") > 1).count() === 0)

    // idle drain: nothing new, nothing duplicated
    IngestStream.drainCsvToParquet(spark, src, dst, ckpt, schema)
    assert(spark.read.parquet(dst).count() === 5)
    // values survived the trip intact
    assert(spark.read.parquet(dst).agg(sum("score")).head.getDouble(0) === 17.5)
  }
}
