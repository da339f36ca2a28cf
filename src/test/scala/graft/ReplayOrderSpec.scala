package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the file-delivery mechanism the multi-batch stream-replay mode
  * (graft.streaming.Replay) is built on: a directory of parquet slices
  * streamed with `maxFilesPerTrigger=1` under `Trigger.AvailableNow`
  * must arrive as ONE FILE PER MICRO-BATCH, in slice order, when both
  * candidate orderings (file name and modification time) agree — which
  * is exactly the discipline ReplayStage enforces (`slice-%03d` names
  * with strictly increasing mtimes, sentinel files renamed to sort and
  * date after every slice). If a Spark upgrade changes the source's
  * listing order or stops honoring the limit under AvailableNow, this
  * fails before any replay-gate artifact can go quietly stale. */
class ReplayOrderSpec extends AnyFunSuite {

  test("sliced dir streams one file per batch, oldest slice first") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_order")
    val n = 4
    // write each slice as a single file named+dated in slice order;
    // values identify the slice so batch contents reveal delivery order
    (0 until n).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_order_w$i")
      Seq(i.toLong).toDF("v").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = dir.resolve(f"slice-$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      assert(dest.toFile.setLastModified(1700000000000L + i * 60000L))
      FsUtil.deleteRec(tmp)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val q = spark.readStream
      .schema(StructType(Seq(StructField("v", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val vs = df.select(col("v")).collect().map(_.getLong(0)).toSeq
        batches.synchronized { batches += ((id, vs)) }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    FsUtil.deleteRec(dir)
    val nonEmpty = batches.sortBy(_._1).map(_._2).filter(_.nonEmpty)
    assert(nonEmpty.size == n,
      s"expected $n one-file micro-batches, got: $batches")
    assert(nonEmpty.flatten == (0 until n).map(_.toLong),
      s"slices arrived out of order: $batches")
  }
}
