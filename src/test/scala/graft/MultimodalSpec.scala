package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("frame dedup: ASCII oracle premise holds; planted shared frame is found") {
    // the oracle slices VARCHARs — valid only while byte == char length
    val bad = Tables.load(spark, TestSpark.sf, "documents")
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(bad === 0L)
    // two synthetic videos sharing exactly their first 64-byte frame
    val media = Seq(
      (2L, "video", ("x" * 64 + "a" * 64).getBytes("UTF-8"), 64, 64),
      (5L, "video", ("x" * 64 + "b" * 32).getBytes("UTF-8"), 64, 64)
    ).toDF("doc_id", "media_type", "content", "width", "height")
    val dup = MultimodalOps.sampleFrames(spark, media).toDF()
      .select(col("doc_id"), md5(col("frame_bytes")).as("fp"))
      .groupBy("fp").agg(countDistinct("doc_id").as("nv"))
      .filter(col("nv") > 1).collect()
    assert(dup.length === 1)
    // the real corpus exercises the operator end to end
    val got = MultimodalOps.q153FrameDedup(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("n_videos") >= 2))
  }

  test("decode stub is deterministic and shape-stable") {
    val b = "hello world".getBytes("UTF-8")
    val f1 = MultimodalOps.decodeStub(b)
    val f2 = MultimodalOps.decodeStub(b)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 8)
  }

  test("feature extraction preserves row count and byte lengths") {
    val media = MultimodalOps.mediaTable(spark, TestSpark.sf)
    val feats = MultimodalOps.extractFeatures(spark, media)
    assert(feats.count() === media.count())
    val joined = feats.toDF().join(
      media.select(col("doc_id"), octet_length(col("content")).as("expected_bytes")),
      "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("expected_bytes")).count() === 0)
  }

  test("resize stub shrinks images by the factor, leaves other media intact") {
    val media = MultimodalOps.mediaTable(spark, TestSpark.sf)
    val resized = MultimodalOps.resizeImages(spark, media, factor = 4)
    val joined = resized.toDF()
      .select(col("doc_id"), col("media_type").as("mt"),
        octet_length(col("content")).as("new_len"), col("width").as("new_w"))
      .join(media.select(col("doc_id"), octet_length(col("content")).as("old_len"),
        col("width").as("old_w")), "doc_id")
    val badImages = joined.filter(col("mt") === "image" &&
      (col("new_len") =!= ceil(col("old_len") / 4.0) || col("new_w") =!= (col("old_w") / 4).cast("int")))
    assert(badImages.count() === 0)
    val badOthers = joined.filter(col("mt") =!= "image" && col("new_len") =!= col("old_len"))
    assert(badOthers.count() === 0)
  }

  test("frame sampling: only video rows, ceil(len/stride) frames each") {
    val media = MultimodalOps.mediaTable(spark, TestSpark.sf)
    val frames = MultimodalOps.sampleFrames(spark, media, stride = 64)
    val videos = media.filter(col("media_type") === "video")
      .select(col("doc_id"), octet_length(col("content")).as("len"))
    val counts = frames.groupBy("doc_id").count()
      .join(videos, "doc_id")
      .withColumn("expected", ceil(col("len") / 64.0))
    assert(counts.filter(col("count") =!= col("expected")).count() === 0)
    // no non-video rows leaked in
    val nonVideo = frames.toDF().join(
      media.filter(col("media_type") =!= "video").select("doc_id"), "doc_id")
    assert(nonVideo.count() === 0)
  }
}
