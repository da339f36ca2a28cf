package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE KERNELS ARE STUBS —
  * `decodeStub` derives a deterministic fake feature vector from the bytes.
  * Everything around them is real Spark plumbing and is what matters at
  * scale: binary columns travel in parquet row groups, the decode stage is a
  * typed mapPartitions (the Scala analogue of mapInPandas: one executor call
  * per batch of rows, where a JNI/codec library would be initialized once per
  * partition), frame sampling is a 1->N flatMap, and nothing ever collects
  * to the driver.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Build a media table from `documents`: text bytes stand in for the blob
    * (binary column + metadata columns), media_type assigned round-robin. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 64 + 64).cast("int").as("height"))

  /** STUB decode kernel — stands in for an image/audio decoder (libraries not
    * present in this container). Deterministic: folds the bytes into an
    * 8-float "feature". A real implementation swaps ONLY this function. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Decode stage: typed mapPartitions so a real codec could be initialized
    * once per partition (the expensive part at scale) and reused per row. */
  def extractFeatures(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real pipeline: val codec = Codec.open() here, once per partition
      rows.map { m =>
        MediaFeatures(m.doc_id, m.media_type, m.content.length,
          decodeStub(m.content))
      }
    }
  }

  /** STUB resize kernel — deterministic byte-space downsample standing in
    * for an image resize (keeps every `factor`-th byte). Like decodeStub,
    * only this function changes when a real codec is available; the Spark
    * plumbing around it stays. */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Resize stage for "image" rows (typed map, same partition-local shape
    * as extractFeatures). */
  def resizeImages(s: SparkSession, media: DataFrame, factor: Int = 4): Dataset[MediaRow] = {
    import s.implicits._
    media.as[MediaRow].map { m =>
      if (m.media_type == "image")
        m.copy(content = resizeStub(m.content, factor),
          width = m.width / factor, height = m.height / factor)
      else m
    }
  }

  /** Frame sampling for "video" rows: 1->N flatMap slicing the blob into
    * fixed-stride chunks (a real sampler would seek keyframes). */
  def sampleFrames(s: SparkSession, media: DataFrame, stride: Int = 64): Dataset[Frame] = {
    import s.implicits._
    media.as[MediaRow].filter(_.media_type == "video").flatMap { m =>
      m.content.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        Frame(m.doc_id, i, chunk)
      }
    }
  }

  // ---------------------------------------------------------------- q43
  /** Metadata layer of the media table — fully oracle-checkable (byte
    * lengths and type assignment don't need the stub). */
  def q43MultimodalMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"), col("media_type"),
      octet_length(col("content")).as("n_bytes"),
      col("width"), col("height"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q44
  /** Decode + feature stage output (stub kernel → rows-only check). */
  def q44MultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(s, mediaTable(s, d))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------------
  // ---------------------------------------------------------------- q153
  /** CROSS-VIDEO FRAME DEDUP — the video-corpus analogue of q30's exact
    * text dedup: fingerprint every sampled frame and surface fingerprints
    * that appear in MORE THAN ONE video (shared intros, re-uploads,
    * stock-footage reuse). Runs through the REAL multimodal plumbing —
    * [[mediaTable]] binary blobs → [[sampleFrames]]' typed 1→N flatMap —
    * then shuffles only (16-byte fingerprint, doc_id) pairs; frame BYTES
    * never cross the exchange. In a production pipeline the fingerprint
    * swaps from md5-of-bytes to a perceptual hash computed in the same
    * flatMap — the plan does not change.
    *
    * Exact oracle: the blob is the document's UTF-8 bytes and the corpus
    * is pure ASCII (driver-generated), so DuckDB's VARCHAR substring
    * reproduces the byte slicing exactly and md5(chunk) matches
    * md5(frame_bytes) — the multimodal family's first content-level (not
    * metadata-level) exact check. */
  def q153FrameDedup(s: SparkSession, d: String, top: Int = 25): DataFrame = {
    sampleFrames(s, mediaTable(s, d)).toDF()
      .select(col("doc_id"), md5(col("frame_bytes")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct("doc_id").as("n_videos"),
        min("doc_id").as("first_video"))
      .filter(col("n_videos") > 1)
      .orderBy(col("n_videos").desc, col("n_frames").desc, col("fp"))
      .limit(top)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_multimodal_meta" -> (q43MultimodalMeta _),
    "q44_multimodal_features" -> (q44MultimodalFeatures _),
    "q153_frame_dedup" -> ((s: SparkSession, d: String) => q153FrameDedup(s, d)))

  val oracle: Map[String, String] = Map(
    // frame slicing reproduced byte-for-byte via VARCHAR substring
    // (pure-ASCII corpus: octet_length == length, spec-asserted)
    "q153_frame_dedup" ->
      """WITH v AS (
        | SELECT doc_id, text AS b,
        |  CAST(ceil(length(text) / 64.0) AS BIGINT) AS nf
        | FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        | SELECT doc_id,
        |  md5(substring(b, CAST(u.i * 64 + 1 AS BIGINT), 64)) AS fp
        | FROM v, LATERAL unnest(range(0, nf)) u(i)),
        |d AS (
        | SELECT fp, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
        |  min(doc_id) AS first_video
        | FROM fr GROUP BY 1)
        |SELECT fp, n_frames, n_videos, first_video FROM d
        |WHERE n_videos > 1
        |ORDER BY n_videos DESC, n_frames DESC, fp LIMIT 25""".stripMargin,
    "q43_multimodal_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | CAST(doc_id % 8 * 64 + 64 AS INT) AS width,
        | CAST(doc_id % 4 * 64 + 64 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
