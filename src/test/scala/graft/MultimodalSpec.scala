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

  test("BMP codec roundtrip: known pixels, padding strides, corrupt rejection") {
    // 2x2, distinct channels per pixel — catches BGR/RGB and row-order bugs
    val px = Map((0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60),
      (0, 1) -> (70, 80, 90), (1, 1) -> (100, 110, 120))
    val bmp = MultimodalOps.encodeBmp24(2, 2, (x, y) => px((x, y)))
    assert(bmp.length === 54 + 2 * (6 + 2)) // 3*2=6 row bytes + 2 pad
    val (w, h, np, sb, sg, sr) = MultimodalOps.decodeBmp24(bmp)
    assert((w, h, np) === ((2, 2, 4L)))
    assert(sb === 10 + 40 + 70 + 100)
    assert(sg === 20 + 50 + 80 + 110)
    assert(sr === 30 + 60 + 90 + 120)
    // every stride-padding residue (3w % 4 = 0..3) decodes exactly
    (1 to 4).foreach { w2 =>
      val b2 = MultimodalOps.encodeBmp24(w2, 3, (x, y) => (x + 1, y + 1, 7))
      val (dw, dh, n2, b, g, r) = MultimodalOps.decodeBmp24(b2)
      assert((dw, dh, n2) === ((w2, 3, w2 * 3L)))
      assert(b === (1 to w2).sum * 3L) // sum of (x+1) over rows
      assert(g === (1 + 2 + 3) * w2.toLong)
      assert(r === 7L * w2 * 3)
    }
    // a non-BMP blob must fail loudly, never decode silently
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp24("definitely not a bitmap, much too short padding".getBytes)
    }
    // a truncated BMP must fail loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp24(bmp.take(bmp.length - 4))
    }
  }

  test("WAV codec roundtrip: known samples, chunk-skip robustness, corrupt rejection") {
    // stereo, asymmetric channels — catches interleave-order bugs
    val wav = MultimodalOps.encodeWavPcm16(8000, 2, 3,
      (ch, i) => if (ch == 0) (i + 1) * 10 else -(i + 1))
    assert(wav.length === 44 + 2 * 2 * 3)
    val (sr, nch, ns, s0, sa) = MultimodalOps.decodeWavPcm16(wav)
    assert((sr, nch, ns) === ((8000, 2, 3L)))
    assert(s0 === 10L + 20 + 30)
    assert(sa === 60L - 1 - 2 - 3)
    // negative samples must sign-extend, not zero-extend
    val neg = MultimodalOps.encodeWavPcm16(16000, 1, 4, (_, _) => -32768)
    assert(MultimodalOps.decodeWavPcm16(neg)._5 === -32768L * 4)
    // a REAL parser walks chunks: an unknown chunk before data must be
    // skipped (including RIFF's odd-size pad byte), not break the decode
    def withExtraChunk(bytes: Array[Byte], size: Int): Array[Byte] = {
      val chunk = java.nio.ByteBuffer.allocate(8 + size + size % 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      chunk.put("LIST".getBytes("US-ASCII")).putInt(size)
      val out = java.nio.ByteBuffer.allocate(bytes.length + chunk.capacity())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(bytes, 0, 12).put(chunk.array()).put(bytes, 12, bytes.length - 12)
      // fix the RIFF size for the inserted bytes
      out.putInt(4, bytes.length - 8 + chunk.capacity())
      out.array()
    }
    Seq(6, 7).foreach { sz => // even AND odd chunk sizes
      val (sr2, nch2, ns2, s02, sa2) =
        MultimodalOps.decodeWavPcm16(withExtraChunk(wav, sz))
      assert((sr2, nch2, ns2, s02, sa2) === ((8000, 2, 3L, 60L, 54L)))
    }
    // non-WAV and truncated blobs must fail loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWavPcm16("RIFFxxxxNOPE definitely not audio data".getBytes)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWavPcm16(wav.take(wav.length - 2))
    }
    // a crafted chunk size near Int.MaxValue must hit the designed
    // overrun require, not wrap negative past an Int bound check
    val crafted = wav.clone()
    val cb = java.nio.ByteBuffer.wrap(crafted).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cb.putInt(16, 0x7FFFFFF0) // fmt chunk size
    val ex = intercept[IllegalArgumentException] {
      MultimodalOps.decodeWavPcm16(crafted)
    }
    assert(ex.getMessage.contains("overruns"), ex.getMessage)
  }

  test("q200 decodes the corpus audio: shapes match metadata, sums match the recurrence") {
    val rows = MultimodalOps.q200AudioPcm(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docId = r.getLong(0)
      val (ns, nch) = MultimodalOps.docWavShape(docId)
      assert(r.getInt(1) === 44 + 2 * nch * ns)
      assert(r.getInt(2) === 16000)
      assert(r.getInt(3) === nch)
      assert(r.getLong(4) === ns.toLong)
      assert(docId % 3 === 1)
    }
  }

  test("q44 decodes the corpus images: dims match metadata, sums match tones") {
    val got = MultimodalOps.q44MultimodalFeatures(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    val meta = MultimodalOps.mediaTable(spark, TestSpark.sf)
      .filter(col("media_type") === "image")
      .select("doc_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val nChars = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[Int]("img_w"), r.getAs[Int]("img_h")) === meta(id))
      val (w, h) = meta(id)
      val (g1, g2) = (nChars(id) % 256, (nChars(id) * 7 + 13) % 256)
      val ne = (w.toLong * h + 1) / 2; val no = w.toLong * h - ne
      assert(r.getAs[Long]("sum_b") === g1 * ne + g2 * no, s"doc $id")
      assert(r.getAs[Long]("sum_g") ===
        ((g1 + 85) % 256) * ne + ((g2 + 85) % 256) * no, s"doc $id")
    }
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

  test("PNG codec: filtered roundtrip, real-deflate decode, CRC/corruption rejection") {
    // helper: PNG chunk with a real CRC32, as the decoder demands
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = data.length
      out.write((len >> 24) & 0xFF); out.write((len >> 16) & 0xFF)
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, len)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
      out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
      out.toByteArray
    }
    // 7x6: six rows exercise ALL five filter types (y % 5 = 0..4, 0);
    // distinct channels + both-axis gradient stress Sub/Up/Average/Paeth
    def px(x: Int, y: Int) = (x * 13 + y * 29, (x * 7 + y * 3 + 128) % 256, 255 - x * 11 - y * 5)
    val png = MultimodalOps.encodePngRgb(7, 6, px)
    val want = {
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 6; x <- 0 until 7) {
        val (r, g, b) = px(x, y); sr += r & 0xFF; sg += g & 0xFF; sb += b & 0xFF
      }
      (7, 6, 42L, sr, sg, sb)
    }
    assert(MultimodalOps.decodePngRgb(png) === want)
    // container size arithmetic: 68 + h*(1+3w) for a single stored block
    assert(png.length === 68 + 6 * (1 + 3 * 7))
    // the SAME pixel tuples through the BMP codec give the SAME per-
    // position sums: encodeBmp24's callback is (b, g, r), so its blue
    // sum is the PNG's red sum and vice versa
    val bmp = MultimodalOps.decodeBmp24(MultimodalOps.encodeBmp24(7, 6, px))
    assert((bmp._4, bmp._5, bmp._6) === ((want._4, want._5, want._6)))
    // REAL deflate (not stored blocks) must decode identically: inflate
    // the raster, re-deflate with java.util.zip, rebuild the container
    val ihdrData = java.util.Arrays.copyOfRange(png, 16, 29)
    val idatLen = java.nio.ByteBuffer.wrap(png, 33, 4).getInt
    val zlibData = java.util.Arrays.copyOfRange(png, 41, 41 + idatLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(zlibData)
    val raw = new Array[Byte](6 * (1 + 21))
    assert(inf.inflate(raw) === raw.length); inf.end()
    val deflated = {
      val d = new java.util.zip.Deflater(9)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val sig = java.util.Arrays.copyOfRange(png, 0, 8)
    val rebuilt = sig ++ chunk("IHDR", ihdrData) ++
      chunk("tEXt", "comment".getBytes("US-ASCII")) ++ // ancillary: skipped
      chunk("IDAT", deflated) ++ chunk("IEND", Array.emptyByteArray)
    assert(MultimodalOps.decodePngRgb(rebuilt) === want)
    // corruption: a flipped IDAT byte fails the CRC check loudly
    val corrupt = png.clone(); corrupt(45) = (corrupt(45) ^ 0x40).toByte
    intercept[IllegalArgumentException] { MultimodalOps.decodePngRgb(corrupt) }
    // truncation and non-PNG blobs fail loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngRgb(png.take(png.length - 6))
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodePngRgb("not a portable network graphic at all".getBytes)
    }
  }

  test("q210 decodes the corpus PNGs: dims, sizes, and gradient sums tie out") {
    val got = MultimodalOps.q210PngDecode(spark, TestSpark.sf).collect()
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length === docs.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = MultimodalOps.docPngDims(id)
      assert((r.getAs[Int]("img_w"), r.getAs[Int]("img_h")) === ((w, h)))
      assert(r.getAs[Int]("n_bytes") === 68 + h * (1 + 3 * w))
      // spot-recompute one doc's sums from the gradient definition
      if (id == got.head.getAs[Long]("doc_id")) {
        var sr = 0L; var sg = 0L; var sb = 0L
        for (x <- 0 until w; y <- 0 until h) {
          val v = ((docs(id) + 7L * x + 11L * y + id) % 256).toInt
          sr += v; sg += (v + 85) % 256; sb += (v + 170) % 256
        }
        assert((r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"),
          r.getAs[Long]("sum_b")) === ((sr, sg, sb)))
      }
    }
  }

  test("dHash kernel: extremes, bit numbering, tone-wrap invariance, rejection") {
    def hex(hl: (Int, Int)): String = f"${hl._1}%08x${hl._2}%08x"
    // 9x8 identity sampling grid: sx(i) = i, sy(j) = j
    // left-to-right gradient -> every neighbor comparison increases -> all 1s
    val grad = MultimodalOps.encodeBmp24(9, 8, (x, _) => (x * 20, x * 20, x * 20))
    assert(hex(MultimodalOps.dhashBmp24(grad)) === "ffffffffffffffff")
    // flat raster -> no comparison strictly increases -> all 0s
    val flat = MultimodalOps.encodeBmp24(9, 8, (_, _) => (7, 7, 7))
    assert(hex(MultimodalOps.dhashBmp24(flat)) === "0000000000000000")
    // gradient confined to TOP-DOWN row 0 pins bit numbering (k = j*8+i)
    // AND the bottom-up storage order: bits 0..7 only -> ...000000ff
    val row0 = MultimodalOps.encodeBmp24(9, 8,
      (x, y) => if (y == 0) (x * 20, x * 20, x * 20) else (0, 0, 0))
    assert(hex(MultimodalOps.dhashBmp24(row0)) === "00000000000000ff")
    // tones wrap mod 256: n_chars and n_chars + 256 build identical rasters
    val a = MultimodalOps.makeDocBmp(12L, 100L)
    val b = MultimodalOps.makeDocBmp(12L, 356L)
    assert(hex(MultimodalOps.dhashBmp24(a)) === hex(MultimodalOps.dhashBmp24(b)))
    // shares the BMP validation path: corrupt blobs fail loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.dhashBmp24("nowhere near a bitmap but padded long enough".getBytes)
    }
  }

  test("q205: one row per image; clusters consistent and hash-keyed") {
    val got = MultimodalOps.q205ImageDhash(spark, TestSpark.sf)
    val nImages = MultimodalOps.mediaTable(spark, TestSpark.sf)
      .filter(col("media_type") === "image").count()
    assert(got.count() === nImages)
    // cluster_first is the min doc_id of the hash group, size ties out
    val bad = got.groupBy("dhash_hex")
      .agg(min("doc_id").as("exp_first"), count(lit(1)).as("exp_size"),
        first("cluster_first").as("got_first"), first("cluster_size").as("got_size"),
        countDistinct("cluster_first").as("n_first"), countDistinct("cluster_size").as("n_size"))
      .filter(col("exp_first") =!= col("got_first") || col("exp_size") =!= col("got_size") ||
        col("n_first") =!= 1 || col("n_size") =!= 1)
    assert(bad.count() === 0)
    // every hash is 16 lowercase hex chars
    assert(got.filter(!col("dhash_hex").rlike("^[0-9a-f]{16}$")).count() === 0)
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

  test("resizeSumsBmp24: NN 2x downsample picks exactly the even image coordinates") {
    // asymmetric dims incl. odd sizes and stride padding; pixel values
    // encode their own coordinates so any sampling slip is visible
    for ((w, h) <- Seq((5, 3), (4, 4), (7, 6), (1, 1), (2, 5))) {
      val px = (x: Int, y: Int) => (x + 1, y + 1, 10 * (y + 1) + (x + 1))
      val bmp = MultimodalOps.encodeBmp24(w, h, px)
      val (iw, ih, ow, oh, sb, sg, sr) = MultimodalOps.resizeSumsBmp24(bmp)
      assert((iw, ih) === ((w, h)))
      assert(ow === (w + 1) / 2 && oh === (h + 1) / 2)
      val sampled = for (oy <- 0 until oh; ox <- 0 until ow)
        yield px(2 * ox, 2 * oy)
      assert(sb === sampled.map(_._1.toLong).sum)
      assert(sg === sampled.map(_._2.toLong).sum)
      assert(sr === sampled.map(_._3.toLong).sum)
    }
  }
}
