package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns + typed
  * metadata, with decode / feature-extract / frame-sample stages.
  *
  * The IMAGE path is REAL: image rows carry a valid 24-bit uncompressed BMP
  * (the one raster format a bare JVM can encode AND decode byte-exactly —
  * little-endian headers, bottom-up BGR rows, 4-byte row padding), built
  * deterministically from the document's metadata, and [[decodeBmp24]] is an
  * actual format decoder (magic/header validation, stride arithmetic,
  * per-channel pixel sums). The AUDIO path is REAL too: audio rows carry a
  * valid RIFF/WAVE 16-bit PCM file and [[decodeWavPcm16]] is an actual
  * chunk-walking parser (unknown chunks skipped, PCM fields validated,
  * interleaved int16 fold) — no declared stubs remain in the decode
  * kernels; `decodeStub`/`resizeStub` survive only as the generic
  * byte-space stand-ins for codecs this container lacks (JPEG, H.264),
  * exercising the plumbing shape. Everything around the
  * kernels is real Spark plumbing and is what matters at scale: binary
  * columns travel in parquet row groups, the decode stage is a typed
  * mapPartitions (the Scala analogue of mapInPandas: one executor call per
  * batch of rows, where a JNI/codec library would be initialized once per
  * partition), frame sampling is a 1->N flatMap, and nothing ever collects
  * to the driver.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])
  case class ImageStats(doc_id: Long, n_bytes: Int, img_w: Int, img_h: Int,
                        n_pixels: Long, sum_b: Long, sum_g: Long, sum_r: Long)

  // ------------------------------------------------------------- BMP codec
  /** Encode a REAL 24-bit BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    * (all little-endian), pixel rows bottom-up in BGR order, each row padded
    * to a 4-byte boundary. `pixel(x, y)` returns (b, g, r) for the TOP-DOWN
    * coordinate (x, y) — the encoder handles the bottom-up storage order. */
  def encodeBmp24(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid BMP dims ${w}x$h")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54)           // size, reserved, pixel offset
      .putInt(40).putInt(w).putInt(h)                       // header size, dims
      .putShort(1).putShort(24)                             // planes, bpp
      .putInt(0).putInt(dataSize)                           // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)        // 72 dpi, palette
    var y = h - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < w) {
        val (b, g, r) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Shared BMP header parse + validation: returns (w, h, pixel-data
    * offset, padded row stride). Both [[decodeBmp24]] and [[dhashBmp24]]
    * read the raster through this one geometry, so a header bug cannot
    * diverge between the stats and the perceptual-hash kernels. */
  private def bmpGeometry(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      s"not a BMP (len=${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val offset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(hdrSize >= 40 && planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP variant (hdr=$hdrSize planes=$planes bpp=$bpp comp=$compression)")
    require(w > 0 && h > 0, s"invalid dims ${w}x$h")
    val stride = w * 3 + (4 - (w * 3) % 4) % 4
    require(fileSize == bytes.length && offset + stride.toLong * h <= bytes.length,
      s"truncated BMP (declared $fileSize, actual ${bytes.length})")
    (w, h, offset, stride)
  }

  /** REAL BMP decoder — validates the magic, file size, plane/bpp fields,
    * honors the pixel-data offset and the padded row stride, and folds the
    * raster into per-channel sums. Fails loudly on anything that is not an
    * uncompressed 24-bit BMP: a corrupt blob must never decode silently. */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    val (w, h, offset, stride) = bmpGeometry(bytes)
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < h) {
      val base = offset + y * stride
      var x = 0
      while (x < w) {
        sb += bytes(base + 3 * x) & 0xFF
        sg += bytes(base + 3 * x + 1) & 0xFF
        sr += bytes(base + 3 * x + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    (w, h, w.toLong * h, sb, sg, sr)
  }

  /** Nearest-neighbor 2× DOWNSAMPLE of a 24-bit BMP — the real resize
    * kernel: walks the raster, samples the pixel at IMAGE coordinate
    * (2·ox, 2·oy) for every output cell (storage rows are bottom-up, so
    * image row iy lives at storage row h−1−iy), and accumulates the
    * downsampled per-channel sums. Output dims are ⌈w/2⌉ × ⌈h/2⌉ (origin
    * kept, the standard NN convention). On the test rasters every
    * sampled pixel has even linear index ((2oy)·w + 2ox is even), so the
    * sums have a CLOSED FORM the oracle states exactly — and any kernel
    * bug that samples odd offsets, flips orientation into odd rows, or
    * averages neighbors pulls g2-valued pixels and breaks the hash. */
  def resizeSumsBmp24(bytes: Array[Byte]): (Int, Int, Int, Int, Long, Long, Long) = {
    val (w, h, offset, stride) = bmpGeometry(bytes)
    val outW = (w + 1) / 2
    val outH = (h + 1) / 2
    var sb = 0L; var sg = 0L; var sr = 0L
    var oy = 0
    while (oy < outH) {
      val sRow = offset + (h - 1 - 2 * oy) * stride
      var ox = 0
      while (ox < outW) {
        sb += bytes(sRow + 6 * ox) & 0xFF
        sg += bytes(sRow + 6 * ox + 1) & 0xFF
        sr += bytes(sRow + 6 * ox + 2) & 0xFF
        ox += 1
      }
      oy += 1
    }
    (w, h, outW, outH, sb, sg, sr)
  }

  /** Perceptual DIFFERENCE HASH (dHash) of a 24-bit BMP — the standard
    * image near-dup fingerprint (resize to a 9×8 brightness grid, emit one
    * bit per horizontal neighbor comparison): bit k = j·8+i is set iff
    * gray(sample(i+1, j)) > gray(sample(i, j)), nearest-neighbor sampling
    * sx(i) = ⌊i·w/9⌋, sy(j) = ⌊j·h/8⌋ over TOP-DOWN coordinates, gray =
    * ⌊(b+g+r)/3⌋. Returned as (hi32, lo32) of the 64-bit hash — integer
    * arithmetic end to end, so the whole hash is engine-recomputable in
    * closed form for the deterministic test rasters. */
  def dhashBmp24(bytes: Array[Byte]): (Int, Int) = {
    val (w, h, offset, stride) = bmpGeometry(bytes)
    def gray(x: Int, y: Int): Int = {
      val base = offset + (h - 1 - y) * stride + 3 * x
      ((bytes(base) & 0xFF) + (bytes(base + 1) & 0xFF) + (bytes(base + 2) & 0xFF)) / 3
    }
    var hi = 0; var lo = 0
    var j = 0
    while (j < 8) {
      val y = j * h / 8
      var i = 0
      while (i < 8) {
        if (gray((i + 1) * w / 9, y) > gray(i * w / 9, y)) {
          val k = j * 8 + i
          if (k < 32) lo |= 1 << k else hi |= 1 << (k - 32)
        }
        i += 1
      }
      j += 1
    }
    (hi, lo)
  }

  // ------------------------------------------------------------- WAV codec
  /** Encode a REAL 16-bit PCM WAV: RIFF container ("RIFF" size "WAVE"),
    * canonical 16-byte "fmt " chunk (PCM tag 1), "data" chunk with
    * little-endian interleaved int16 frames. `sample(ch, i)` returns the
    * i-th sample of channel ch in [-32768, 32767]. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nSamples: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    require(channels > 0 && nSamples > 0, s"invalid WAV shape $channels ch x $nSamples")
    val dataSize = 2 * channels * nSamples
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      var ch = 0
      while (ch < channels) { buf.putShort(sample(ch, i).toShort); ch += 1 }
      i += 1
    }
    buf.array()
  }

  /** REAL WAV decoder — validates the RIFF/WAVE magic and the PCM format
    * fields, then WALKS THE CHUNK LIST generically (skipping unknown
    * chunks, honoring the odd-size pad byte RIFF mandates) to find fmt
    * and data — so a file with an extra LIST/INFO chunk still decodes,
    * and anything that is not 16-bit PCM fails loudly. Returns
    * (sampleRate, channels, nSamples, sum of channel 0, sum over all
    * channels) — integer-exact fold of the raster, the audio analogue of
    * [[decodeBmp24]]'s channel sums. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a RIFF/WAVE file (len=${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riffSize = buf.getInt(4)
    require(riffSize + 8 == bytes.length,
      s"truncated RIFF (declared ${riffSize + 8}, actual ${bytes.length})")
    var pos = 12
    var sampleRate = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      // bound check in Long: a crafted size near Int.MaxValue would wrap
      // `pos + 8 + size` negative and slip past an Int comparison
      require(size >= 0 && pos + 8L + size <= bytes.length,
        s"chunk '$id' overruns the file (size=$size at $pos)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          val tag = buf.getShort(pos + 8)
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          require(tag == 1 && bits == 16,
            s"unsupported WAV variant (tag=$tag bits=$bits)")
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => () // unknown chunk: skip (LIST, INFO, fact, ...)
      }
      pos += 8 + size + (size % 2) // RIFF pads odd chunks to even
    }
    require(channels > 0 && sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % (2 * channels) == 0,
      s"data size $dataLen not a whole number of $channels-channel frames")
    val nSamples = dataLen / (2 * channels)
    var sum0 = 0L; var sumAll = 0L
    var i = 0
    while (i < nSamples) {
      var ch = 0
      while (ch < channels) {
        val v = buf.getShort(dataOff + 2 * (i * channels + ch)).toLong
        if (ch == 0) sum0 += v
        sumAll += v
        ch += 1
      }
      i += 1
    }
    (sampleRate, channels, nSamples.toLong, sum0, sumAll)
  }

  // ------------------------------------------------------------- PNG codec
  /** Minimal REAL PNG encoder — 8-bit RGB (color type 2), no interlace:
    * PNG signature, IHDR/IDAT/IEND chunks with real CRC32s, scanlines
    * pre-compressed through a hand-written zlib stream of STORED deflate
    * blocks (bit-exact deterministic output, no codec-version dependence;
    * the decoder's Inflater accepts any conformant zlib, so real deflate
    * round-trips too — spec-proved). Each row y is filtered with type
    * y % 5, so every standard scanline filter (None/Sub/Up/Average/Paeth)
    * appears in every image taller than 4 rows and a decoder that fakes
    * the unfilter math cannot pass. */
  def encodePngRgb(w: Int, h: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid PNG dims ${w}x$h")
    val bpp = 3
    val stride = w * bpp
    // raw filtered scanline stream: [filter byte, filtered bytes...] per row
    val raw = new Array[Byte](h * (1 + stride))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < w) {
        val (r, g, b) = pixel(i, y)
        cur(i * 3) = r & 0xFF; cur(i * 3 + 1) = g & 0xFF; cur(i * 3 + 2) = b & 0xFF
        i += 1
      }
      val ft = y % 5
      val base = y * (1 + stride)
      raw(base) = ft.toByte
      var x = 0
      while (x < stride) {
        val left = if (x >= bpp) cur(x - bpp) else 0
        val up = if (y > 0) prev(x) else 0
        val ul = if (y > 0 && x >= bpp) prev(x - bpp) else 0
        val f = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - left
          case 2 => cur(x) - up
          case 3 => cur(x) - (left + up) / 2
          case 4 => cur(x) - paethPredictor(left, up, ul)
        }
        raw(base + 1 + x) = (f & 0xFF).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    // zlib stream: 0x78 0x01 header, stored (btype 00) blocks, adler32
    val zlib = new java.io.ByteArrayOutputStream()
    zlib.write(0x78); zlib.write(0x01)
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val last = off + n >= raw.length
      zlib.write(if (last) 1 else 0)
      zlib.write(n & 0xFF); zlib.write((n >> 8) & 0xFF)
      zlib.write(~n & 0xFF); zlib.write((~n >> 8) & 0xFF)
      zlib.write(raw, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    val a = adler.getValue
    zlib.write(((a >> 24) & 0xFF).toInt); zlib.write(((a >> 16) & 0xFF).toInt)
    zlib.write(((a >> 8) & 0xFF).toInt); zlib.write((a & 0xFF).toInt)
    // chunk assembly with real CRC32 over type+data
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >> 24) & 0xFF); out.write((len >> 16) & 0xFF)
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
      out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zlib.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** The Paeth predictor of the PNG spec (RFC 2083 §6.6). */
  private def paethPredictor(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG decoder — validates the 8-byte signature, walks the chunk
    * list verifying EVERY chunk's CRC32, reads IHDR (8-bit RGB non-
    * interlaced only, loud failure otherwise), concatenates IDAT data,
    * inflates the zlib stream through java.util.zip.Inflater (accepts any
    * conformant deflate, not just the encoder's stored blocks), then
    * UNFILTERS every scanline per its filter byte — the five standard
    * filters reconstructed per the spec — and folds the raster into
    * per-channel sums. The image analogue of [[decodeWavPcm16]]'s chunk
    * walk, with real entropy-coded payload on top. */
  def decodePngRgb(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long) = {
    require(bytes.length >= 8 + 12 + 13 &&
      (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte,
      s"not a PNG (len=${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (pos + 12 <= bytes.length && !sawEnd) {
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"chunk overruns the file (len=$len at $pos)")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == (buf.getInt(pos + 8 + len).toLong & 0xFFFFFFFFL),
        s"CRC mismatch in chunk '$typ'")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          w = buf.getInt(pos + 8); h = buf.getInt(pos + 12)
          val depth = bytes(pos + 16) & 0xFF
          val color = bytes(pos + 17) & 0xFF
          val interlace = bytes(pos + 20) & 0xFF
          require(depth == 8 && color == 2 && interlace == 0,
            s"unsupported PNG variant (depth=$depth color=$color interlace=$interlace)")
          require(w > 0 && h > 0, s"invalid dims ${w}x$h")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip (tEXt, pHYs, ...)
      }
      pos += 12 + len
    }
    require(w > 0 && sawEnd, "missing IHDR or IEND")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || !inf.needsInput, "truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"inflated $got of ${raw.length} raster bytes")
    // unfilter scanlines in place (recon bytes overwrite filtered bytes)
    val bpp = 3
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val ft = raw(base) & 0xFF
      require(ft <= 4, s"unknown filter type $ft on row $y")
      var x = 0
      while (x < stride) {
        val cur = raw(base + 1 + x) & 0xFF
        val left = if (x >= bpp) raw(base + 1 + x - bpp) & 0xFF else 0
        val up = if (y > 0) raw(base - stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) raw(base - stride + x - bpp) & 0xFF else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paethPredictor(left, up, ul)
        }
        raw(base + 1 + x) = (recon & 0xFF).toByte
        (x % 3: @unchecked) match {
          case 0 => sr += recon & 0xFF
          case 1 => sg += recon & 0xFF
          case 2 => sb += recon & 0xFF
        }
        x += 1
      }
      y += 1
    }
    (w, h, w.toLong * h, sr, sg, sb)
  }

  /** The deterministic PNG still each `video` document carries in q210:
    * dims and a three-phase gradient raster from (doc_id, n_chars) —
    * value v(x, y) = (n_chars + 7x + 11y + doc_id) mod 256 with the
    * channel offsets of [[makeDocBmp]], fully regenerable in SQL. The
    * gradient varies along BOTH axes so the Sub/Up/Average/Paeth filters
    * all see nonzero deltas. */
  private[graft] def docPngDims(docId: Long): (Int, Int) =
    (((docId % 6) * 5 + 5).toInt, ((docId % 5) * 4 + 4).toInt)

  private[graft] def makeDocPng(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = docPngDims(docId)
    encodePngRgb(w, h, (x, y) => {
      val v = ((nChars + 7L * x + 11L * y + docId) % 256).toInt
      (v, (v + 85) % 256, (v + 170) % 256)
    })
  }

  /** The deterministic audio each document carries: 16 kHz PCM16, mono or
    * stereo by doc_id parity, samples from an integer recurrence over
    * (doc_id, channel, index, n_chars) — closed-form recomputable in SQL,
    * so a decoder bug in chunk walking, interleave order, or sign
    * extension breaks the oracle. */
  private[graft] def docWavShape(docId: Long): (Int, Int) =
    (((docId % 8) * 64 + 64).toInt, (docId % 2 + 1).toInt) // (nSamples, channels)

  private[graft] def makeDocWav(docId: Long, nChars: Long): Array[Byte] = {
    val (ns, nch) = docWavShape(docId)
    encodeWavPcm16(16000, nch, ns, (ch, i) =>
      (((docId * 31 + ch * 17 + i.toLong * 7 + nChars) % 65536) - 32768).toInt)
  }

  /** The deterministic image each document carries: a small two-tone BMP
    * whose dims derive from doc_id and tones from n_chars. Channels are
    * OFFSET from each other (+85/+170 mod 256) so a BGR-vs-RGB misread or a
    * stride/padding bug shifts a channel sum and fails the oracle. */
  private[graft] def docImageDims(docId: Long): (Int, Int) =
    (((docId % 8) * 4 + 4).toInt, ((docId % 4) * 4 + 4).toInt)

  private[graft] def makeDocBmp(docId: Long, nChars: Long): Array[Byte] = {
    val (w, h) = docImageDims(docId)
    val g1 = (nChars % 256).toInt
    val g2 = ((nChars * 7 + 13) % 256).toInt
    encodeBmp24(w, h, (x, y) => {
      val v = if ((y * w + x) % 2 == 0) g1 else g2
      (v, (v + 85) % 256, (v + 170) % 256)
    })
  }

  /** Build a media table from `documents`: image rows carry a REAL BMP blob
    * (see [[makeDocBmp]] — metadata width/height are the actual raster
    * dims); audio rows carry a REAL PCM16 WAV (see [[makeDocWav]] —
    * width = sample count, height = channel count); video rows carry the
    * text bytes as an opaque stand-in blob. media_type round-robin. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    val bmpUdf = udf((docId: Long, nChars: Long) => makeDocBmp(docId, nChars))
    val wavUdf = udf((docId: Long, nChars: Long) => makeDocWav(docId, nChars))
    Tables.load(s, d, "documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        bmpUdf(col("doc_id"), col("n_chars")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          wavUdf(col("doc_id"), col("n_chars")))
        .otherwise(encode(col("text"), "UTF-8")).as("content"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        (pmod(col("doc_id"), lit(8)) * 4 + 4))
        .otherwise(pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        (pmod(col("doc_id"), lit(4)) * 4 + 4))
        .when(pmod(col("doc_id"), lit(3)) === 1, pmod(col("doc_id"), lit(2)) + 1)
        .otherwise(pmod(col("doc_id"), lit(4)) * 64 + 64).cast("int").as("height"))
  }

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
  /** REAL image decode stage: every image row's BMP blob is parsed by the
    * actual format decoder ([[decodeBmp24]] — header validation, stride
    * arithmetic, per-channel sums) inside a typed mapPartitions, the shape
    * under which a production pipeline initializes a codec once per
    * partition. EXACT oracle: the blob is generated deterministically from
    * (doc_id, n_chars), so DuckDB recomputes the expected dims, byte size
    * (54 + padded-stride × h) and channel sums in closed form — if the
    * decoder misreads dims, padding, channel order, or the pixel offset,
    * the roundtrip breaks and the hash fails. The audio analogue (q200,
    * [[decodeWavPcm16]]) closes the family's last declared stub. */
  def q44MultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "image").as[MediaRow]
      .mapPartitions { rows =>
        // real pipeline: codec init once per partition, reused per row
        rows.map { m =>
          val (w, h, np, sb, sg, sr) = decodeBmp24(m.content)
          ImageStats(m.doc_id, m.content.length, w, h, np, sb, sg, sr)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q244
  case class ResizeStats(doc_id: Long, in_w: Int, in_h: Int, out_w: Int,
                         out_h: Int, sum_b: Long, sum_g: Long, sum_r: Long)

  /** IMAGE RESIZE stage — the remaining multimodal verb (decode q44,
    * features q44/q205, frame-sample q153, audio q200): every image row's
    * BMP goes through the REAL decode + nearest-neighbor 2× downsample
    * kernel ([[resizeSumsBmp24]]) in the q44 mapPartitions shape, and the
    * downsampled dims + per-channel sums close the roundtrip against a
    * closed-form oracle (sampled pixels all carry the even-parity value,
    * so the sums are exactly g1-derived constants × the output pixel
    * count — a sampling-position or orientation bug pulls g2 pixels and
    * fails the hash). At 100 TB this is the thumbnail/feature-prep pass:
    * pure map-side, codec state per partition, no shuffle at all before
    * the audit ORDER BY. */
  def q244ImageResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, ow, oh, sb, sg, sr) = resizeSumsBmp24(m.content)
          ResizeStats(m.doc_id, w, h, ow, oh, sb, sg, sr)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q200
  case class AudioStats(doc_id: Long, n_bytes: Int, sample_rate: Int,
                        n_channels: Int, n_samples: Long, sum_ch0: Long,
                        sum_all: Long)

  /** REAL audio decode stage — the q44 contract for the audio rows, which
    * closes the multimodal family's LAST declared stub: every audio row's
    * WAV blob goes through the actual RIFF parser ([[decodeWavPcm16]] —
    * chunk walk, PCM validation, interleaved int16 fold) in the same
    * typed-mapPartitions shape as the image decoder. EXACT oracle: the
    * samples are an integer recurrence over (doc_id, channel, index,
    * n_chars), so DuckDB regenerates every sample with unnest(range(...))
    * and re-sums — a decoder bug in chunk offsets, channel interleave,
    * sign extension, or frame count breaks the hash. */
  def q200AudioPcm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val (sr, nch, ns, s0, sa) = decodeWavPcm16(m.content)
          AudioStats(m.doc_id, m.content.length, sr, nch, ns, s0, sa)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q210
  case class PngStats(doc_id: Long, n_bytes: Int, img_w: Int, img_h: Int,
                      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL PNG decode stage — the third real codec of the multimodal
    * family (BMP q44, WAV q200): every `video` document's deterministic
    * PNG still ([[makeDocPng]]) goes through the actual format decoder
    * ([[decodePngRgb]] — signature, per-chunk CRC32 verification, IHDR
    * validation, zlib INFLATE of the IDAT stream, and the five standard
    * scanline unfilters) in the same typed-mapPartitions shape as q44.
    * Unlike BMP/WAV this payload is entropy-coded: a decoder that skips
    * the inflate or fakes the Sub/Up/Average/Paeth reconstruction cannot
    * produce the sums. EXACT oracle: dims, byte size (stored-block zlib
    * makes the container size closed-form: 68 + h·(1+3w)) and channel
    * sums are regenerated in SQL from the (doc_id, n_chars) gradient. */
  def q210PngDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pngUdf = udf((docId: Long, nChars: Long) => makeDocPng(docId, nChars))
    Tables.load(s, d, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), pngUdf(col("doc_id"), col("n_chars")).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real pipeline: codec init once per partition, reused per row
        rows.map { case (docId, content) =>
          val (w, h, np, sr, sg, sb) = decodePngRgb(content)
          PngStats(docId, content.length, w, h, np, sr, sg, sb)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q205
  case class DhashRow(doc_id: Long, dhash_hex: String)

  /** IMAGE NEAR-DUP via PERCEPTUAL HASH — the image-corpus member of the
    * dedup family (q30 exact text / q153 frame fingerprints / q61
    * embedding): every image row's BMP raster goes through the REAL
    * [[dhashBmp24]] kernel (decode → 9×8 brightness grid → 64 neighbor
    * bits) in the same typed-mapPartitions shape as q44, then images
    * cluster by exact dHash equality — the zero-Hamming-distance tier of
    * perceptual dedup, which is what production image pipelines shuffle
    * FIRST (64-bit keys, never pixels; a Hamming-band tier would bucket
    * on hash bytes exactly like q37's SimHash chunks, same plan shape).
    *
    * EXACT oracle: the raster is deterministic from (doc_id, n_chars)
    * (two-tone parity pattern), so DuckDB recomputes every sampled
    * gray comparison closed-form — a bug in sampling arithmetic, row
    * order, channel weights, or bit packing breaks the hash. Scale: the
    * decode+hash is map-side; the cluster window partitions on the hash
    * key (well-spread by construction); output is one row per image. */
  def q205ImageDhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = mediaTable(s, d).filter(col("media_type") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val (hi, lo) = dhashBmp24(m.content)
          DhashRow(m.doc_id, f"$hi%08x$lo%08x")
        }
      }
      .toDF()
    val w = Window.partitionBy("dhash_hex")
    hashed
      .withColumn("cluster_first", min("doc_id").over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
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
    "q210_png_decode" -> (q210PngDecode _),
    "q244_image_resize" -> (q244ImageResize _),
    "q205_image_dhash" -> (q205ImageDhash _),
    "q43_multimodal_meta" -> (q43MultimodalMeta _),
    "q44_multimodal_features" -> (q44MultimodalFeatures _),
    "q200_audio_pcm" -> (q200AudioPcm _),
    "q153_frame_dedup" -> ((s: SparkSession, d: String) => q153FrameDedup(s, d)))

  val oracle: Map[String, String] = Map(
    // downsampled pixels all carry the even-parity g1 value, so sums are
    // closed-form constants x the output pixel count
    "q244_image_resize" ->
      """WITH m AS (
        | SELECT doc_id, CAST(doc_id % 8 * 4 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 4 * 4 + 4 AS BIGINT) AS h, n_chars % 256 AS g1
        | FROM documents WHERE doc_id % 3 = 0),
        |c AS (
        | SELECT doc_id, w, h, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh, g1
        | FROM m)
        |SELECT doc_id, CAST(w AS INT) AS in_w, CAST(h AS INT) AS in_h,
        | CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
        | g1 * ow * oh AS sum_b,
        | ((g1 + 85) % 256) * ow * oh AS sum_g,
        | ((g1 + 170) % 256) * ow * oh AS sum_r
        |FROM c ORDER BY doc_id""".stripMargin,
    // the PNG roundtrip: every gradient pixel regenerated and re-summed;
    // byte size from the stored-block zlib container arithmetic
    "q210_png_decode" ->
      """WITH p AS (
        | SELECT doc_id, n_chars,
        |  CAST(doc_id % 6 * 5 + 5 AS BIGINT) AS w,
        |  CAST(doc_id % 5 * 4 + 4 AS BIGINT) AS h
        | FROM documents WHERE doc_id % 3 = 2),
        |px AS (
        | SELECT doc_id, w, h,
        |  (n_chars + 7 * x.x + 11 * y.y + doc_id) % 256 AS v
        | FROM p, LATERAL unnest(range(w)) x(x), LATERAL unnest(range(h)) y(y)),
        |s AS (
        | SELECT doc_id, w, h,
        |  sum(v) AS sum_r,
        |  sum((v + 85) % 256) AS sum_g,
        |  sum((v + 170) % 256) AS sum_b
        | FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id,
        | CAST(68 + h * (1 + 3 * w) AS INT) AS n_bytes,
        | CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
        | w * h AS n_pixels,
        | CAST(sum_r AS BIGINT) AS sum_r,
        | CAST(sum_g AS BIGINT) AS sum_g,
        | CAST(sum_b AS BIGINT) AS sum_b
        |FROM s ORDER BY doc_id""".stripMargin,
    // the dHash roundtrip in closed form: the two-tone raster's gray at a
    // sampled (x, y) depends only on the parity of y·w + x, so each of the
    // 64 neighbor comparisons is integer CASE arithmetic; bit packing and
    // the %08x%08x rendering are re-derived exactly
    "q205_image_dhash" ->
      """WITH img AS (
        | SELECT doc_id,
        |  CAST(doc_id % 8 * 4 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 4 * 4 + 4 AS BIGINT) AS h,
        |  (n_chars % 256 + (n_chars % 256 + 85) % 256
        |    + (n_chars % 256 + 170) % 256) // 3 AS ge,
        |  ((n_chars * 7 + 13) % 256 + ((n_chars * 7 + 13) % 256 + 85) % 256
        |    + ((n_chars * 7 + 13) % 256 + 170) % 256) // 3 AS go
        | FROM documents WHERE doc_id % 3 = 0),
        |bits AS (
        | SELECT doc_id, CAST(j.j * 8 + i.i AS BIGINT) AS k,
        |  CASE WHEN
        |    (CASE WHEN ((j.j * h // 8) * w + ((i.i + 1) * w // 9)) % 2 = 0
        |          THEN ge ELSE go END)
        |    > (CASE WHEN ((j.j * h // 8) * w + (i.i * w // 9)) % 2 = 0
        |          THEN ge ELSE go END)
        |   THEN 1 ELSE 0 END AS b
        | FROM img, LATERAL unnest(range(8)) j(j), LATERAL unnest(range(8)) i(i)),
        |hx AS (
        | SELECT doc_id,
        |  sum(CASE WHEN k >= 32 THEN b * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS hi,
        |  sum(CASE WHEN k < 32 THEN b * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS lo
        | FROM bits GROUP BY doc_id),
        |hh AS (SELECT doc_id,
        |  printf('%08x%08x', CAST(hi AS BIGINT), CAST(lo AS BIGINT)) AS dhash_hex
        | FROM hx)
        |SELECT doc_id, dhash_hex,
        | min(doc_id) OVER (PARTITION BY dhash_hex) AS cluster_first,
        | CAST(count(*) OVER (PARTITION BY dhash_hex) AS BIGINT) AS cluster_size
        |FROM hh ORDER BY doc_id""".stripMargin,
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
    // image rows: BMP byte size = 54-byte headers + (3w padded to 4) * h;
    // audio rows: WAV byte size = 44-byte headers + 2 * channels * samples;
    // video rows: the raw text bytes
    "q43_multimodal_meta" ->
      """WITH m AS (
        | SELECT doc_id, text,
        |  CAST(doc_id % 8 * 4 + 4 AS BIGINT) AS bw,
        |  CAST(doc_id % 4 * 4 + 4 AS BIGINT) AS bh,
        |  CAST(doc_id % 8 * 64 + 64 AS BIGINT) AS ns,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS nch
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        | CAST(CASE WHEN doc_id % 3 = 0
        |      THEN 54 + (3 * bw + (4 - (3 * bw) % 4) % 4) * bh
        |      WHEN doc_id % 3 = 1 THEN 44 + 2 * nch * ns
        |      ELSE octet_length(encode(text)) END AS INT) AS n_bytes,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN bw
        |      ELSE doc_id % 8 * 64 + 64 END AS INT) AS width,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN bh
        |      WHEN doc_id % 3 = 1 THEN nch
        |      ELSE doc_id % 4 * 64 + 64 END AS INT) AS height
        |FROM m ORDER BY doc_id""".stripMargin,
    // the audio roundtrip: regenerate every sample from the integer
    // recurrence and re-sum — interleave/sign/offset bugs break the hash
    "q200_audio_pcm" ->
      """WITH a AS (
        | SELECT doc_id, n_chars,
        |  CAST(doc_id % 8 * 64 + 64 AS BIGINT) AS ns,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS nch
        | FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        | SELECT a.doc_id, a.ns, a.nch,
        |  ((a.doc_id * 31 + c.ch * 17 + u.i * 7 + a.n_chars) % 65536) - 32768 AS v,
        |  c.ch
        | FROM a, LATERAL unnest(range(a.ns)) u(i), LATERAL unnest(range(a.nch)) c(ch))
        |SELECT doc_id,
        | CAST(44 + 2 * nch * ns AS INT) AS n_bytes,
        | 16000 AS sample_rate,
        | CAST(nch AS INT) AS n_channels,
        | CAST(ns AS BIGINT) AS n_samples,
        | CAST(sum(v) FILTER (ch = 0) AS BIGINT) AS sum_ch0,
        | CAST(sum(v) AS BIGINT) AS sum_all
        |FROM s GROUP BY doc_id, nch, ns ORDER BY doc_id""".stripMargin,
    // the decode roundtrip in closed form: two-tone pixels alternate on the
    // linear index, so evens = ceil(w*h/2); channel sums follow from the
    // +85/+170 offsets; byte size from the padded stride
    "q44_multimodal_features" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(doc_id % 8 * 4 + 4 AS BIGINT) AS w,
        |  CAST(doc_id % 4 * 4 + 4 AS BIGINT) AS h,
        |  n_chars % 256 AS g1, (n_chars * 7 + 13) % 256 AS g2
        | FROM documents WHERE doc_id % 3 = 0),
        |c AS (
        | SELECT doc_id, w, h, w * h AS np,
        |  (w * h + 1) // 2 AS ne, (w * h) // 2 AS nodd, g1, g2
        | FROM m)
        |SELECT doc_id,
        | CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS INT) AS n_bytes,
        | CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
        | np AS n_pixels,
        | g1 * ne + g2 * nodd AS sum_b,
        | ((g1 + 85) % 256) * ne + ((g2 + 85) % 256) * nodd AS sum_g,
        | ((g1 + 170) % 256) * ne + ((g2 + 170) % 256) * nodd AS sum_r
        |FROM c ORDER BY doc_id""".stripMargin)
}
