package graft.ingest

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Central-directory-driven zip ENTRY splits — the scale path past
  * [[ZipSource.expand]]'s one-task-per-archive shape (zip is not a
  * splittable format, so a single large archive otherwise serializes into
  * one task; reference main.rs:153-170 unzips driver-side and hits the
  * same wall one process earlier).
  *
  * How: the driver reads each archive's END-OF-CENTRAL-DIRECTORY record +
  * central directory only (one ranged read of <= ~64 KB + one of the
  * directory itself — never the archive body), yielding one split per
  * entry: (archive, entry, local header offset, compressed size, method).
  * Splits distribute round-robin; each task seeks straight to its entry's
  * local header and inflates just that byte range. Parallelism becomes
  * min(total entries, cluster cores) instead of archive count, and the
  * driver holds O(entries) metadata, never content.
  *
  * Works over any Hadoop filesystem URI (seek + ranged read are FS
  * primitives); deflate (method 8) and stored (method 0) entries are
  * supported, zip64 archives (>4 GiB or >65k entries) are rejected with a
  * clear error rather than misparsed. Zip-slip/flat-archive semantics
  * match [[ZipSource]]/[[ZipExtract]]: entries with path separators are
  * skipped.
  */
object ZipEntrySplits {

  /** One extractable entry: everything a task needs to read just its
    * bytes. `method`: 0 = stored, 8 = deflated. */
  case class EntrySplit(archive: String, entry: String, localHeaderOffset: Long,
                        compressedSize: Long, uncompressedSize: Long, method: Int)

  private val EOCD_SIG = 0x06054b50
  private val CEN_SIG = 0x02014b50
  private val LOC_SIG = 0x04034b50

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)

  /** Driver-side: list every safe entry of every archive under the glob by
    * parsing central directories — no archive body is read. */
  def listEntries(spark: SparkSession, pathGlob: String): Seq[EntrySplit] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val globPath = new Path(pathGlob)
    val fs = globPath.getFileSystem(conf)
    val statuses = Option(fs.globStatus(globPath)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
    statuses.flatMap { st =>
      val len = st.getLen
      val in = fs.open(st.getPath)
      try {
        // EOCD sits in the last 22..(22 + 65535) bytes; read the tail once.
        // The signature alone can appear inside an archive COMMENT, so a
        // candidate only counts if its comment-length field exactly spans
        // the remaining tail — scanning backwards, the first such offset
        // is the real record.
        val tailLen = math.min(len, 22L + 65535L).toInt
        val tail = new Array[Byte](tailLen)
        in.readFully(len - tailLen, tail)
        var eocd = -1
        var i = tailLen - 22
        while (i >= 0 && eocd < 0) {
          if (u32(tail, i) == EOCD_SIG && u16(tail, i + 20) == tailLen - (i + 22)) eocd = i
          else i -= 1
        }
        if (eocd < 0) throw new IllegalArgumentException(
          s"${st.getPath}: no end-of-central-directory record (not a zip?)")
        val nEntries = u16(tail, eocd + 10)
        val cdSize = u32(tail, eocd + 12)
        val cdOffset = u32(tail, eocd + 16)
        if (nEntries == 0xffff || cdSize == 0xffffffffL || cdOffset == 0xffffffffL)
          throw new UnsupportedOperationException(
            s"${st.getPath}: zip64 archives are not supported by the split reader")
        // non-zip64 u32 fields legally range to 4 GiB-1, past what a JVM
        // array can hold — reject clearly instead of NegativeArraySizeException
        if (cdSize > Int.MaxValue) throw new UnsupportedOperationException(
          s"${st.getPath}: central directory of $cdSize bytes exceeds the " +
            "split reader's 2 GiB buffer limit")
        val cd = new Array[Byte](cdSize.toInt)
        in.readFully(cdOffset, cd)
        val out = Seq.newBuilder[EntrySplit]
        var p = 0
        var n = 0
        while (n < nEntries && p + 46 <= cd.length) {
          if (u32(cd, p) != CEN_SIG) throw new IllegalArgumentException(
            s"${st.getPath}: corrupt central directory at offset $p")
          val method = u16(cd, p + 10)
          val csize = u32(cd, p + 20)
          val usize = u32(cd, p + 24)
          val nameLen = u16(cd, p + 28)
          val extraLen = u16(cd, p + 30)
          val commentLen = u16(cd, p + 32)
          val lho = u32(cd, p + 42)
          // the while-guard covers only the FIXED 46-byte header; the
          // variable tail (name/extra/comment) needs its own bound or a
          // directory cut mid-record surfaces as an opaque
          // StringIndexOutOfBounds instead of the truncation contract
          if (p + 46 + nameLen + extraLen + commentLen > cd.length)
            throw new IllegalArgumentException(
              s"${st.getPath}: truncated central directory (record at " +
                s"offset $p extends past the directory's $cdSize bytes)")
          val name = new String(cd, p + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
          if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL)
            throw new UnsupportedOperationException(
              s"${st.getPath}: zip64 entry '$name' is not supported by the split reader")
          if (csize > Int.MaxValue || usize > Int.MaxValue)
            throw new UnsupportedOperationException(
              s"${st.getPath}: entry '$name' ($csize compressed / $usize " +
                "uncompressed bytes) exceeds the split reader's 2 GiB buffer limit")
          // same flat-archive contract as ZipSource.expand
          val unsafe = name.contains("/") || name.contains("\\") || name == ".."
          if (!unsafe && !name.endsWith("/")) {
            out += EntrySplit(st.getPath.toString, name, lho, csize, usize, method)
          }
          p += 46 + nameLen + extraLen + commentLen
          n += 1
        }
        // the loop's bounds check stops quietly on a short buffer; a record
        // count mismatch means the directory was truncated mid-entry
        if (n != nEntries) throw new IllegalArgumentException(
          s"${st.getPath}: truncated central directory " +
            s"(EOCD declares $nEntries entries, found $n)")
        out.result()
      } finally in.close()
    }
  }

  /** Task-side: read exactly one entry's bytes (seek to its local header,
    * skip the header, read the compressed range, inflate if deflated).
    * Shared with the graft-zip DataSourceV2 reader ([[ZipDataSource]]). */
  private[ingest] def readEntry(fs: FileSystem, split: EntrySplit): Array[Byte] = {
    val in = fs.open(new Path(split.archive))
    try {
      val header = new Array[Byte](30)
      in.readFully(split.localHeaderOffset, header)
      if (u32(header, 0) != LOC_SIG) throw new IllegalArgumentException(
        s"${split.archive}: entry '${split.entry}' local header mismatch")
      // the LOCAL extra field length can differ from the central one
      val nameLen = u16(header, 26)
      val extraLen = u16(header, 28)
      val dataStart = split.localHeaderOffset + 30 + nameLen + extraLen
      val compressed = new Array[Byte](split.compressedSize.toInt)
      in.readFully(dataStart, compressed)
      split.method match {
        case 0 => compressed
        case 8 =>
          val inflater = new Inflater(true) // raw deflate, no zlib wrapper
          try {
            inflater.setInput(compressed)
            val bos = new ByteArrayOutputStream(
              math.max(split.uncompressedSize.toInt, 64))
            val buf = new Array[Byte](64 * 1024)
            while (!inflater.finished()) {
              val k = inflater.inflate(buf)
              if (k == 0 && inflater.needsInput()) {
                throw new java.util.zip.ZipException(
                  s"${split.archive}: entry '${split.entry}' truncated")
              }
              bos.write(buf, 0, k)
            }
            bos.toByteArray
          } finally inflater.end()
        case m => throw new UnsupportedOperationException(
          s"${split.archive}: entry '${split.entry}' uses compression method $m")
      }
    } finally in.close()
  }

  /** Distributed expansion with per-ENTRY parallelism: one task per split
    * batch, each seeking only its own byte ranges. Output rows match
    * [[ZipSource.expand]] so the two are drop-in interchangeable; use this
    * one when archives are few and large. */
  def expand(spark: SparkSession, pathGlob: String): Dataset[ZipSource.ZipEntryRow] = {
    import spark.implicits._
    val splits = listEntries(spark, pathGlob)
    val slices = math.max(1, math.min(splits.size, spark.sparkContext.defaultParallelism))
    // Configuration itself is not serializable — ship the SESSION's hadoop
    // conf as entries and rebuild per task, so spark.hadoop.* settings
    // (s3a credentials, endpoints, fs impls) reach the distributed readers
    // exactly as they reach the driver-side listing.
    val confEntries = {
      val c = spark.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    spark.createDataset(splits)
      .repartition(slices)
      .mapPartitions { iter =>
        lazy val conf = {
          val c = new Configuration(false)
          confEntries.foreach { case (k, v) => c.set(k, v) }
          c
        }
        val fsCache = scala.collection.mutable.Map.empty[String, FileSystem]
        iter.map { split =>
          val path = new Path(split.archive)
          val fs = fsCache.getOrElseUpdate(
            path.toUri.getScheme + "://" + Option(path.toUri.getAuthority).getOrElse(""),
            path.getFileSystem(conf))
          ZipSource.ZipEntryRow(split.archive, split.entry, readEntry(fs, split))
        }
      }
  }
}
