package graft.ingest

import java.io.ByteArrayOutputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Distributed zip expansion: `binaryFile` scan + a typed 1->N flatMap over
  * `java.util.zip.ZipInputStream` — the Spark-native shape for the
  * reference's download+unzip (main.rs:172-208 + 153-170) when there are
  * MANY archives (each archive = one task; zip is not splittable, so
  * parallelism comes from archive count, not archive size — SURVEY.md §7.4).
  *
  * Zip-slip/flat-archive semantics match ZipExtract: entries with path
  * separators or traversal are skipped.
  *
  * The same `spark.read.format("binaryFile")` path works against an
  * `s3a://bucket/prefix/` glob unchanged — credentials flow from the default
  * AWS provider chain exactly as the reference's `aws_config::load_defaults`
  * (main.rs:56-57); nothing here hardcodes a filesystem.
  */
object ZipSource {

  case class ZipEntryRow(archive: String, entry: String, content: Array[Byte])

  def expand(spark: SparkSession, pathGlob: String): Dataset[ZipEntryRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        // close in a finally: ZipInputStream wraps an Inflater whose zlib
        // buffers live OFF-HEAP — a ZipException from a corrupt archive
        // (plus Spark's task retries of it) would otherwise leak native
        // memory on long-lived executors until finalization
        try {
          val out = Seq.newBuilder[ZipEntryRow]
          var entry = zis.getNextEntry
          while (entry != null) {
            val name = entry.getName
            // flat-archive contract: any path separator disqualifies; a
            // separator-free name cannot traverse, so ".." is only unsafe as
            // the whole name (names like "a..b.csv" are legitimate)
            val unsafe = name.contains("/") || name.contains("\\") || name == ".."
            if (!entry.isDirectory && !unsafe) {
              val bos = new ByteArrayOutputStream()
              val buf = new Array[Byte](64 * 1024)
              var n = zis.read(buf)
              while (n >= 0) { bos.write(buf, 0, n); n = zis.read(buf) }
              out += ZipEntryRow(path, name, bos.toByteArray)
            }
            zis.closeEntry()
            entry = zis.getNextEntry
          }
          out.result()
        } finally zis.close()
      }
  }

  /** Expand zipped CSV archives and parse the bodies — end-to-end
    * distributed (no driver-side temp files). All entries are assumed to be
    * shards of ONE logical CSV (shared header): each entry drops exactly
    * its FIRST line — never mid-file lines that happen to equal the header
    * text (a data row byte-equal to the header is data) — and a single
    * header is re-prepended, because Spark's `csv(Dataset[String])` parses
    * one LINE per element. An entry whose first line differs from the
    * probe header fails HARD with the entry name: silently parsing a
    * reordered-column shard under the wrong header would corrupt every
    * row of that shard. */
  def expandCsv(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    // cache: header probe, schema inference, and the parse would otherwise
    // each re-download and re-unzip every archive. The cached text lives
    // until the caller drops it (spark.catalog.clearCache() / unpersist on
    // the plan) — the price of keeping this API lazy.
    val texts = expand(spark, pathGlob)
      .filter(_.entry.toLowerCase.endsWith(".csv"))
      .map(e => (e.entry, new String(e.content, java.nio.charset.StandardCharsets.UTF_8)))
      .cache()
    val header = texts.take(1).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"no .csv entries found in archives matching $pathGlob"))
      ._2.linesIterator.next()
    val data = texts.flatMap { case (entry, text) =>
      val lines = text.linesIterator
      if (!lines.hasNext) Iterator.empty[String]
      else {
        val entryHeader = lines.next()
        if (entryHeader != header) throw new IllegalStateException(
          s"zip entry '$entry' header '$entryHeader' does not match expected '$header'")
        lines
      }
    }
    // parse HEADERLESS and rename from the probed header: Spark's csv
    // reader with header=true over a Dataset[String] silently drops every
    // line byte-equal to the header (its multi-shard header handling), and
    // a data row that happens to equal the header is data, not a header
    val names = spark.read.csv(spark.createDataset(Seq(header)))
      .head.toSeq.map(String.valueOf)
    if (data.isEmpty) {
      // header-only archives: csv() cannot infer a schema from zero rows —
      // return the empty frame with the probed columns (all string, the
      // same type inference yields when every value is absent)
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(names.map(StructField(_, StringType))))
    } else {
      spark.read.option("inferSchema", "true").csv(data).toDF(names: _*)
    }
  }
}
