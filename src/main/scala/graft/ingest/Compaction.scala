package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file COMPACTION — the table-maintenance operator every
  * continuously-ingested dataset needs (at 100 TB an uncompacted table
  * degrades every scan into millions of file opens and starves the
  * scheduler with tiny splits).
  *
  * Rewrites a PLAIN parquet directory into ceil(totalBytes/targetBytes)
  * files: size from the FileSystem listing (no data read), a single
  * repartition(n) rewrite into a sibling staging dir, then a
  * rename-aside swap that keeps a complete data copy on disk through
  * every crash window. Data-identical by construction (one round-trip
  * through the parquet codec); the spec checks file-count collapse and
  * decimal-exact equality. At cluster scale the same routine runs per
  * partition directory, bounding each rewrite. Directories under a LIVE
  * streaming sink are detected and refused — their `_spark_metadata` log,
  * not the listing, defines the table (see [[compact]]). */
object Compaction {

  /** Compact `dir` in place; returns (filesBefore, filesAfter).
    *
    * Refuses a directory carrying a streaming-sink `_spark_metadata`
    * transaction log: batch reads of such a table list only files the log
    * records, so a listing-based rewrite would make every compacted row
    * invisible the moment the sink commits its next batch. Compacting a
    * live sink needs a log-aware rewrite (read via the log, append a
    * retraction/compaction entry) — out of scope here; stop the stream
    * and drop the log explicitly if a plain-directory compaction is
    * intended.
    *
    * Swap discipline: the old data is RENAMED ASIDE, the staging dir
    * renamed in, and only then the old copy deleted — every crash window
    * leaves a complete copy of the data on disk (a reader racing the two
    * renames can observe a missing directory for an instant; this is a
    * single-writer maintenance operation, not a transactional table
    * format). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(new Path(path, "_spark_metadata")),
      s"$dir is a streaming-sink table (_spark_metadata present); " +
        "listing-based compaction would orphan every compacted row")
    def dataFiles() = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    require(before.nonEmpty, s"no parquet data files under $dir")
    val total = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staging = new Path(s"$dir-compacting")
    val retired = new Path(s"$dir-retiring")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    require(fs.rename(path, retired), s"compaction swap failed for $dir (retire)")
    require(fs.rename(staging, path), s"compaction swap failed for $dir (promote); " +
      s"data preserved at $retired")
    fs.delete(retired, true)
    (before.length, dataFiles().length)
  }
}
