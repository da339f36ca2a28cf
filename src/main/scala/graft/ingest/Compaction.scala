package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file COMPACTION — the table-maintenance operator every
  * continuously-ingested dataset needs (the streaming parquet sink in
  * [[graft.streaming.IngestStream]] writes one file per micro-batch per
  * partition; at 100 TB an uncompacted table degrades every scan into
  * millions of file opens and starves the scheduler with tiny splits).
  *
  * Rewrites a parquet directory into ceil(totalBytes / targetBytes)
  * files: size from the FileSystem listing (no data read), a single
  * repartition(n) rewrite into a sibling staging dir, then a swap — the
  * table is never observable half-compacted, mirroring the state-swap
  * discipline of the streaming CDC apply. Data-identical by
  * construction (one round-trip through the parquet codec); the spec
  * checks bytes and row equality. At cluster scale the same routine runs
  * per partition directory, bounding each rewrite. */
object Compaction {

  /** Compact `dir` in place; returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles() = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    require(before.nonEmpty, s"no parquet data files under $dir")
    val total = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staging = new Path(s"$dir-compacting")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    fs.delete(path, true)
    require(fs.rename(staging, path), s"compaction swap failed for $dir")
    (before.length, dataFiles().length)
  }
}
