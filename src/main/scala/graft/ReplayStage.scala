package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stages the multi-batch stream-replay corpus (see
  * [[graft.streaming.Replay]]): cuts the events table into K time-ordered
  * single-file slices whose ARRIVAL order carries bounded out-of-orderness
  * (arrival = event time + a deterministic per-row jitter of ±`jitterSec`,
  * chosen well inside every stream query's watermark delay — the
  * smallest is q176's 5-minute debounce gap — so cross-batch late rows
  * genuinely arrive late but stay within the allowed lateness the
  * operators are designed for), and the documents table into K
  * hash-sliced files (docs streams are order-insensitive folds; slicing
  * exercises their cross-batch state stitch, not ordering). Slice files
  * are named `slice-%03d.parquet` with strictly increasing modification
  * times so both candidate file-listing orders agree (delivery mechanism
  * pinned by ReplayOrderSpec).
  *
  * Usage: runMain graft.ReplayStage <sfDir> <outDir> [slices] [jitterSec]
  * The staged root records its source table dir in `source.txt`;
  * Replay.requireSource refuses to stream slices cut from a different
  * SF dir. */
object ReplayStage {

  def main(args: Array[String]): Unit = {
    val spark = Graft.sessionBuilder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stage(spark, args(0), args(1),
      args.lift(2).map(_.toInt).getOrElse(8),
      args.lift(3).map(_.toLong).getOrElse(60L))
    spark.stop()
  }

  /** The staging itself, callable on a live session (StreamReplayCheck
    * stages mid-run and must not lose its SparkContext). */
  def stage(spark: org.apache.spark.sql.SparkSession, sfDir: String,
            outDir: String, k: Int, jitterSec: Long): Unit = {
    require(k >= 2, "a single slice would replay as a single batch")
    require(k <= 999, // slice-%03d names + the slice-999-* sentinel suffix
      "slice naming orders at most 999 data slices before the sentinel")
    require(jitterSec * 2 < graft.streaming.Replay.minWatermarkDelaySec,
      "jitter must stay inside the smallest watermark delay " +
        s"(${graft.streaming.Replay.minWatermarkDelaySec} s — Replay.minWatermarkDelaySec)")
    val out = java.nio.file.Paths.get(outDir)
    FsUtil.deleteRec(out)
    java.nio.file.Files.createDirectories(out.resolve("events"))
    java.nio.file.Files.createDirectories(out.resolve("documents"))
    val baseMtime = System.currentTimeMillis() - 7L * 24 * 3600 * 1000

    // ---- events: time-sliced, jittered arrival, ORIGINAL ts type kept
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val tusExpr =
      if (ev.schema("ts").dataType == LongType) expr("ts div 1000")
      else {
        Tables.requireUtc(spark)
        expr("unix_micros(cast(ts AS TIMESTAMP))")
      }
    val jitter = (pmod(xxhash64(col("event_id"), lit("replay_jitter")),
      lit(2 * jitterSec + 1)) - jitterSec) * lit(1000000L)
    val arr = ev.withColumn("__arr", tusExpr + jitter)
    val bounds = arr.agg(min(col("__arr")), max(col("__arr"))).head
    if (bounds.isNullAt(0)) throw new IllegalArgumentException(
      s"events table at $sfDir is empty — nothing to slice for replay")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / k + 1)
    // cache the jittered/bucketed frame: the per-slice writes below would
    // otherwise each re-read and re-hash the whole table (k+ full scans)
    val sliced = arr.withColumn("__slice",
      least(lit(k - 1), expr(s"(__arr - ${lo}L) DIV ${width}L")).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evRows = sliced.count()
    val evCols = ev.columns.map(col)
    (0 until k).foreach { b =>
      writeSlice(sliced.filter(col("__slice") === b).select(evCols: _*),
        out.resolve("events"), b, baseMtime)
    }
    sliced.unpersist(blocking = false)

    // ---- documents: hash-sliced
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docCols = docs.columns.map(col)
    val dsliced = docs.withColumn("__slice",
      pmod(xxhash64(col("doc_id"), lit("replay_slice")), lit(k)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docRows = dsliced.count()
    (0 until k).foreach { b =>
      writeSlice(dsliced.filter(col("__slice") === b).select(docCols: _*),
        out.resolve("documents"), b, baseMtime)
    }
    dsliced.unpersist(blocking = false)

    val src = java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    java.nio.file.Files.write(out.resolve("source.txt"),
      src.getBytes("UTF-8"))
    println(s"""{"stage":"replay","sf":"$src","out":"$outDir","slices":$k,""" +
      s""""jitter_sec":$jitterSec,"events_rows":$evRows,""" +
      s""""docs_rows":$docRows}""")
  }

  /** One slice as ONE plain parquet file, named and dated in slice order
    * (Spark's writer only produces directories — move the part file). */
  private def writeSlice(df: org.apache.spark.sql.DataFrame,
                         destDir: java.nio.file.Path, b: Int,
                         baseMtime: Long): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft_slice")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file for slice $b"))
    val dest = destDir.resolve(f"slice-$b%03d.parquet")
    java.nio.file.Files.move(part.toPath, dest)
    if (!dest.toFile.setLastModified(baseMtime + b * 60000L))
      throw new IllegalStateException(s"cannot stamp slice mtime on $dest")
    FsUtil.deleteRec(stage)
  }
}
