package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** CONTINUOUS ingestion — the streaming twin of the reference pipeline's
  * one-shot CSV→parquet load (`/root/reference/src/main.rs:27-80`). The
  * reference approximates incrementality with a warm/cold short-circuit
  * (skip everything if the extracted CSV already exists, main.rs:36-42);
  * the streaming form subsumes that: the file source discovers NEW csv
  * files under the source directory, the checkpoint records which files
  * are already ingested, and the parquet file sink commits atomically via
  * its log — together giving end-to-end EXACTLY-ONCE ingestion across
  * arbitrary re-runs, including crashed ones, with no bespoke existence
  * checks.
  *
  * Scale: file listing is incremental (only unseen files are read), each
  * micro-batch parallelizes over files/splits like any batch scan, and
  * the sink writes partitioned parquet — so a 100 TB backfill is just a
  * long first drain, and steady state touches only the new data.
  * `Trigger.AvailableNow` drains everything currently visible and stops —
  * the batch-friendly way to run a streaming pipeline on a schedule. */
object IngestStream {

  /** Drain every not-yet-ingested CSV under `srcDir` into the parquet sink
    * at `dstDir`, exactly once across calls sharing `checkpointDir`. */
  def drainCsvToParquet(spark: SparkSession, srcDir: String, dstDir: String,
                        checkpointDir: String, schema: StructType,
                        header: Boolean = true): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .csv(srcDir)
      .writeStream
      .format("parquet")
      .option("path", dstDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
