package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  // ------------------------------------------------- q79: streaming CDC apply
  private def deleteRec(p: java.nio.file.Path): Unit = graft.FsUtil.deleteRec(p)

  /** Core of the streaming CDC apply: stream order-delta parquet files from
    * `srcDir` (matching `glob`) and fold each micro-batch into a
    * parquet-backed state table via [[graft.ops.EtlOps.mergeState]].
    * Because the merge is ASSOCIATIVE in the delta (sums/counts add, base
    * markers carry), folding batch-by-batch lands on exactly the state one
    * batch fold over the union would — so the drained result shares q73's
    * exact oracle, and the spec proves the multi-batch path against the
    * batch twin.
    *
    * State versioning is CRASH-SAFE and IDEMPOTENT per batch, keyed on
    * the foreachBatch batchId (the contract a restartable sink needs —
    * the merge is associative but NOT idempotent, so a re-delivered
    * batch must never re-apply):
    *  - batch b writes its merged state to `state_b.tmp`, then renames
    *    to `state_b` — a reader can never observe a half-written state,
    *    and a crash mid-write leaves only a tmp dir the retry clears;
    *  - if `state_b` already EXISTS (the batch was re-delivered after
    *    the rename but before the checkpoint committed), the batch is
    *    skipped — the delta is already in the state, applying it again
    *    would double-count;
    *  - older `state_i` dirs are pruned only AFTER the rename, so some
    *    complete state always exists (the previous swap deleted the old
    *    state BEFORE moving the next one in — a crash in that window
    *    lost the only copy).
    * The returned frame is locally checkpointed so the temp state dirs
    * can be deleted before returning. */
  private[graft] def stateIds(root: java.nio.file.Path): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory fd until the stream is closed; this runs
    // up to twice per micro-batch, so rely on Using, not GC, to release it
    scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("state_") && !n.endsWith(".tmp"))
        .map(_.stripPrefix("state_").toLong).toSeq
    }
  }

  /** One crash-safe, idempotent state-fold step (the foreachBatch body,
    * exposed so the re-delivery and crashed-tmp contracts are directly
    * spec-testable): merge `batch`'s delta onto the latest `state_i`
    * with i < bid, landing atomically as `state_bid`; a bid whose state
    * dir already exists is a re-delivery and is skipped. */
  private[graft] def applyBatch(root: java.nio.file.Path,
                                    batch: DataFrame, bid: Long): Unit = {
    import java.nio.file.{Files, Path}
    val ops = graft.ops.EtlOps
    def statePath(id: Long): String = s"$root/state_$id"
    val target = Path.of(statePath(bid))
    if (!Files.exists(target)) { // re-delivered batch: already merged
      val prevId = stateIds(root).filter(_ < bid).max
      val tmp = Path.of(s"${statePath(bid)}.tmp")
      deleteRec(tmp) // a crash mid-write leaves a partial tmp
      ops.mergeState(batch.sparkSession.read.parquet(statePath(prevId)),
          ops.deltaAgg(batch))
        .write.mode("overwrite").parquet(tmp.toString)
      Files.move(tmp, target)
      // prune predecessors only now — a complete state always exists
      stateIds(root).filter(_ < bid)
        .foreach(i => deleteRec(Path.of(statePath(i))))
    }
  }

  def streamMergeOrders(s: SparkSession, srcDir: String, glob: String,
                        customer: DataFrame,
                        ordersSchema: StructType): DataFrame = {
    import java.nio.file.Files
    val ops = graft.ops.EtlOps
    val root = Files.createTempDirectory("graft_q79")
    val ckpt = s"$root/ckpt"
    try {
      // the base snapshot is state -1: every real batchId is >= 0
      ops.mergeBaseState(customer).write.mode("overwrite")
        .parquet(s"$root/state_-1")
      val stream = s.readStream.schema(ordersSchema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", "1") // one delta file per micro-batch
        .parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], bid: Long) =>
          applyBatch(root, batch.toDF(), bid)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val out = ops.presentMerge(
          s.read.parquet(s"$root/state_${stateIds(root).max}"))
        .orderBy("custkey")
        .transform(graft.Transients.cut)
      out
    } finally deleteRec(root)
  }

  /** q79: the CDC merge of q73 executed AS A STREAM — order deltas arrive
    * as files, foreachBatch applies each to the persistent state table,
    * and the final state is presented exactly like the batch merge. Shares
    * q73's exact DuckDB oracle (the fold is associative; see
    * [[streamMergeOrders]]). On the driver testdata the table is one file
    * (one batch); the multi-batch path is exercised by the spec, which
    * splits the delta across files and checks batch-twin equality. */
  def q79StreamMerge(s: SparkSession, d: String): DataFrame = {
    val ordersSchema = graft.Tables.load(s, d, "orders").schema
    streamMergeOrders(s, d, "orders.parquet",
      graft.Tables.load(s, d, "customer"), ordersSchema)
  }
}
