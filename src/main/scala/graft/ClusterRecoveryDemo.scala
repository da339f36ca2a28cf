package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXECUTOR-LOSS RECOVERY DEMO (round-12, VERDICT r11 item 1): the one
  * scale claim no local[N] run can test is that an iterative checkpointed
  * job survives a REAL executor process dying — local mode runs tasks in
  * the driver JVM, so there is no process to lose. Under
  * `local-cluster[2,2,1024]` executors are separate JVMs, so this main
  * runs an iterative query (default q105's PageRank — per-round
  * [[Transients.cut]] checkpoints in RELIABLE mode) twice:
  *
  *  1. undisturbed — the baseline result (order-independent content hash);
  *  2. with one executor JVM `destroyForcibly`'d (SIGKILL) mid-run — the
  *     standalone Worker relaunches the executor, lost tasks retry, lost
  *     cached/checkpointed blocks recompute from the reliable checkpoint
  *     files or lineage, and the job must finish with the IDENTICAL hash.
  *
  * Prints one JSON line (`"match":true` is the gate) that
  * tools/cluster_gate.sh folds into CLUSTERCHECK.json. Exit code 1 on any
  * mismatch, on a run that failed outright, or if no executor was killed
  * STRICTLY BEFORE the disturbed run's fingerprint completed (r12 ADVICE:
  * a kill landing after completion matches trivially and demonstrates
  * nothing — the killer skips once the run flags done, and the
  * kill/completion timestamps are compared as the authoritative check;
  * query too fast → pass a bigger SF dir or a smaller killAt).
  *
  * The query may be BATCH (default q105's checkpointed PageRank) or a
  * STREAMING twin (e.g. q225_stream_kmv — RocksDB-backed
  * transformWithState): both run through SparkEntry.queries, so the
  * stream variant kills an executor while a micro-batch is in flight and
  * requires the drained result to fingerprint-match the undisturbed
  * drain (VERDICT r12 item 3).
  *
  * Run via `tools/cluster_gate.sh` (sets SPARK_HOME for the executor
  * launcher): `sbt "runMain graft.ClusterRecoveryDemo [sfDir] [query] [killAtSec]"`.
  */
object ClusterRecoveryDemo {

  /** Order-independent content fingerprint: count + DECIMAL(38,0) sum of
    * per-row xxhash64 over the canonical JSON rendering (a raw-long sum
    * of 64-bit hashes overflows under ANSI within ~2^11 rows). Identical
    * multisets of rows — regardless of partitioning, task retries, or row
    * order — produce identical (count, sum) pairs. */
  private[graft] def fingerprint(df: DataFrame): (Long, String) = {
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col): _*)))
        .cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s"))
      .head()
    (row.getLong(0), if (row.isNullAt(1)) "0" else row.getDecimal(1).toPlainString)
  }

  /** SIGKILL one live executor JVM (a descendant process of this JVM
    * running CoarseGrainedExecutorBackend). Returns its pid, or None if
    * no executor process was found. ProcessHandle.info() can come back
    * empty for a child whose cmdline exceeds the JDK's read window (the
    * executor command carries the full absolutized classpath), so fall
    * back to /proc/<pid>/cmdline directly. */
  private def killOneExecutor(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    // concatenate BOTH sources: info().commandLine() comes back NON-EMPTY
    // but TRUNCATED for these children (the class name sits after the
    // multi-KB classpath), so an orElse fallback never fires
    def cmdline(p: ProcessHandle): String =
      p.info().commandLine().orElse("") +
        (try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${p.pid()}/cmdline")))
        catch { case _: Throwable => "" })
    val all = ProcessHandle.current().descendants().iterator().asScala.toSeq
    val victims = all.filter(cmdline(_).contains("CoarseGrainedExecutorBackend"))
    if (victims.isEmpty)
      System.err.println(s"[recovery] no executor among ${all.size} " +
        s"descendants: ${all.map(p => p.pid() -> cmdline(p).take(60)).mkString("; ")}")
    victims.headOption.map { p =>
      val pid = p.pid()
      p.destroyForcibly()
      pid
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args.lift(1).getOrElse("q105_pagerank")
    // when to pull the trigger, seconds into the disturbed run; the
    // default lands inside q105's iteration ladder at sf0.1
    val killAt = args.lift(2).flatMap(a => scala.util.Try(a.toDouble).toOption)
      .getOrElse(3.0)
    val ckptDir = s"/tmp/graft_recovery_ckpt_${ProcessHandle.current().pid()}"
    val spark = Graft.sessionBuilder("local-cluster[2,2,1024]", 8)
      // RELIABLE checkpoints: every Transients.cut becomes a durable
      // checkpoint() against ckptDir, so a dead executor's rounds are
      // re-readable instead of recomputed-from-round-zero (the mode's
      // entire reason to exist — see Transients.cut)
      .config("spark.graft.reliableCheckpointDir", ckptDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(qname)

    def runOnce(kill: Boolean): Option[(Long, String, Option[Long])] = {
      Bench.evictCaches(spark)
      // FALSE-PASS GUARD (r12 ADVICE): a kill that fires AFTER the
      // fingerprint completed exercised nothing — the hashes match
      // trivially. The killer (a) skips the kill once `done` is set, and
      // (b) timestamps the kill so main can require killTime < doneTime;
      // a post-completion kill is reported the same as no kill at all.
      val killed = new java.util.concurrent.atomic.AtomicReference[Option[Long]](None)
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val killTime = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
      val killer = new Thread(() => {
        Thread.sleep((killAt * 1000).toLong)
        if (!done.get()) {
          killed.set(killOneExecutor())
          killTime.set(System.nanoTime())
        }
      })
      killer.setDaemon(true)
      try {
        if (kill) killer.start()
        val (n, h) = fingerprint(fn(spark, sfDir))
        val doneTime = System.nanoTime()
        done.set(true)
        if (kill) killer.join() // don't let a late kill bleed into the next run
        // the done flag and the kill can race within one scheduling slice:
        // the timestamp comparison is the authoritative mid-run check
        val midRun = killed.get().filter(_ => killTime.get() < doneTime)
        if (kill && killed.get().isDefined && midRun.isEmpty)
          System.err.println(s"[recovery] kill fired AFTER completion — " +
            "demonstrated nothing; treated as no-kill (lower killAt, or " +
            "run a bigger SF dir)")
        Some((n, h, midRun))
      } catch {
        case e: Throwable =>
          System.err.println(s"[recovery] run(kill=$kill) FAILED: ${e.getMessage}")
          None
      } finally Transients.drop(spark)
    }

    val baseline = runOnce(kill = false)
    val disturbed = runOnce(kill = true)
    val killedPid = disturbed.flatMap(_._3)
    val matches = (baseline, disturbed) match {
      case (Some((bn, bh, _)), Some((dn, dh, _))) => bn == dn && bh == dh
      case _ => false
    }
    def render(r: Option[(Long, String, Option[Long])]): String = r
      .map { case (n, h, _) => s"""{"rows":$n,"hash":"$h"}""" }
      .getOrElse("null")
    println(s"""{"demo":"executor_kill","query":"$qname","sf":"$sfDir",""" +
      s""""baseline":${render(baseline)},"disturbed":${render(disturbed)},""" +
      s""""executor_killed":${killedPid.isDefined},""" +
      s""""killed_pid":${killedPid.getOrElse(-1L)},"match":$matches}""")
    spark.stop()
    FsUtil.deleteRec(java.nio.file.Paths.get(ckptDir))
    // no executor found mid-run = the demo demonstrated nothing — fail
    if (!matches || killedPid.isEmpty) sys.exit(1)
  }
}
