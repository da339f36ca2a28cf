package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** SPILL GATE (round-13, VERDICT r12 item 1): every prior gate and bench
  * ran in a JVM big enough to hold its working set — the spill machinery
  * (UnsafeExternalSorter, shuffle ExternalSorter spill files, RocksDB
  * working under a small heap) that decides SURVIVAL at 100 TB had never
  * actually engaged. This main runs the heavy-tail queries twice in one
  * JVM:
  *
  *  1. `local[16]` — the ample-memory reference fingerprints;
  *  2. `local-cluster[2,2,1024]` — two REAL executor JVMs at 1 GiB each
  *     (≈400 MB execution memory apiece), where the big sorts, hash
  *     aggregates, and joins must spill to finish;
  *
  * and requires identical order-independent fingerprints, recording the
  * per-query spill evidence (memoryBytesSpilled / diskBytesSpilled /
  * peakExecutionMemory summed over tasks via a SparkListener — the same
  * counters the Spark UI shows). Non-zero spill on the big operators
  * proves the paths RAN; identical hashes prove spilling is
  * value-neutral. An OOM here is a real finding to fix structurally —
  * never by raising the executor memory in this main.
  *
  * Prints one JSON line and writes `SPILLCHECK_<sfbase>.json`
  * (tools/spill_gate.sh merges per-SF artifacts into SPILLCHECK.json).
  * Exit 1 on any mismatch or failed query.
  *
  * `runMain graft.SpillCheck [sfDir] [q1,q2,...]`
  */
object SpillCheck {

  /** The sf0.1 heavy tail (BENCH_full.json, slowest first) plus the
    * RocksDB-stateful streams: the workloads whose shuffles/sorts/state
    * are big enough for 1 GiB executors to have to spill. */
  val DefaultQueries: Seq[String] = Seq(
    "q113_containment_dedup",      // rare-gram inverted index: big pair shuffle
    "q39_dedup_apply",             // LSH pipeline + anti join at corpus scale
    "q195_bloom_index",            // per-shard bloom build over documents
    "q223_adamic_adar",            // packed-key wedge aggregate
    "q233_incremental_dedup",      // batch-vs-corpus probe + survivorship
    "q140_ppjoin_exact",           // prefix-filter + salt cells
    "q36_minhash_pairs",           // banded LSH pair generation
    "q194_recursive_cte",          // UnionLoop per-step materializations
    "q229_layout_audit",           // wide multi-window sort ladder
    "q66_dedup_components",        // large-star/small-star iterations
    "q105_pagerank",               // iterative checkpointed ranks
    "q63_stream_interval_join",    // stream-stream interval join state
    "q193_stream_full_outer_join", // outer-join state store both sides
    "q164_stream_cascade",         // chained stateful stream stages
    "q225_stream_kmv",             // transformWithState on RocksDB
    "q250_stream_timer_sessions")  // timer-driven sessions on RocksDB

  /** Sums task-level spill/memory counters between resets — the exact
    * counters Spark's UI aggregates per stage, here folded per query. In
    * local-cluster mode they arrive serialized from the executor JVMs
    * with each task completion, so they measure the REMOTE processes. */
  private final class SpillListener extends SparkListener {
    private val mem = new java.util.concurrent.atomic.AtomicLong(0)
    private val disk = new java.util.concurrent.atomic.AtomicLong(0)
    private val peak = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled)
        peak.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        ()
      }
    }
    def reset(): Unit = { mem.set(0); disk.set(0); peak.set(0) }
    def snapshot: (Long, Long, Long) = (mem.get(), disk.get(), peak.get())
  }

  private case class QueryRun(rows: Long, hash: String, sec: Double,
                              spillMem: Long, spillDisk: Long, peakMem: Long)

  private def runAll(master: String, cpus: Int, sfDir: String,
                     queries: Seq[String]): Map[String, Option[QueryRun]] = {
    val builder = Graft.sessionBuilder(master, cpus)
    // In the squeezed (local-cluster) phase, also bound RocksDB: by
    // default its block cache + memtables grow with state and would ride
    // the executor's whole 1 GiB — bounding them to 64 MB per executor
    // (the shared-cache mode real clusters run) forces block-cache
    // EVICTION to engage on the stateful streams, the RocksDB analogue
    // of the sort/shuffle spill this gate exists to exercise. The
    // reference phase keeps defaults: identical results required anyway.
    if (master.startsWith("local-cluster")) {
      builder
        .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
        .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "64")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)
    try queries.map { q =>
      Bench.evictCaches(spark)
      listener.reset()
      val t0 = System.nanoTime()
      val run = try {
        val (n, h) = ClusterRecoveryDemo.fingerprint(SparkEntry.queries(q)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events post async and the bus-drain API is
        // private[spark]: settle briefly before reading. A late event
        // could only UNDERCOUNT one query's spill — the gate's pass
        // condition (hash match) never depends on the counters.
        Thread.sleep(500)
        val (m, d, p) = listener.snapshot
        Some(QueryRun(n, h, sec, m, d, p))
      } catch {
        case e: Throwable =>
          System.err.println(s"[spill] $q on $master FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      } finally Transients.drop(spark)
      q -> run
    }.toMap
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(s"${GenEdge.TestdataRoot}/sf0.1")
    val queries = args.lift(1).map(_.split(",").toSeq).getOrElse(DefaultQueries)
    val reference = runAll("local[16]", 16, sfDir, queries)
    val clusterMode = "local-cluster[2,2,1024]"
    val squeezed = runAll(clusterMode, 8, sfDir, queries)
    val body = queries.map { q =>
      val r = reference.get(q).flatten
      val c = squeezed.get(q).flatten
      val ok = r.isDefined && c.isDefined &&
        r.get.rows == c.get.rows && r.get.hash == c.get.hash
      val detail = c.map(x =>
        s""""sec":${f"${x.sec}%.2f"},"spill_mem":${x.spillMem},""" +
          s""""spill_disk":${x.spillDisk},"peak_exec_mem":${x.peakMem},""" +
          s""""rows":${x.rows}""").getOrElse(""""failed":true""")
      s""""$q":{"match":$ok,$detail}"""
    }
    val allOk = queries.forall { q =>
      val r = reference.get(q).flatten; val c = squeezed.get(q).flatten
      r.isDefined && c.isDefined && r.get.rows == c.get.rows && r.get.hash == c.get.hash
    }
    val spilled = queries.count(q => squeezed.get(q).flatten
      .exists(x => x.spillMem > 0 || x.spillDisk > 0))
    val json = s"""{"gate":"spill","sf":"$sfDir","mode":"$clusterMode",""" +
      s""""executor_mem_mb":1024,"all_match":$allOk,""" +
      s""""queries_spilled":$spilled,"queries_total":${queries.size},""" +
      s""""queries":{${body.mkString(",")}}}"""
    println(json)
    val base = new java.io.File(sfDir).getName
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"SPILLCHECK_$base.json"), json + "\n")
    if (!allOk) sys.exit(1)
  }
}
