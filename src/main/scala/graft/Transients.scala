package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of TRANSIENT checkpoints — localCheckpoint'ed
  * frames that back exactly one query's plan (per-round star-contraction
  * sets, PageRank adjacency/degrees, LPA adjacency). localCheckpoint pins
  * its blocks in the block manager until the RDD is unpersisted or the
  * session dies; a harness that runs a hundred queries in one JVM (the
  * driver's Verify and Bench both do) otherwise accumulates gigabytes of
  * dead blocks, and the resulting eviction/spill pressure bleeds into
  * every LATER query's time — measured 2–4× drift across a full bench
  * cycle before this registry existed.
  *
  * Contract: producers `track` each transient right after creating it;
  * harnesses call `drop` BETWEEN queries (after the consumer materialized
  * — dropping earlier would sever the lineage the checkpoint replaced).
  * The session-lifetime memo caches (dedup pairs, the co-order edge
  * graph) are deliberately NOT tracked here: their reuse across queries
  * is documented operator semantics with their own eviction
  * (DedupOps.evict / GraphOps.evict, which DO unpersist). */
object Transients {

  // keyed by SparkContext, not SparkSession (optimization r13): a query
  // that isolates an execution-strategy conf on a child session (the
  // withDrainSession pattern) would cut transients under the CHILD, and a
  // session-keyed registry would leak them past the harness's
  // parent-session drop() forever. One context = one harness = one drop
  // scope; queries never run concurrently across sessions here.
  private val reg =
    scala.collection.mutable.Map.empty[org.apache.spark.SparkContext, List[DataFrame]]

  /** The engine's ONE lineage-cut primitive — every operator that
    * truncates a plan (star-contraction rounds, PageRank/LPA/k-core/BFS
    * frontiers, memoized pair/edge sets, reused mid-query relations)
    * routes through here: `localCheckpoint()` by default —
    * executor-memory/disk resident, fastest, but LOST ON EXECUTOR FAILURE,
    * which on a real cluster restarts a multi-hour iterative job from
    * round zero when one node dies. Setting
    * `spark.graft.reliableCheckpointDir` on the session (or the
    * `SPARK_GRAFT_RELIABLE_CHECKPOINT` env var) switches every cut to a
    * reliable `checkpoint()` against that directory (HDFS/S3 on a
    * cluster), making each round durable at the cost of a write per cut.
    * Checkpoint files are reclaimed IN-JOB by the ContextCleaner —
    * [[graft.Graft.sessionBuilder]] sets
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, so a
    * superseded round's rdd-* files are deleted once its frame is
    * unpersisted and the driver GCs the reference (a multi-day iterative
    * job would otherwise accumulate every past round's files until
    * context stop) — size the directory for the working set, not the
    * corpus: each cut is one round's edge/frontier set.
    *
    * Reliable-mode cost: `Dataset.checkpoint()` is eager — it runs one
    * job to materialize and the RDD's partitions are then recomputed to
    * write the checkpoint files, so an unpersisted plan would execute
    * TWICE per cut (reintroducing the double-computation the cut exists
    * to avoid). The cut therefore persists the frame first (the write
    * pass becomes a cache read) and unpersists right after the
    * checkpoint materializes — the standard persist-then-checkpoint
    * pattern; measured costs per round in BASELINE.md ("Reliable
    * checkpoint cost, round 10"). */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.reliableCheckpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_RELIABLE_CHECKPOINT"))
      .filter(_.nonEmpty) match {
      case Some(dir) =>
        // the value is a DIRECTORY, not a boolean switch: an operator who
        // exports =true would otherwise silently checkpoint every round
        // into a relative ./true on the default FS
        require(dir.contains("/"),
          s"reliable checkpoint dir must be a path (got '$dir'); set " +
            "spark.graft.reliableCheckpointDir/SPARK_GRAFT_RELIABLE_CHECKPOINT " +
            "to an HDFS/S3/local directory URI")
        val sc = s.sparkContext
        // setCheckpointDir is context-global; first cut wins, later conf
        // edits in the same JVM keep the original dir (documented — a
        // per-cut re-point would silently split one job's rounds across
        // directories)
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        // persist-then-checkpoint: without the cache the eager checkpoint
        // recomputes the whole plan to write the files (2x per cut); with
        // it the write pass reads blocks. Skip when the caller already
        // persisted (unpersisting THEIR cache here would be a surprise).
        val ownCache =
          df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        if (ownCache)
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint()
        finally if (ownCache) df.unpersist(blocking = false)
      case None => df.localCheckpoint()
    }
  }

  def track(df: DataFrame): DataFrame = synchronized {
    reg.updateWith(df.sparkSession.sparkContext)(l => Some(df :: l.getOrElse(Nil)))
    df
  }

  /** Unpersist every tracked transient of `s` (non-blocking) and forget
    * them. Safe to call at any query boundary: a re-run rebuilds its own
    * checkpoints from source.
    *
    * Two-level release (round-12, ADVICE r11): `Dataset.unpersist` only
    * uncaches through the CacheManager, and a checkpointed frame's pinned
    * blocks belong to the RDD behind its `LogicalRDD` leaf — NOT
    * registered there, so the Dataset call alone was a no-op for them and
    * actual eviction waited on reference-drop + the ContextCleaner's GC
    * cycle. The leaf RDD is unpersisted DIRECTLY here, so block release
    * is immediate at the query boundary, not eventual. */
  def drop(s: SparkSession): Unit = {
    val doomed = synchronized {
      val d = reg.getOrElse(s.sparkContext, Nil)
      reg.remove(s.sparkContext)
      d
    }
    doomed.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      try df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
  }
}
