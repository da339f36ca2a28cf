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

  private val reg =
    scala.collection.mutable.Map.empty[SparkSession, List[DataFrame]]

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
    * Checkpoint files live until the context stops (or the ContextCleaner
    * collects them under `spark.cleaner.referenceTracking.cleanCheckpoints`)
    * — size the directory for the working set, not the corpus: each cut
    * is one round's edge/frontier set, and superseded rounds are
    * unpersisted by their operators as they go. */
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
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  def track(df: DataFrame): DataFrame = synchronized {
    reg.updateWith(df.sparkSession)(l => Some(df :: l.getOrElse(Nil)))
    df
  }

  /** Unpersist every tracked transient of `s` (non-blocking) and forget
    * them. Safe to call at any query boundary: a re-run rebuilds its own
    * checkpoints from source. */
  def drop(s: SparkSession): Unit = {
    val doomed = synchronized {
      val d = reg.getOrElse(s, Nil)
      reg.remove(s)
      d
    }
    doomed.foreach(df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () })
  }
}
