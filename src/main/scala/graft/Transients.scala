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
