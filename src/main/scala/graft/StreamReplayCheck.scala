package graft

/** MULTI-BATCH REPLAY GATE core (round 13; see graft.streaming.Replay):
  * for each registered stream query, run it ONCE in normal single-batch
  * drain mode and ONCE in multi-batch replay mode (ReplayStage slices,
  * one file per trigger) in the same JVM, and require identical
  * order-independent content fingerprints PLUS evidence that the replay
  * actually ran more than one data micro-batch. This is the gate that
  * makes the cross-batch state machinery (commit/reload between
  * batches, watermark advancing batch over batch, buffered-replay
  * holds, join-state eviction against bounded-late rows) execute under
  * test — every prior gate drained streams as one AvailableNow batch.
  *
  * The DuckDB side is covered by running graft.Verify with
  * SPARK_GRAFT_STREAM_REPLAY set (tools/stream_replay_gate.sh): the
  * same oracle hashes, computed from multi-batch executions.
  *
  * Usage: runMain graft.StreamReplayCheck <sfDir> [q1,q2,...] [slices]
  * Prints one JSON verdict line {"gate":"stream_replay",...}; exits
  * non-zero unless every query matches and every sliced-source query
  * ran multi-batch. */
object StreamReplayCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val streamQs = SparkEntry.queries.keys.filter(_.contains("_stream")).toSeq.sorted
    val only = args.lift(1).map(_.split(",").toSet)
    val slices = args.lift(2).map(_.toInt).getOrElse(6)
    val qs = streamQs.filter(q => only.forall(_.contains(q)))
    require(qs.nonEmpty, s"no stream queries selected from: $streamQs")

    // SPARK_GRAFT_MASTER: the same override Verify/Bench honor — a
    // local-cluster value composes the time axis with the process
    // boundary (and, at 1 GiB executors, memory pressure): both the
    // single-batch baseline and every replay micro-batch then commit
    // state across real executor JVMs
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val spark = Graft.sessionBuilder(master,
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // normal single-batch drains first (replay OFF)
    require(!graft.streaming.Replay.enabled,
      "run StreamReplayCheck without SPARK_GRAFT_STREAM_REPLAY — it stages its own")
    val normal = qs.map { q =>
      q -> ClusterRecoveryDemo.fingerprint(SparkEntry.queries(q)(spark, sfDir))
    }.toMap

    // stage slices, flip replay mode on via the JVM property
    val replayDir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    ReplayStage.stage(spark, sfDir, replayDir, slices, 60L)
    sys.props("graft.stream.replay") = replayDir
    val results = try {
      qs.map { q =>
        val bats = countBatches { () =>
          ClusterRecoveryDemo.fingerprint(SparkEntry.queries(q)(spark, sfDir))
        }
        q -> (normal(q), bats._1, bats._2)
      }
    } finally {
      sys.props -= "graft.stream.replay"
      FsUtil.deleteRec(java.nio.file.Paths.get(replayDir))
    }

    // q79's delta-file replay stages its own multi-batch input and never
    // touches the sliced sources — exempt from the batch-count demand.
    // The bar is slices-1, not "more than one": a two-phase flush
    // sentinel arrives as its own input-bearing batch, so a replay that
    // collapsed to a single data batch would still read 2 — only a
    // count tied to the slice count actually evidences per-slice
    // delivery (slices-1 leaves margin for one legitimately empty
    // time slice).
    val rows = results.map { case (q, (norm, replay, batches)) =>
      val matches = norm == replay
      val multi = batches >= slices - 1 || q == "q79_stream_merge"
      (q, matches, batches, multi)
    }
    val failed = rows.filterNot { case (_, m, _, multi) => m && multi }
    val verdict = rows.map { case (q, m, b, _) =>
      s""""$q":{"match":$m,"data_batches":$b}"""
    }.mkString(",")
    println(s"""{"gate":"stream_replay","sf":"$sfDir","slices":$slices,""" +
      s""""queries":${rows.size},"all_match":${failed.isEmpty},""" +
      s""""detail":{$verdict}}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[stream_replay] FAILED: ${failed.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }

  /** Run `f` and report (result, max data-batch count observed across the
    * streaming queries it drained) via the [replay] lines Replay.logBatches
    * prints — captured here by listening on the session's streams. */
  private def countBatches[T](f: () => T): (T, Int) = {
    // Replay.logBatches prints to stdout from inside the drain; intercept
    // by counting progress through a streaming listener instead would race
    // other sessions, so parse our own signal: logBatches also records the
    // last count here when running in-process.
    graft.streaming.Replay.lastBatchCounts.clear()
    val r = f()
    val n = graft.streaming.Replay.lastBatchCounts.values.toSeq.sorted.lastOption.getOrElse(0)
    (r, n)
  }
}
