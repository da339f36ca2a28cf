package graft

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for [[GenSkew]] output: runs the join/agg
  * family against a skew-keyed dir with AQE skew handling ON and OFF,
  * asserting the results hash-equal both ways and reporting whether the
  * FINAL adaptive plan actually split a skewed partition (`skew=true` in
  * the executed SortMergeJoin/ShuffledHashJoin nodes).
  *
  * The skew-trigger thresholds are scaled DOWN for bench volume: AQE
  * splits a partition only past an absolute size floor (256 MB default)
  * AND a 5× median factor. A 100 TB shuffle's hot partitions are tens of
  * GB, so the defaults fire unaided there; sf1's whole fact shuffle is
  * tens of MB, under the absolute floor by construction. Lowering the
  * floor (not the medianFactor — the distributional trigger stays honest)
  * exercises the same decision logic at measurable volume.
  *
  * `runMain graft.SkewProbe <skewDir> [query...]`
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q10_join_inner_agg", "q59_min_cost_supplier",
        "q81_event_funnel", "q107_event_transitions")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      sys.env.getOrElse("GRAFT_SKEW_THRESHOLD", "4m"))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("GRAFT_SKEW_ADVISORY", "2m"))
    // at sf1 AQE's first line of defense absorbs the skew outright: every
    // fact side fits the broadcast budget, and a broadcast join HAS no
    // skewed shuffle partition (measured: q10/q81 planned as
    // BroadcastHashJoin over the 40%-hot keys, hashes equal either way).
    // That defense does not exist at 100 TB — no side of a fact-fact join
    // is broadcastable — so the probe's point, exercising the skew-SPLIT
    // path at data volume, requires forbidding auto-broadcast the way
    // volume itself would. Explicit broadcast() hints are unaffected.
    if (!sys.env.contains("GRAFT_SKEW_KEEP_BCAST")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }

    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // off first, then on; two runs per setting with the SECOND timed —
      // the first run of a fresh query pays scan-cache/JIT warmup that
      // otherwise lands entirely on whichever setting goes first
      val runs = Seq(false, true).map { skewOn =>
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
        val timed = (1 to 2).map { _ =>
          val df = fn(spark, dir)
          val t0 = System.nanoTime()
          val rows = df.collect()
          val secs = (System.nanoTime() - t0) / 1e9
          // \u0001-delimited columns: a separator-less concat would let
          // (12, 3) and (1, 23) collide and the equality gate false-pass
          val h = md5(rows.map(_.mkString("\u0001")).sorted.mkString("\n"))
          val plan = df.queryExecution.executedPlan.toString
          val fired = plan.contains("skew=true")
          if (sys.env.contains("GRAFT_SKEW_DEBUG"))
            plan.linesIterator.filter(_.contains("Join")).foreach(l =>
              println(s"  PLAN $name skewJoin=$skewOn ${l.trim.take(160)}"))
          Transients.drop(spark)
          (h, fired, secs, rows.length)
        }
        val (h, fired, secs, n) = timed.last
        println(f"SKEWPROBE $name skewJoin=$skewOn%-5s $secs%6.2fs " +
          f"rows=$n%-7d hash=$h skew_split_fired=$fired")
        (h, fired, secs)
      }
      require(runs(0)._1 == runs(1)._1,
        s"$name: results differ between skew handling on and off")
      // off-time / on-time: > 1.0x means skew handling made the query
      // faster (named unambiguously — the old `on_vs_off` label read as
      // the inverse ratio and could misattribute which setting won)
      println(f"SKEWPROBE $name HASH_EQUAL on/off " +
        f"off_over_on=${runs(0)._3 / runs(1)._3}%.2fx fired=${runs(1)._2}")
    }
    spark.stop()
  }
}
