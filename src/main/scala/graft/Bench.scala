package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every registered query at the SF the driver points
  * at (SPARK_GRAFT_SF_DIR), prints one JSON line.
  *
  * Methodology (see BASELINE.md "Bench methodology"):
  *  - every query executes its FULL plan via a noop-format write — a
  *    count() would let Catalyst prune projections and final sorts under
  *    the count aggregate, timing the scan instead of the operator;
  *  - queries whose first run exceeds 1 s re-run twice more and report the
  *    MEDIAN, so single-JVM ambient load (±30%+ observed on this box for
  *    identical code) can't flip the bench gate; sub-1 s queries keep the
  *    single-shot number (their contribution to the total is noise-level);
  *  - STREAM queries (name contains "_stream") are median-of-3 REGARDLESS
  *    of first-run time: every drain pays a planning/termination cycle
  *    whose spread (±0.3-0.8 s per drain, 28 stream queries) carried most
  *    of the sf1 run-to-run variance — a single-shot stream number reads
  *    drain weather as regression. Each drain already stages into a fresh
  *    temp dir with a fresh checkpoint, so repeats never replay state;
  *  - queries that materialize a session-scoped cache as a side effect
  *    (q36 fills the near-dup pair cache) evict it before EVERY timed run,
  *    so the median measures the real pipeline, not two cache hits.
  *    Cache-consumer operators (dropNearDuplicates over pairs, q99 over
  *    the co-order graph) intentionally measure the cached path — that
  *    reuse is the operator's documented semantics;
  *  - the full per-query JSON is also written to a working-directory file
  *    (the driver's stdout capture has truncated the tail of the single
  *    JSON line before — r5 lost everything past ~q58): BENCH_full.json
  *    for the sf0.1 gating config, BENCH_full_<sfbase>.json otherwise, or
  *    an explicit second arg — so an sf1 dev run can never clobber the
  *    gating artifact;
  *  - a fixed synthetic calibration probe runs at start/middle/end and
  *    rides in the artifact as `probe`, so an ambient-contended run
  *    self-labels numerically (see [[calibrationProbe]]);
  *  - a `spread` map ({min, med, max, runs} per query) rides next to the
  *    median `queries` map, so an inflated gating run carries its own
  *    adjudication evidence — a wide min..max on the suspect queries is
  *    ambient contention mid-run, three tight runs at the high value is a
  *    real regression (BASELINE.md "Variance adjudication"). */
object Bench {

  /** Queries that fill a session-scoped cache (the dedup pair cache, the
    * co-order edge graph): evict before each timed run so repeats don't
    * measure a cache hit. Later consumers (dropNearDuplicates over pairs,
    * q99 over the graph) intentionally measure the cached path — that
    * reuse is the documented semantics. Shared with MicroBench. */
  private[graft] val cacheProducers = Set("q36_minhash_pairs", "q105_pagerank")

  private[graft] def evictCaches(spark: SparkSession): Unit = {
    ops.DedupOps.evict(spark)
    ops.GraphOps.evict(spark)
    ops.SimilarityOps.evict(spark)
  }

  private def execute(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Ambient-load calibration probe (round-12, VERDICT r11 item 6): a
    * fixed synthetic workload — pure-CPU hashing plus ONE small shuffle —
    * timed at start/middle/end of the run and recorded in the artifact.
    * Identical code and data every run, so its time moves ONLY with the
    * box: a gating run whose probe ratio (max/min, or vs another run's
    * probe) exceeds ~1.5 is ambient-contended and self-labels as such
    * numerically, without the prose adjudication three rounds of
    * driver-vs-builder spread disputes needed. Sized ~1 s on an idle
    * local[32] so three probes cost ~3 s against a 300+ s run. */
  private def calibrationProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    execute(spark.range(0, 24_000_000L, 1, 32)
      .select(xxhash64(col("id"), lit("probe_a")).as("h1"),
        // pmod-bounded addends: a raw sum of 24M 64-bit hashes overflows
        // a long under ANSI
        pmod(xxhash64(col("id"), lit("probe_b")), lit(1_000_000L)).as("h2"))
      .groupBy(pmod(col("h1"), lit(512)).as("k"))
      .agg(sum(col("h2")).as("s"), count(lit(1)).as("n")))
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // args override env: `runMain graft.Bench <sfDir> [outFile]`. The
    // per-query artifact path derives from the SF dir unless given, so an
    // sf1 dev run can no longer clobber the sf0.1 gating artifact
    // (VERDICT r11 item 5 — r11 restored BENCH_full.json by hand).
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER: same override Verify honors — a
    // local-cluster[...] value times every query across REAL executor
    // processes (serialized closures, over-the-wire broadcast/shuffle),
    // quantifying the process-boundary tax the 100 TB design arguments
    // assume is amortizable (VERDICT r12 item 6). Needs the SPARK_HOME
    // farm tools/cluster_gate.sh stages.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val clusterMode = master.startsWith("local-cluster")
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names — a family
    // subset for mode-vs-mode comparisons (the artifact records the
    // subset; a filtered total is never comparable to the full one)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val outFile = args.lift(1).getOrElse {
      val base = new java.io.File(sfDir).getName
      // distinct default names per config: a cluster-mode or subset run
      // must never clobber the full local gating artifact (the r11
      // staleness class, extended to the new dimensions)
      val tag = (if (clusterMode) "_cluster" else "") +
        (if (only.isDefined) "_subset" else "")
      if (base == "sf0.1") s"BENCH_full$tag.json" else s"BENCH_full_$base$tag.json"
    }
    val spark = Graft.sessionBuilder(master, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/shuffle machinery spin-up otherwise lands
    // entirely on the alphabetically-first query
    try execute(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // long-JVM hygiene — drain the cleaner's backlog between queries so
    // shuffle/broadcast residue never compounds under the timed spans
    // (rationale and measurements on Graft.GcNudge)
    val gc = new Graft.GcNudge()
    val sorted = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)
    // calibration probes bracket the run (rationale on calibrationProbe);
    // the start probe runs AFTER warmup so it never absorbs JVM spin-up
    val probeStart = calibrationProbe(spark)
    var probeMid = -1.0
    val results = sorted.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi == sorted.size / 2) probeMid = calibrationProbe(spark)
      def timeOnce(): Double = {
        if (cacheProducers(name)) evictCaches(spark)
        gc.maybe()
        val t0 = System.nanoTime()
        // release single-query checkpoint residue OUTSIDE the timed span,
        // and on FAILURE too (finally): queries cut transients eagerly at
        // construction, so a run that throws mid-write has already pinned
        // blocks — left around, they bleed eviction/spill pressure into
        // the NEXT query's timed runs (measured 2-4x drift)
        try {
          execute(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } finally Transients.drop(spark)
      }
      val timed: Option[Seq[Double]] = try {
        val first = timeOnce()
        // median-of-3 for anything slow enough to move the total, and for
        // every stream drain (drain-cycle spread dominates their variance).
        // Threshold 1 s (was 2 s until r10): the only unadjudicable
        // driver-vs-builder movers left were single-shot 1-2 s queries
        // with no spread to read; the 1-2 s band is small, so the added
        // bench cost is bounded and the spread map now covers the entire
        // dispute surface (VERDICT r10 #4)
        if (first > 1.0 || name.contains("_stream"))
          Some(Seq(first, timeOnce(), timeOnce()))
        else Some(Seq(first))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
      // a failed query must not shrink the total into a better score:
      // report -1 so the driver (and a human) can see the failure
      (name, timed, timed.isDefined)
    }
    def median(rs: Seq[Double]): Double = rs.sorted.apply(rs.size / 2)
    val qs = results.map { case (k, v, _) =>
      "\"" + k + "\":" + v.map(median).getOrElse(-1.0)
    }.mkString("{", ",", "}")
    // per-query run spread — the self-adjudication evidence (VERDICT r9
    // #2): twice in three rounds the driver's gating run inflated the
    // shuffle-heavy tail 3-11x vs same-code builder runs, and the dispute
    // could only be settled out-of-band. With min/max/all-runs in the
    // artifact itself, "median 11.8 off runs 2.1,11.8,12.0" (ambient
    // contention mid-run) reads differently from "3 tight runs at 11.8"
    // (real regression) without git archaeology. Additive: the driver's
    // parser keeps reading `queries` medians.
    // Locale.ROOT: the f-interpolator formats under the default locale,
    // and a comma decimal separator would corrupt the JSON artifact
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val spread = results.collect { case (k, Some(rs), _) =>
      "\"" + k + "\":{\"min\":" + d3(rs.min) +
        ",\"med\":" + d3(median(rs)) +
        ",\"max\":" + d3(rs.max) +
        ",\"runs\":[" + rs.map(d3).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // any failure poisons the headline metric — a crashed query must never
    // read as a faster total
    val total = if (results.exists(!_._3)) -1.0
      else results.map(r => median(r._2.get)).sum
    val probeEnd = calibrationProbe(spark)
    val probe = s"""{"start":${d3(probeStart)},"mid":${d3(probeMid)},""" +
      s""""end":${d3(probeEnd)}}"""
    val subset = only.map(o => s""","subset":${o.size}""").getOrElse("")
    val mode = if (clusterMode) s""","mode":"$master"""" else ""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failed,"probe":$probe,"sf":"$sfDir"$mode$subset}"""
    println(json)
    // durable copy of the complete per-query set (stdout capture has
    // truncated the tail of this line before — see the scaladoc)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] $outFile write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
