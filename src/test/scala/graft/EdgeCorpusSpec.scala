package graft

import org.scalatest.funsuite.AnyFunSuite

/** THE ADVERSARIAL EDGE-CORPUS GATE (round-11 VERDICT item 1): every
  * registered query replays against the [[GenEdge]] corpora — empty,
  * single-row, and adversarial (all-NULL text, NULL/single-word names,
  * single-candidate pools, tie saturation, overflow-boundary values) —
  * through the EXACT driver pipeline: `Verify.dump` writes each result as
  * parquet, and `tools/check_oracle.py` (the driver's DuckDB-compare
  * replica) hash-compares it against the oracle SQL over the same corpus.
  *
  * Contract: every query either matches the oracle on every corpus or
  * carries a one-line DISPOSITION below. A query that crashes, loses its
  * match, or HEALS (a stale disposition) fails this spec — this converts
  * the manual review passes that found ~21 bugs in rounds 9-10 into a
  * standing gate.
  *
  * The oracle replay needs the driver-side python3 + duckdb + pyarrow
  * stack (the same one the round gate itself runs on); on a box without
  * it the suite cancels with an explicit message, mirroring
  * S3aSmokeSpec's env-gating.
  */
class EdgeCorpusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val duckdbOk = scala.util.Try(
    scala.sys.process.Process(
      Seq("python3", "-c", "import duckdb, pyarrow, pandas")).! == 0
  ).getOrElse(false)

  /** (flavor, query) -> one-line reason a non-pass is EXPECTED there.
    * Every entry is re-asserted each run: if the query starts passing,
    * the stale disposition fails the spec and must be deleted. */
  private val dispositions: Map[(String, String), String] = {
    val streamLoudReject = Seq("q60_stream_sessionize", "q108_stream_transitions",
      "q137_stream_ewma", "q158_stream_left_join", "q164_stream_cascade",
      "q176_stream_debounce", "q187_stream_session_window",
      "q193_stream_full_outer_join", "q250_stream_timer_sessions")
      .map(q => ("empty", q) ->
        ("streaming an empty table is a configuration error: the drain " +
          "rejects it loud by design (sentinel staging needs a watermark " +
          "to advance) — the batch twins all handle empty input"))
    val rollupEmpty = Seq("q08_rollup", "q09_cube", "q27_grouping_sets",
      "q218_grouping_flags")
      .map(q => ("empty", q) ->
        ("ANSI GROUPING SETS emit the global () row over empty input " +
          "(count 0); Spark's Expand-based rollup/cube generates grouping-" +
          "set rows FROM input rows, so zero input rows yield zero output " +
          "rows — engine-inherent (SPARK semantics), empty corpus only"))
    (streamLoudReject ++ rollupEmpty ++ Seq(
      ("empty", "q52_approx_distinct") ->
        ("rows-only by adjudication (no oracle SQL can replay Spark's " +
          "HLL++ bytes) and the rows>0 check cannot hold on a corpus " +
          "that is empty by construction")
    )).toMap
  }

  /** Parse check_oracle.py stdout: per-query verdict lines. */
  private def parseOracle(out: String): Map[String, String] =
    out.linesIterator.collect {
      case l if l.startsWith("pass ") =>
        l.stripPrefix("pass ").takeWhile(_ != ':') -> "pass"
      case l if l.startsWith("FAIL ") =>
        l.stripPrefix("FAIL ").takeWhile(_ != ':') -> l
    }.toMap

  for (flavor <- GenEdge.Flavors)
    test(s"all registered queries match the DuckDB oracle on the $flavor corpus") {
      assume(duckdbOk,
        "python3+duckdb+pyarrow (the driver's oracle stack) not available")
      if (flavor == "skewed")
        TestSpark.requireTestdata(GenEdge.SkewSource)
      val base = java.nio.file.Files.createTempDirectory(s"graft_edge_$flavor")
      try {
        GenEdge.write(spark, base.toString, flavor)
        val outDir = s"$base/_verify"
        val crashed = Verify.dump(spark, base.toString, outDir).toSet
        val sb = new StringBuilder
        val code = scala.sys.process.Process(
          Seq("python3", "tools/check_oracle.py", base.toString, outDir))
          .!(scala.sys.process.ProcessLogger(l => { sb.append(l).append('\n'); () },
            l => { sb.append(l).append('\n'); () }))
        assert(code == 0 || code == 1, s"check_oracle.py broke:\n$sb")
        val verdicts = parseOracle(sb.toString())
        // crashed queries never wrote parquet, so the compare can't see
        // them — fold them in as failures explicitly (gate hole otherwise)
        val results = verdicts ++ crashed.map(q => q -> s"CRASH $q (Verify.dump)")
        assert(results.keySet == SparkEntry.queries.keySet,
          s"gate coverage hole — missing verdicts for: " +
            s"${(SparkEntry.queries.keySet -- results.keySet).toSeq.sorted.mkString(", ")}")
        val failures = results.collect {
          case (q, v) if v != "pass" && !dispositions.contains((flavor, q)) =>
            s"$q: $v"
        }
        assert(failures.isEmpty,
          s"undispositioned failures on the $flavor corpus:\n" +
            failures.toSeq.sorted.mkString("\n"))
        // stale dispositions: an expected failure that now PASSES must be
        // removed (the list stays honest)
        val healed = dispositions.keys.collect {
          case (f, q) if f == flavor && results.get(q).contains("pass") => q
        }
        assert(healed.isEmpty,
          s"dispositions for now-PASSING queries on $flavor — delete them: " +
            healed.toSeq.sorted.mkString(", "))
      } finally FsUtil.deleteRec(base)
    }

  /** The skewed flavor exists to run the SALTED code paths through the
    * oracle replay above — this asserts they are genuinely active there:
    * every blocked matcher's salt fanout exceeds 1 on that corpus (built
    * from the exact internal relations the queries use — see
    * DedupOps.saltFanoutAudit). Without it, a threshold change could
    * silently turn the whole gate back into an unsalted replay. */
  test("the skewed corpus drives every salted matcher's fanout past 1") {
    TestSpark.requireTestdata(GenEdge.SkewSource)
    val base = java.nio.file.Files.createTempDirectory("graft_edge_skewfan")
    try {
      GenEdge.write(spark, base.toString, "skewed")
      val audit = ops.DedupOps.saltFanoutAudit(spark, base.toString)
      assert(audit.nonEmpty && audit.values.forall(_ > 1),
        s"salt paths NOT active on the skewed corpus: $audit")
    } finally {
      Transients.drop(spark)
      FsUtil.deleteRec(base)
    }
  }
}
