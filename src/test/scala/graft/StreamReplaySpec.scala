package graft

import org.scalatest.funsuite.AnyFunSuite

/** STANDING multi-batch replay gate (round 13): the full gate
  * (tools/stream_replay_gate.sh — all stream queries vs the DuckDB
  * oracle at sf0.1 in replay mode) stays a script; this spec keeps the
  * cross-batch machinery itself under `sbt test` by forking
  * [[StreamReplayCheck]] on three queries chosen to span the state
  * shapes that only multi-batch execution exercises:
  *
  *   - q137_stream_ewma — order-sensitive buffered replay: holds rows
  *     inside the watermark delay and emits the safe prefix per batch;
  *     a cross-batch ordering or hold/flush bug changes every smoothed
  *     value downstream.
  *   - q193_stream_full_outer_join — join-state eviction against
  *     bounded-late rows plus typed watermark sentinels, which in
  *     replay mode must arrive as the LAST slice (the one-source
  *     discipline withSentinelDrain switches to).
  *   - q225_stream_kmv — transformWithState on RocksDB: value-state
  *     commit/reload between real micro-batches, then the two-phase
  *     flush sentinel as a strictly later batch.
  *
  * Each must fingerprint-match its normal single-batch drain AND run
  * more than one data micro-batch (StreamReplayCheck enforces both).
  * Child mechanics mirror SpillSmokeSpec (dedicated JVM so the replay
  * JVM property cannot leak into concurrently running stream specs). */
class StreamReplaySpec extends AnyFunSuite {

  test("stream queries stay exact when replayed as real micro-batches") {
    val sf = s"${GenEdge.TestdataRoot}/sf0.01"
    TestSpark.requireTestdata(sf)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-Dspark.sql.legacy.parquet.nanosAsLong=true",
      "-cp", sys.props("java.class.path"),
      "graft.StreamReplayCheck", sf,
      "q137_stream_ewma,q193_stream_full_outer_join,q225_stream_kmv", "4")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(java.nio.file.Files.createTempDirectory("graft_replaysmoke").toFile)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => { p.getInputStream.transferTo(buf); () })
    reader.setDaemon(true)
    reader.start()
    val finished = p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      fail(s"StreamReplayCheck smoke timed out:\n${buf.toString.takeRight(4000)}")
    }
    reader.join(10000)
    val out = buf.toString
    val verdict = out.linesIterator.find(_.contains("\"gate\":\"stream_replay\""))
    assert(p.exitValue() == 0 && verdict.exists(_.contains("\"all_match\":true")),
      s"StreamReplayCheck smoke exit ${p.exitValue()}; verdict: " +
        s"${verdict.getOrElse("<none>")}\ntail:\n${out.takeRight(4000)}")
  }
}
