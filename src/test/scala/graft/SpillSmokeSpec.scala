package graft

import org.scalatest.funsuite.AnyFunSuite

/** STANDING memory-pressure gate (round-13 follow-through on VERDICT r12
  * item 1): the full spill gate (tools/spill_gate.sh — 16 heavy queries
  * × sf0.1+sf1, ~40 min) stays a script; this spec keeps the spill PATH
  * itself under `sbt test` by forking [[SpillCheck]] on the one query
  * that measurably spills at sf0.1 — q223_adamic_adar (380 MB disk
  * spill under 1 GiB executors, SPILLCHECK.json r13). It must complete
  * hash-exact vs the ample-memory run AND actually spill: if a future
  * q223 rewrite stops spilling at sf0.1 this fails loudly, and the
  * right fix is pointing the smoke at whatever heavy query then spills
  * — the suite must always exercise spill-on-real-work somewhere.
  *
  * Child mechanics mirror ClusterSmokeSpec (own SparkContexts, staged
  * SPARK_HOME farm); CWD is a temp dir so the child's
  * SPILLCHECK_sf0.1.json can never clobber the committed artifact.
  */
class SpillSmokeSpec extends AnyFunSuite {

  test("q223 spills under 1 GiB executors and stays hash-exact") {
    val sf01 = s"${GenEdge.TestdataRoot}/sf0.1"
    TestSpark.requireTestdata(sf01)
    assume(new java.io.File("/opt/spark/jars").isDirectory,
      "/opt/spark distribution not present — cannot launch executor JVMs")
    import java.nio.file.{Files, Paths}
    val sh = Paths.get("/tmp/graft_spark_home")
    Files.createDirectories(sh)
    Seq("jars", "conf", "RELEASE").foreach { n =>
      val link = sh.resolve(n)
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, Paths.get(s"/opt/spark/$n"))
    }
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-Dspark.sql.legacy.parquet.nanosAsLong=true",
      "-cp", sys.props("java.class.path"),
      "graft.SpillCheck", sf01, "q223_adamic_adar")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(Files.createTempDirectory("graft_spillsmoke").toFile)
    pb.environment().put("SPARK_HOME", sh.toString)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => { p.getInputStream.transferTo(buf); () })
    reader.setDaemon(true)
    reader.start()
    val finished = p.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) {
      p.destroyForcibly()
      fail(s"SpillCheck smoke timed out:\n${buf.toString.takeRight(4000)}")
    }
    reader.join(10000)
    val out = buf.toString
    val verdict = out.linesIterator.find(_.contains("\"gate\":\"spill\""))
    assert(p.exitValue() == 0 && verdict.exists(_.contains("\"all_match\":true")),
      s"SpillCheck smoke exit ${p.exitValue()}; verdict: " +
        s"${verdict.getOrElse("<none>")}\ntail:\n${out.takeRight(4000)}")
    assert(verdict.exists(_.contains("\"queries_spilled\":1")),
      "q223 no longer spills at sf0.1 under 1 GiB executors — the suite " +
        "must exercise spill on real work: point this smoke at a heavy " +
        s"query that does. verdict: ${verdict.getOrElse("<none>")}")
  }
}
