package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the replay STAGING contract (the gate above it is only as good
  * as the slicer): slices partition the source exactly (no row lost or
  * duplicated), the cut is deterministic across runs (hash jitter, no
  * RNG — a flaky corpus would make replay-vs-normal mismatches
  * unreproducible), slice files carry the strictly increasing mtimes the
  * delivery order rests on, and Replay.requireSource refuses slices cut
  * from a different SF dir (a silent wrong-corpus stream otherwise). */
class ReplayStageSpec extends AnyFunSuite {

  private val sf = s"${GenEdge.TestdataRoot}/sf0.001"

  test("slices partition the tables exactly and deterministically") {
    TestSpark.requireTestdata(sf)
    val spark = TestSpark.spark
    val out1 = java.nio.file.Files.createTempDirectory("graft_rs1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_rs2").toString
    try {
      ReplayStage.stage(spark, sf, out1, 4, 60L)
      ReplayStage.stage(spark, sf, out2, 4, 60L)
      for (table <- Seq("events", "documents")) {
        val orig = spark.read.parquet(s"$sf/$table.parquet")
        val sliced = spark.read.parquet(s"$out1/$table")
        // exact multiset partition: same count and same content hash
        assert(sliced.count() == orig.count(), s"$table row count drifted")
        assert(ClusterRecoveryDemo.fingerprint(sliced.select(orig.columns.map(
            org.apache.spark.sql.functions.col): _*)) ==
          ClusterRecoveryDemo.fingerprint(orig), s"$table content drifted")
        // determinism: per-slice row counts identical across two stagings
        def perSlice(dir: String) = new java.io.File(s"$dir/$table").listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .map(f => spark.read.parquet(f.toString).count()).toSeq
        assert(perSlice(out1) == perSlice(out2),
          s"$table slicing is not deterministic")
        // delivery-order contract: names and mtimes both strictly increase
        val files = new java.io.File(s"$out1/$table").listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        assert(files.map(_.lastModified).toSeq ==
          files.map(_.lastModified).toSeq.sorted.distinct,
          s"$table slice mtimes not strictly increasing in name order")
      }
    } finally {
      FsUtil.deleteRec(java.nio.file.Paths.get(out1))
      FsUtil.deleteRec(java.nio.file.Paths.get(out2))
    }
  }

  test("requireSource refuses slices cut from a different SF dir") {
    TestSpark.requireTestdata(sf)
    val out = java.nio.file.Files.createTempDirectory("graft_rs3").toString
    try {
      ReplayStage.stage(TestSpark.spark, sf, out, 2, 30L)
      sys.props("graft.stream.replay") = out
      try {
        graft.streaming.Replay.requireSource(sf) // the staged dir: fine
        val ex = intercept[IllegalStateException] {
          graft.streaming.Replay.requireSource("/tmp/not_the_staged_sf")
        }
        assert(ex.getMessage.contains("re-run graft.ReplayStage"))
      } finally sys.props -= "graft.stream.replay"
    } finally FsUtil.deleteRec(java.nio.file.Paths.get(out))
  }
}
