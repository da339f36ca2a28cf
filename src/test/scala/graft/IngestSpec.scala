package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest._

/** Parity-pipeline tests against generated fixtures, mirroring the reference
  * contract (FIXTURES.md §A): 19-column CSV, advisory verifier, fail-hard
  * projection, zip-slip skipping, warm-path short-circuit. */
class IngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmpDir(): File = Files.createTempDirectory("graft_ingest").toFile

  private val header = AirQualitySchema.expectedColumns
    .map(c => "\"" + c + "\"").mkString(",")
  private def csvBody(rows: Int): String =
    (0 until rows).map { i =>
      val date = f"2020-01-${i % 28 + 1}%02d"
      val nums = (0 until 16).map(j => (i * 16 + j) / 10.0).mkString(",")
      s""""$date",$nums,"C$i","id$i""""
    }.mkString("\n")
  private def writeCsv(dir: File, name: String, text: String): File = {
    val f = new File(dir, name)
    Files.writeString(f.toPath, text)
    f
  }

  test("full pipeline: read once, verify, project 8 of 19, single parquet file") {
    val dir = tmpDir()
    val csv = writeCsv(dir, "data.csv", header + "\n" + csvBody(50))
    val out = new File(dir, "out.parquet")
    val conf = IngestPipeline.Config(csv.getPath, None, out.getPath)
    val projected = IngestPipeline.run(spark, conf)
    assert(projected.columns.toSeq === AirQualitySchema.projectedColumns)
    val written = spark.read.parquet(out.getPath)
    assert(written.count() === 50)
    assert(written.columns.toSeq === AirQualitySchema.projectedColumns)
    // single-file contract (O6): exactly one part file
    assert(out.listFiles().count(_.getName.endsWith(".parquet")) === 1)
  }

  test("verifier: advisory — missing expected warns, unexpected extra noted, run proceeds") {
    val dir = tmpDir()
    val noO3 = AirQualitySchema.expectedColumns.filterNot(_ == "O3")
    val csv = writeCsv(dir, "data.csv",
      noO3.map(c => "\"" + c + "\"").mkString(",") + ",\"extra_sensor\"\n" +
        (noO3.map(_ => "1").mkString(",") + ",42"))
    val df = IngestPipeline.readCsv(spark, csv.getPath)
    val report = SchemaVerifier.verify(df)
    assert(report.missing === Seq("O3"))
    assert(report.unexpected === Seq("extra_sensor"))
    assert(!report.ok)
    // projection then fails hard, as the reference's ColumnNotFound does
    intercept[AnalysisException] { IngestPipeline.project(df).collect() }
  }

  test("zip extract: flat entries extracted, traversal + nested entries skipped") {
    val dir = tmpDir()
    val zipFile = new File(dir, "data.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    def add(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    add("good.csv", "a,b\n1,2")
    add("../evil.csv", "pwned")
    add("nested/deep.csv", "x")
    zos.close()
    val outDir = new File(dir, "unzipped")
    val extracted = ZipExtract.toLocal(zipFile.getPath, outDir.getPath)
    assert(extracted === Seq("good.csv"))
    assert(new File(outDir, "good.csv").exists())
    assert(!new File(dir, "evil.csv").exists())
    assert(!new File(outDir, "evil.csv").exists())
  }

  test("warm path short-circuit: existing CSV is not re-extracted") {
    val dir = tmpDir()
    val csv = writeCsv(dir, "data.csv", header + "\n" + csvBody(3))
    // zipPath=None would throw on the cold path; presence of csv short-circuits
    IngestPipeline.ensureCsv(IngestPipeline.Config(csv.getPath, None, "unused"))
  }

  test("distributed zip source: binaryFile + flatMap expansion") {
    val dir = tmpDir()
    val zipFile = new File(dir, "archive.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("part1.csv"))
    zos.write((header + "\n" + csvBody(5)).getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("../bad.csv"))
    zos.write("nope".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val entries = ZipSource.expand(spark, zipFile.getPath).collect()
    assert(entries.map(_.entry).toSeq === Seq("part1.csv"))
    val parsed = ZipSource.expandCsv(spark, zipFile.getPath)
    assert(parsed.count() === 5)
    assert(parsed.columns.length === 19)
  }

  test("expandCsv keeps data rows byte-equal to the header, drops only line 1") {
    val dir = tmpDir()
    val zipFile = new File(dir, "hdr.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("a.csv"))
    // line 2 repeats the header text verbatim — it is DATA and must survive
    zos.write(s"$header\n$header\n${csvBody(2)}".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val parsed = ZipSource.expandCsv(spark, zipFile.getPath)
    assert(parsed.count() === 3)
  }

  test("expandCsv of a header-only archive yields an empty frame with the right columns") {
    val dir = tmpDir()
    val zipFile = new File(dir, "empty.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("a.csv"))
    zos.write((header + "\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val parsed = ZipSource.expandCsv(spark, zipFile.getPath)
    assert(parsed.count() === 0)
    assert(parsed.columns.length === 19)
  }

  test("expandCsv fails hard on an entry whose header differs") {
    val dir = tmpDir()
    val zipFile = new File(dir, "mismatch.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    zos.putNextEntry(new ZipEntry("a.csv"))
    zos.write(s"$header\n${csvBody(2)}".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("b.csv"))
    // same columns, different order: silently parsing under a.csv's header
    // would corrupt every row, so the contract is a loud failure
    zos.write(("\"id\"," + header.stripSuffix(",\"id\"") + "\nx,1,2\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val e = intercept[Throwable] { ZipSource.expandCsv(spark, zipFile.getPath).count() }
    assert(messages(e).exists(_.contains("does not match expected")), e.toString)
  }
}
