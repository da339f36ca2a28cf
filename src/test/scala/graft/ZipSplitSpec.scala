package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{ZipEntrySplits, ZipSource}

class ZipSplitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): File = {
    val d = java.nio.file.Files.createTempDirectory("graft_zipsplit").toFile
    d.deleteOnExit(); d
  }

  /** Archive with deflated + stored entries, a directory, and unsafe names. */
  private def writeFixture(dir: File, name: String, entries: Int): File = {
    val f = new File(dir, name)
    val zos = new ZipOutputStream(new FileOutputStream(f))
    (1 to entries).foreach { i =>
      zos.putNextEntry(new ZipEntry(s"part$i.bin"))
      zos.write(Array.fill(1000 + i)((i % 251).toByte))
      zos.closeEntry()
    }
    // a STORED (uncompressed) entry: requires size+crc up front
    val stored = "stored entry payload".getBytes("UTF-8")
    val crc = new CRC32(); crc.update(stored)
    val se = new ZipEntry("stored.txt")
    se.setMethod(ZipEntry.STORED)
    se.setSize(stored.length); se.setCompressedSize(stored.length)
    se.setCrc(crc.getValue)
    zos.putNextEntry(se); zos.write(stored); zos.closeEntry()
    // skipped by the flat-archive contract
    zos.putNextEntry(new ZipEntry("sub/dir/nested.bin"))
    zos.write(Array[Byte](1, 2, 3)); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("folder/")); zos.closeEntry()
    zos.close()
    f
  }

  test("split expansion equals stream expansion, byte for byte") {
    val dir = tmpDir()
    writeFixture(dir, "a.zip", entries = 6)
    writeFixture(dir, "b.zip", entries = 3)
    val glob = s"${dir.getAbsolutePath}/*.zip"
    def norm(ds: org.apache.spark.sql.Dataset[ZipSource.ZipEntryRow]) = ds
      .collect().map(r => (new File(r.archive.stripPrefix("file:")).getName,
        r.entry, r.content.toSeq)).sortBy(t => (t._1, t._2)).toSeq
    val bySplits = norm(ZipEntrySplits.expand(spark, glob))
    val byStream = norm(ZipSource.expand(spark, glob))
    assert(bySplits === byStream)
    assert(bySplits.nonEmpty)
    // stored + deflated both present, unsafe entries absent
    assert(bySplits.exists(_._2 == "stored.txt"))
    assert(!bySplits.exists(_._2.contains("/")))
  }

  test("one archive fans out to MANY tasks (the non-splittable-format fix)") {
    val dir = tmpDir()
    writeFixture(dir, "big.zip", entries = 12)
    val ds = ZipEntrySplits.expand(spark, s"${dir.getAbsolutePath}/big.zip")
    val parts = ds.select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().as[Int].collect()
    assert(parts.length > 1, s"expected >1 task, got ${parts.length}")
    assert(ds.count() === 13) // 12 deflated + 1 stored; nested+dir skipped
  }

  test("driver listing carries offsets, not content; entries parse correctly") {
    val dir = tmpDir()
    writeFixture(dir, "a.zip", entries = 2)
    val splits = ZipEntrySplits.listEntries(spark, s"${dir.getAbsolutePath}/a.zip")
    assert(splits.map(_.entry).toSet === Set("part1.bin", "part2.bin", "stored.txt"))
    splits.foreach { s =>
      assert(s.localHeaderOffset >= 0 && s.compressedSize > 0)
      assert(s.method == 0 || s.method == 8)
    }
    val stored = splits.find(_.entry == "stored.txt").get
    assert(stored.method === 0)
    assert(stored.compressedSize === stored.uncompressedSize)
  }

  test("truncated central directory fails hard, not silently short") {
    val dir = tmpDir()
    val f = writeFixture(dir, "trunc.zip", entries = 2)
    // no archive comment in the fixture, so the EOCD is the last 22 bytes;
    // declare one MORE entry than the directory holds (both the this-disk
    // and total u16 counts, offsets 8 and 10) — the walk must refuse to
    // stop quietly at the buffer edge
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val eocd = bytes.length - 22
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val declared = u16(eocd + 10) + 1
    Seq(eocd + 8, eocd + 10).foreach { o =>
      bytes(o) = (declared & 0xff).toByte
      bytes(o + 1) = ((declared >> 8) & 0xff).toByte
    }
    java.nio.file.Files.write(f.toPath, bytes)
    val e = intercept[IllegalArgumentException] {
      ZipEntrySplits.listEntries(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("truncated central directory"))
  }

  test("non-zip input fails with a clear error") {
    val dir = tmpDir()
    val f = new File(dir, "not.zip")
    val out = new FileOutputStream(f)
    out.write(Array.fill(100)(7.toByte)); out.close()
    val e = intercept[IllegalArgumentException] {
      ZipEntrySplits.listEntries(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("end-of-central-directory"))
  }

  // ------------------------------------------------- graft-zip DataSourceV2
  test("graft-zip connector: one partition per entry, bytes match the expansion") {
    val dir = tmpDir()
    writeFixture(dir, "dsv2.zip", entries = 6)
    val path = new File(dir, "dsv2.zip").getAbsolutePath
    val df = spark.read.format("graft-zip").load(path)
    assert(df.schema.fieldNames.toSeq ===
      Seq("archive", "entry", "size", "content"))
    // per-ENTRY parallelism: 6 deflated + 1 stored = 7 flat entries
    assert(df.rdd.getNumPartitions === 7)
    val got = df.collect()
      .map(r => r.getAs[String]("entry") ->
        (r.getAs[Long]("size"), r.getAs[Array[Byte]]("content").toSeq)).toMap
    val expect = ZipEntrySplits.expand(spark, path).collect()
      .map(e => e.entry -> e.content.toSeq).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (entry, (size, bytes)) =>
      assert(bytes === expect(entry), entry)
      assert(size === bytes.length.toLong, entry)
    }
  }

  test("graft-zip connector: column pruning keeps content out of the scan schema") {
    val dir = tmpDir()
    writeFixture(dir, "prune.zip", entries = 3)
    val path = new File(dir, "prune.zip").getAbsolutePath
    val df = spark.read.format("graft-zip").load(path).select("entry", "size")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val readSchema = scans.head.scan.readSchema()
    assert(!readSchema.fieldNames.contains("content"), readSchema.treeString)
    // the metadata-only read still answers correctly
    assert(df.collect().map(_.getAs[String]("entry")).sorted.length === 4)
  }

  test("graft-zip connector: entry predicates prune input partitions at planning") {
    val dir = tmpDir()
    writeFixture(dir, "filter.zip", entries = 5)
    val path = new File(dir, "filter.zip").getAbsolutePath
    val df = spark.read.format("graft-zip").load(path)
      .filter(org.apache.spark.sql.functions.col("entry").endsWith(".bin"))
    // 5 part*.bin entries; stored.txt pruned BEFORE partition planning
    assert(df.rdd.getNumPartitions === 5)
    assert(df.count() === 5)
    val one = spark.read.format("graft-zip").load(path)
      .filter(org.apache.spark.sql.functions.col("entry") === "part3.bin")
    assert(one.rdd.getNumPartitions === 1)
    assert(one.select("size").head().getLong(0) === 1003L)
  }
}
