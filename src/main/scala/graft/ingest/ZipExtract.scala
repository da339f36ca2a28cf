package graft.ingest

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.ZipInputStream
import org.slf4j.LoggerFactory

/** Driver-side zip extraction — the Spark rebuild of the reference's `unzip`
  * (/root/reference/src/main.rs:153-170), for the single-small-archive case.
  * (The distributed path for many/large archives is ZipSource.)
  *
  * Contract preserved:
  *  - flat archives: entries are written directly under `outputDir`; parent
  *    directories are NOT created for nested entries (main.rs:165 panics on
  *    them; here they are skipped with a warning, which is strictly safer);
  *  - zip-slip protection: entries whose resolved path escapes `outputDir`
  *    are silently skipped (`enclosed_name` semantics, main.rs:160-163).
  */
object ZipExtract {
  private val log = LoggerFactory.getLogger(getClass)

  /** @return names of the entries actually extracted. */
  def toLocal(zipPath: String, outputDir: String): Seq[String] = {
    val outRoot: Path = new File(outputDir).toPath.toAbsolutePath.normalize
    Files.createDirectories(outRoot)
    val zis = new ZipInputStream(new FileInputStream(zipPath))
    val extracted = Seq.newBuilder[String]
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        val target = outRoot.resolve(entry.getName).normalize
        if (!target.startsWith(outRoot)) {
          // zip-slip: skip silently, as the reference's enclosed_name does
          log.debug(s"Skipping unsafe zip entry: ${entry.getName}")
        } else if (entry.isDirectory || entry.getName.contains("/") ||
            entry.getName.contains("\\")) {
          // '\\' counts as a separator too, matching ZipSource.expand
          log.warn(s"Skipping non-flat zip entry: ${entry.getName}")
        } else {
          val out = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zis.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = zis.read(buf) }
          } finally out.close()
          extracted += entry.getName
          log.info(s"Extracted ${entry.getName}")
        }
        zis.closeEntry()
        entry = zis.getNextEntry
      }
    } finally zis.close()
    extracted.result()
  }
}
