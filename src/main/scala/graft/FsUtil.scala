package graft

/** The one recursive-delete used by every staging-dir owner (stream
  * drains' sentinel dirs, the CDC state root, generator temp dirs). One
  * implementation because the idiom has two easy-to-forget details that
  * previously drifted apart across hand-rolled copies: the Files.walk
  * stream must be CLOSED (it pins a directory fd until then — the
  * round-9 ADVICE leak class), and deletion is best-effort per path
  * (cleanup of a temp dir must never mask the real result or exception
  * in whose finally-block it runs). */
object FsUtil {
  def deleteRec(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val paths = scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.toSeq)
      paths.sortBy(-_.getNameCount).foreach(f =>
        try java.nio.file.Files.deleteIfExists(f)
        catch { case _: Throwable => () })
    }
  }
}
