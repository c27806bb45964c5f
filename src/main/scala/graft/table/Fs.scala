package graft.table

import java.nio.file.{Files, Path}
import scala.collection.JavaConverters._
import scala.util.control.NonFatal

/** The repo's one copy of the fd-safe local-filesystem idioms (and the
  * writer-nonce), shared by the table, pipeline, and SQL-surface code.
  * `Files.list/walk` return an open directory stream that MUST be
  * closed — draining the iterator does not release the fd; unclosed, a
  * 10k-bucket commit exhausts the process fd limit within two commits
  * (measured round 2). Divergent hand-rolled copies of these few lines
  * are how that bug comes back. */
object Fs {

  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  def walkDir(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Depth-first delete; individual failures are swallowed (used for
    * best-effort sweeps of orphan/staged dirs). */
  def deleteRecursively(p: Path): Unit =
    walkDir(p).reverse.foreach(f =>
      try Files.deleteIfExists(f) catch { case NonFatal(_) => () })

  /** Writer-unique hex nonce (48 bits) for staged/delta dir names. */
  def nonce: String = java.lang.Long.toHexString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong() & 0xffffffffffffL)
}
