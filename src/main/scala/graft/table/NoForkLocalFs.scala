package graft.table

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without per-file subprocess forks.
  *
  * Without the Hadoop native library (absent in many container images —
  * Spark logs "Unable to load native-hadoop library"), every
  * `RawLocalFileSystem` file create and mkdir shells out to `chmod`
  * via `Shell.execCommand`: one fork/exec PER FILE. fork() copies the
  * JVM's page tables, so its cost grows with resident heap — measured
  * here as a session-long uniform slowdown of every write task (2x
  * over ~10k files at 32 g heap; thread dumps show all 32 task workers
  * in ProcessImpl.forkAndExec under setPermission). At high bucket
  * counts (one file per bucket per commit) this dominates the commit.
  *
  * The override drops the chmod: files keep the JVM's umask defaults,
  * which is correct for a single-user local deployment — and on a real
  * cluster the table lives on HDFS/S3 object storage where this class
  * (scheme `file`) never engages.
  *
  * Wire with: `.config("spark.hadoop.fs.file.impl",
  * classOf[graft.table.NoForkLocalFileSystem].getName)`.
  */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class NoForkLocalFileSystem
  extends LocalFileSystem(new NoForkRawLocalFileSystem)
