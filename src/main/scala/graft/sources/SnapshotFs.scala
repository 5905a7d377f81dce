package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Hadoop-`FileSystem` face of the lakehouse maintenance machinery
  * (staged-swap promotion, crash recovery, compaction, one-time
  * layout builds). Every listing / rename / delete the snapshot
  * paths perform routes through here rather than `java.io.File`, so
  * the SAME code runs against HDFS or an object store — at 100 TB
  * these maintenance passes execute against `s3a://`/`abfs://`
  * paths, where a `java.io.File` walk silently sees nothing. The
  * filesystem is resolved per-path from the active session's Hadoop
  * configuration (scheme-dispatched: `file:`, `hdfs:`, `s3a:`, …),
  * falling back to a default `Configuration` when no session is up
  * (shutdown hooks).
  *
  * Rename atomicity: `FileSystem.rename` is atomic on HDFS and on
  * `file:`; object stores emulate it. The staged-swap protocol
  * ([[Ingest.swapStaged]]) only needs per-DIRECTORY renames to be
  * all-or-nothing OR resumable — and it is resumable by design: a
  * partition is displaced only while its replacement still sits in
  * `.next`, so an interrupted copy-based rename is finished or
  * rolled back by [[Ingest.recoverSnapshot]].
  */
private[graft] object SnapshotFs {

  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path); fs(p).exists(p)
  }

  /** `_SUCCESS` marker check — "this directory's write committed". */
  def hasSuccess(path: String): Boolean = exists(path + "/_SUCCESS")

  def mkdirs(path: String): Unit = {
    val p = new Path(path); fs(p).mkdirs(p); ()
  }

  /** Children of `path`; empty when the path doesn't exist (the
    * `Option(listFiles)` idiom of the local-FS code). */
  def list(path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) f.listStatus(p).toSeq else Seq.empty
  }

  def hasChildren(path: String): Boolean = list(path).nonEmpty

  /** Recursive delete; no-op when absent. */
  def deleteTree(path: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Rename `from` onto `to` (parent must exist; `to` must not). */
  def rename(from: String, to: String): Unit = {
    val p = new Path(from)
    require(fs(p).rename(p, new Path(to)), s"rename $from -> $to failed")
  }
}
