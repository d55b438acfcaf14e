package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** SINGLE-WRITER fencing for the persisted lake indexes (s11–s14).
  *
  * The index tables are plain v1 lake tables: an append is several
  * non-atomic table writes plus a metadata row rewrite, so two
  * concurrent writers can interleave into an index whose sidecar
  * (bloom bits, centroids, stats) disagrees with its postings — a
  * corruption no reader can detect. Until an open table format with
  * snapshot isolation is available (the declared dependency wall),
  * the contract is REFUSE, not merge: every mutating entry point
  * takes this advisory lock and a second writer fails fast with a
  * clear error instead of corrupting silently.
  *
  * Mechanism: an exclusive-create marker file next to the warehouse
  * (`FileSystem.create(…, overwrite = false)` — atomic on POSIX and
  * HDFS; BEST-EFFORT on eventually-consistent object stores, which is
  * exactly the class of store the table-format wall exists for).
  * The lock is released in `finally`; a writer that died without
  * cleanup leaves a stale marker that [[break]] clears explicitly —
  * deliberate, so a human (or an orchestration retry policy that
  * knows the writer is dead) makes that call, not a race.
  */
object LakeLock {

  /** The lock-conflict signal — a SUBCLASS of IllegalStateException so
    * every existing catch keeps working, but callers that must only
    * swallow CONTENTION (st39's skip-on-contended-refresh) can match
    * this type and let a genuinely unexpected IllegalStateException
    * from the body propagate instead of being misread as "another
    * writer holds the lock". */
  final class Contended(msg: String) extends IllegalStateException(msg)

  private def lockPath(spark: SparkSession, name: String): Path =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"$name._graft_writer.lock")

  /** Run `body` holding `name`'s writer lock; throws
    * `IllegalStateException` if another writer holds it. */
  def withWriter[T](spark: SparkSession, name: String)(body: => T): T = {
    val p = lockPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // local FS: Hadoop's create(overwrite=false) is check-then-act,
    // NOT atomic — go through java.nio O_EXCL (the SnapshotTable CAS
    // lesson); HDFS create is NameNode-atomic as-is
    try {
      val qp = fs.makeQualified(p)
      if (qp.toUri.getScheme == "file") {
        val local = java.nio.file.Paths.get(qp.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
        ()
      } else fs.create(p, /* overwrite = */ false).close()
    } catch {
      // ONLY the exists-already signals mean "another writer holds it";
      // a broader IOException catch here misdiagnosed permissions/disk
      // failures as lock conflicts and sent callers to break()/retry
      // storms instead of surfacing the real error
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        throw new Contended(
          s"index '$name' is SINGLE-WRITER: another fit/append holds " +
          s"$p. Lake tables have no snapshot isolation (the open-table-" +
          "format dependency wall); retry after the other writer " +
          "finishes, or LakeLock.break(spark, name) if it died.")
    }
    try body
    finally { fs.delete(p, false); () }
  }

  /** Clear a stale lock left by a writer that died mid-append. The
    * caller asserts no writer is live — this is the human override,
    * never called by the library itself. */
  def break(spark: SparkSession, name: String): Boolean = {
    val p = lockPath(spark, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Is the writer lock currently held? (monitoring / specs) */
  def held(spark: SparkSession, name: String): Boolean = {
    val p = lockPath(spark, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
