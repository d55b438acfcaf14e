package graft

import graft.operators.{DedupIndex, LakeLock}

/** Single-writer contract for the persisted lake indexes (s11–s14).
  *
  * Lake tables have no snapshot isolation (the open-table-format
  * dependency wall), so a concurrent second writer on the same index
  * is REFUSED with a clear error — asserted here, not left as silent
  * undefined behavior. The lock is advisory exclusive-create fencing
  * ([[graft.operators.LakeLock]]); crash recovery is an explicit
  * human `break`, never an automatic steal.
  */
class LakeLockSpec extends GraftSpec {
  import spark.implicits._

  private val Name = "graft_lockix"

  test("second writer on a locked index fails fast with the contract error") {
    val corpus = (1L to 50L).map(i => (i, s"lock spec text $i"))
      .toDF("doc_id", "text")
    DedupIndex.drop(spark, Name)
    DedupIndex.fit(corpus, Name)
    // a writer is live: simulate by taking the lock, then append
    val err = intercept[IllegalStateException] {
      LakeLock.withWriter(spark, Name) {
        DedupIndex.append(
          Seq((99L, "novel text under contention")).toDF("doc_id", "text"),
          Name)
      }
    }
    assert(err.getMessage.contains("SINGLE-WRITER"), err.getMessage)
    assert(!LakeLock.held(spark, Name)) // outer writer released in finally
  }

  test("lock releases after a completed append; a failed writer leaves a breakable lock") {
    val corpus = (1L to 40L).map(i => (i, s"lock spec two text $i"))
      .toDF("doc_id", "text")
    DedupIndex.drop(spark, Name)
    DedupIndex.fit(corpus, Name)
    // sequential writers are fine — the lock is per-write, not per-session
    DedupIndex.append(Seq((201L, "seq append one")).toDF("doc_id", "text"), Name)
    DedupIndex.append(Seq((202L, "seq append two")).toDF("doc_id", "text"), Name)
    assert(!LakeLock.held(spark, Name))
    // a body that throws still releases (finally)
    intercept[RuntimeException] {
      LakeLock.withWriter(spark, Name) { throw new RuntimeException("boom") }
    }
    assert(!LakeLock.held(spark, Name))
    // a dead writer's stale lock blocks until a human break()s it
    LakeLock.withWriter(spark, Name) {
      // steal the file to simulate the crash: re-create after release
    }
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"$Name._graft_writer.lock")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, false).close()
    assert(LakeLock.held(spark, Name))
    intercept[IllegalStateException] {
      DedupIndex.append(Seq((301L, "blocked")).toDF("doc_id", "text"), Name)
    }
    assert(LakeLock.break(spark, Name))
    assert(!LakeLock.held(spark, Name))
    DedupIndex.append(Seq((301L, "unblocked now")).toDF("doc_id", "text"), Name)
  }
}
