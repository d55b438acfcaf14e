package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Ownership registry for intra-plan persists.
  *
  * Many operators pin a narrow intermediate (token stream, scored
  * frame, signature table) because two or more subtrees of the ONE
  * returned lazy plan consume it — without the pin the corpus-sized
  * upstream re-executes per consumer. The returned frame is lazy, so
  * the operator itself can never unpersist (its consumers have not
  * run yet); left alone, each pin sits in the session CacheManager
  * forever — a slow storage-memory leak on executors in a long-lived
  * serving session.
  *
  * [[pin]] makes the lifetime explicit: the frame persists exactly as
  * before AND registers here; the session's driving loop (Verify and
  * Bench per query, the SQL CLI per statement, a serving layer per
  * request) calls [[release]] once the query's consumers have
  * materialized. Releasing is always CORRECT at any time — persist is
  * only a cache, the plan recomputes — so a forgotten release merely
  * matches the old behavior and an early release costs recompute,
  * never wrong answers.
  *
  * Persists with a structural owner (fit stages that unpersist in
  * `finally` — AnnIndex/DedupIndex/Bm25Index/NearDupIndex — and
  * streaming gates whose reference frame lives exactly as long as the
  * stream) do NOT go through here.
  */
object Pins {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist (MEMORY_AND_DISK) and register for the next [[release]]. */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(ds)
    ds
  }

  /** Unpersist every registered pin (non-blocking). Call after a
    * query's consumers have materialized. Unpersisting a frame that
    * was already released by other means is a no-op. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
  }

  /** Currently-registered pin count (monitoring / specs). */
  def pending: Int = live.size()
}
