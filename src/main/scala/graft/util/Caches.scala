package graft.util

import org.apache.spark.sql.Dataset

/** Session-lifetime release seam for `df.persist` sites inside catalog
  * queries. A persisted DataFrame is held STRONGLY by Spark's CacheManager
  * until an explicit `unpersist` — unlike `localCheckpoint` blocks, whose
  * RDDs are weakly referenced and reclaimed by the ContextCleaner after GC.
  * Queries that must pin a layout (GlobalCumsum's ranged frame) or share a
  * materialization across consumers (q153's exact-dup classes) register the
  * handle here; the long-lived runners (Verify, Bench, specs) call
  * [[releaseAll]] after each query's result is fully materialized, so a
  * full-catalog session holds at most one query's cache at a time instead
  * of accumulating blocks until memory pressure.
  *
  * Release must happen strictly AFTER the consuming action completes:
  * unpersisting early would let the two consumers of a pinned range
  * exchange recompute it with independently-sampled boundaries (the
  * nondeterminism the persist exists to prevent).
  *
  * CONTRACT — one in-flight query per registry: the registry is
  * process-global, so `releaseAll()` from one thread would unpersist a
  * pinned frame another thread is still consuming (and a recomputed range
  * exchange is exactly the wrong-answer hazard above). Every runner here
  * (Verify, Bench, the specs) executes catalog queries sequentially; a
  * concurrent runner must scope queries to separate processes or add a
  * per-query handle discipline before sharing a session.
  */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Track a persisted dataset for later [[releaseAll]]; returns it. */
  def register[T](ds: Dataset[T]): Dataset[T] = { live.add(ds); ds }

  /** Unpersist every registered dataset (non-blocking) and clear the
    * registry; returns how many handles were released. Idempotent —
    * unpersisting an already-released dataset is a no-op in Spark. */
  def releaseAll(): Int = {
    var n = 0
    var ds = live.poll()
    while (ds != null) { ds.unpersist(false); n += 1; ds = live.poll() }
    n
  }
}
