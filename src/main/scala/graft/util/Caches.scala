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
  * per-query handle discipline before sharing a session. ENFORCED: while
  * handles are live, [[register]] from a second thread throws — a future
  * parallel runner fails loudly at its first pinned query instead of
  * silently recomputing a pinned range exchange under a racing release.
  */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val owner = new java.util.concurrent.atomic.AtomicReference[Thread](null)

  /** Track a persisted dataset for later [[releaseAll]]; returns it.
    * Throws [[IllegalStateException]] if another thread holds live
    * handles (the single-runner contract above). */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    val me = Thread.currentThread()
    val prev = owner.compareAndExchange(null, me)
    if (prev != null && (prev ne me))
      throw new IllegalStateException(
        s"Caches: register from '${me.getName}' while '${prev.getName}' holds " +
          "live handles — the registry supports ONE in-flight query; run " +
          "concurrent queries in separate processes (see the class contract)")
    live.add(ds); ds
  }

  /** Pin `ds` for multiple downstream consumers: materialize it EAGERLY so
    * concurrent consumer branches never race an uncached persist (each
    * racing branch recomputes the full upstream — the measured regression
    * whenever one of these pins was dropped). Mode is selected by the
    * session conf `spark.graft.pin.mode`:
    *
    *  - `persist` (default): MEMORY_AND_DISK persist + eager count,
    *    [[register]]ed for [[releaseAll]] — right for a long-lived
    *    single-JVM session (Verify/Bench/specs) where the block manager
    *    owns the lifetime.
    *  - `checkpoint`: a RELIABLE `ds.checkpoint(eager = true)` when the
    *    SparkContext has a checkpoint directory — the production setting
    *    at 100 TB: the pinned frame lands on the cluster FS, survives
    *    executor loss, and TRUNCATES the lineage instead of keeping the
    *    upstream plan resident. Without a checkpoint dir it degrades to
    *    `localCheckpoint(eager = true)` (executor-local, lineage still
    *    cut). Reliable checkpoint files are reclaimed by the
    *    ContextCleaner when
    *    `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
    *    the cluster's checkpoint-dir retention job otherwise.
    *
    * Downstream consumers MUST use the RETURNED handle (in checkpoint mode
    * it is a different Dataset whose plan reads the checkpoint files). */
  def pin[T](ds: Dataset[T]): Dataset[T] =
    ds.sparkSession.conf.get("spark.graft.pin.mode", "persist") match {
      case "persist" =>
        val p = register(ds.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        p.count()
        p
      case "checkpoint" =>
        if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined) {
          // Persist before the reliable checkpoint so the checkpoint-write
          // job reads the blocks the eager action computed instead of
          // recomputing the whole upstream plan a second time; drop the
          // staging blocks once the checkpoint files are the pin.
          val staged = ds.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try register(staged.checkpoint(eager = true))
          finally staged.unpersist(false)
        } else
          // Register the handle so releaseAll() frees the executor-local
          // blocks (they back the data — releaseAll's after-materialization
          // contract makes that safe, same as persist mode).
          register(ds.localCheckpoint(eager = true))
      case other => throw new IllegalArgumentException(
        s"spark.graft.pin.mode must be 'persist' or 'checkpoint', got '$other'")
    }

  /** Unpersist every registered dataset (non-blocking), clear the registry,
    * and release ownership; returns how many handles were released.
    * Idempotent — unpersisting an already-released dataset is a no-op. */
  def releaseAll(): Int = {
    var n = 0
    var ds = live.poll()
    while (ds != null) { ds.unpersist(false); n += 1; ds = live.poll() }
    owner.set(null)
    n
  }
}
