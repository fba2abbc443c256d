package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** The store-maintenance skeleton shared by the vector index store
  * ([[graft.ext.Similarity.maintainIndexStore]]) and the postings store
  * ([[graft.ext.TextAnalysis.maintainHybridStore]]): repair any
  * interrupted predecessor cycle, evaluate the trigger policy against
  * DURABLE store state, and — iff it fires — write the consolidated
  * store COMPLETELY into the swap staging dir and install it by
  * [[StoreSwap]]'s crash-recoverable protocol. The two stores differ
  * only in how they count committed work (an FS listing of `delta=`
  * dirs vs a metadata stats-row count) and in their consolidation
  * function; the recover → threshold → stage → swap ORDER is the
  * invariant this seam pins once, so the lifecycle gates
  * (q292/q293/q297/q298) exercise one protocol through two
  * instantiations instead of two hand-rolled copies that could drift.
  */
object StoreMaintenance {

  /** One maintenance cycle over an in-place store root.
    *
    * @param shouldFire the trigger policy, evaluated AFTER recovery (so a
    *        repaired root is what gets counted); must read only durable
    *        store state — the store's own layout or metadata — never an
    *        external counter that could drift from what is on disk
    * @param consolidate writes the COMPLETE consolidated store into the
    *        given staging dir; nothing is installed until it returns
    * @return true iff the policy fired and the store root was swapped */
  def cycle(fs: FileSystem, root: String)(shouldFire: => Boolean)(
      consolidate: Path => Unit): Boolean = {
    StoreSwap.recover(fs, root)
    if (!shouldFire) false
    else {
      val staging = StoreSwap.begin(fs, root)
      consolidate(staging)
      StoreSwap.commit(fs, root)
      true
    }
  }
}
