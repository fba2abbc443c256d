package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed, map-side-combining
  * `Aggregator` — the bounded-memory answer to "top tokens over a 100 TB
  * corpus" when the exact vocabulary aggregation (one hash-table entry per
  * DISTINCT key, shuffled) is itself the bottleneck.
  *
  * Each partition folds its rows into at most `k` counters (Misra & Gries
  * 1982): an incoming key increments its counter, opens a new one while
  * fewer than `k` are live, and otherwise decrements EVERY live counter by
  * one (dropping zeros) — each such eviction retires k+1 occurrences, so
  * evictions happen at most N/(k+1) times and the final counter of any key
  * undercounts its true frequency by at most N/(k+1). Partial sketches
  * combine by summing counters and, if more than `k` survive, subtracting
  * the (k+1)-th largest combined count from all of them (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) — the per-input error bounds ADD, so
  * for ANY merge tree over a stream of N total rows:
  *
  *   f(x) − N/(k+1)  ≤  estimate(x)  ≤  f(x)        for every key x, and
  *   every x with f(x) > N/(k+1) is present in the output.
  *
  * Those two inequalities hold REGARDLESS of partitioning and merge order —
  * which keys appear (beyond the guaranteed ones) and their exact estimates
  * do not. Queries gated on a deterministic oracle must therefore compare
  * the BOUNDS (always-true booleans against exact counts, the q39 sketch
  * discipline), never raw estimates.
  *
  * Scale shape: the buffer is O(k) no matter how many distinct keys flow
  * through, partials combine map-side, and only |groups|·k counter pairs
  * cross the exchange — vs the exact form's |vocabulary| hash entries. A
  * null key contributes nothing (SQL aggregate-input semantics; it also
  * does not count toward the N of the error bound).
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    if (key == null) buf
    else buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        // full and unseen: decrement all, drop zeros — the new key is NOT
        // stored (classic MG; its single occurrence is among the k+1 retired)
        buf.flatMap { case (x, c) => if (c > 1L) Some(x -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (x, c)) =>
      m.updated(x, m.getOrElse(x, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from every counter: at most k
      // survive, and the subtraction retires t·(#counters) ≥ t·(k+1)
      // occurrences — the same amortization as the streaming decrement
      val t = combined.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      combined.flatMap { case (x, c) => if (c > t) Some(x -> (c - t)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
