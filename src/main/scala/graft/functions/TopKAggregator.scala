package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregation. */
final case class SimCand(n_id: Long, sim: Double)

/** Bounded top-k-by-similarity as a typed `Aggregator` — the scale-correct
  * shape for nearest-neighbor reduction.
  *
  * A window (`row_number over (partition by query order by sim desc)`) must
  * SHUFFLE every scored candidate row to sort each query's full candidate
  * list; this aggregator keeps a bounded k-element buffer that combines
  * map-side, so per query only O(k) survives the exchange no matter how
  * large the corpus — at 100 TB that is the difference between shuffling
  * |queries|·|corpus| rows and |queries|·k.
  *
  * Ordering matches the window form exactly: best similarity first, ties
  * broken by ascending candidate id — results are identical, only the plan
  * differs.
  */
final class TopKBySim(k: Int) extends Aggregator[SimCand, List[SimCand], List[SimCand]] {
  require(k > 0, s"k must be positive, got $k")

  /** better(a, b): does a rank strictly before b? (sim desc, n_id asc).
    * Compares through java.lang.Double.compare so the order is TOTAL — NaN
    * ranks above every finite value, exactly like Spark's descending sort in
    * the equivalent row_number window (primitive > would make NaN incomparable
    * and the kept row would depend on partition/merge order). */
  private def better(a: SimCand, b: SimCand): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.n_id < b.n_id)
  }

  override def zero: List[SimCand] = Nil

  /** Insert keeping the buffer sorted best-first and at most k long. The
    * buffer is tiny (k elements), so linear insertion beats heap constants. */
  override def reduce(buf: List[SimCand], cand: SimCand): List[SimCand] = {
    if (buf.sizeIs >= k && better(buf.last, cand)) buf
    else {
      val (before, after) = buf.span(better(_, cand))
      (before ::: cand :: after).take(k)
    }
  }

  override def merge(a: List[SimCand], b: List[SimCand]): List[SimCand] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[SimCand]): List[SimCand] = buf

  override def bufferEncoder: Encoder[List[SimCand]] = ExpressionEncoder[List[SimCand]]()
  override def outputEncoder: Encoder[List[SimCand]] = ExpressionEncoder[List[SimCand]]()
}
