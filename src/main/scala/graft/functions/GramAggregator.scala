package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Gram-matrix buffer: the upper triangle of XᵀX as a flat row-major
  * BIGINT array (dim·(dim+1)/2 slots), the per-dimension sums Σxᵢ (dim
  * slots — the extra vector that turns the Gram matrix into an exact
  * covariance matrix), and the row count. */
final case class GramBuf(g: Array[Long], s: Array[Long], n: Long)

/** Exact per-group Gram matrix (XᵀX upper triangle) over int8 code vectors
  * as a typed `Aggregator`.
  *
  * The relational alternative — explode all dim·(dim+1)/2 products per row
  * and hash-aggregate on (key, i, j) — pays one hash-table probe per
  * PRODUCT (rows × 2080 probes for dim 64). This aggregator instead
  * multiply-accumulates each row into a flat triangle buffer with a tight
  * two-level loop (no hashing, no per-pair row objects), buffers combine
  * map-side, and only |keys| buffer rows cross the exchange — at 100 TB
  * of vectors the shuffle is |keys|·(tri·8 B) regardless of corpus size.
  *
  * Products are exact: int8 codes bound each term by 127² and a BIGINT
  * accumulator never drifts, so results are bit-identical to the exploded
  * form (and to the DuckDB oracle) in any partitioning / merge order.
  */
final class GramUpperTriangle(dim: Int) extends Aggregator[Array[Short], GramBuf, GramBuf] {
  require(dim > 0, s"dim must be positive, got $dim")
  private val tri = dim * (dim + 1) / 2

  override def zero: GramBuf = GramBuf(new Array[Long](tri), new Array[Long](dim), 0L)

  override def reduce(b: GramBuf, v: Array[Short]): GramBuf = {
    require(v != null,
      "null codes array reached GramUpperTriangle — filter null code " +
        "vectors (e.g. from a null embedding upstream of Quantize) first")
    require(v.length == dim,
      s"code vector has ${v.length} elements, aggregator built for dim $dim")
    val arr = b.g
    val sums = b.s
    var idx = 0
    var i = 0
    while (i < dim) {
      val ci = v(i).toLong
      // the exactness contract (terms ≤ 127²) assumes int8-range codes;
      // the array<smallint> cast upstream would silently admit wider values
      if (ci > 127L || ci < -128L)
        throw new IllegalArgumentException(
          s"code value $ci at index $i is outside int8 range [-128, 127]; " +
            "GramUpperTriangle's exactness bound assumes int8 codes")
      sums(i) += ci
      var j = i
      while (j < dim) { arr(idx) += ci * v(j); idx += 1; j += 1 }
      i += 1
    }
    GramBuf(arr, sums, b.n + 1)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    val x = a.g
    val y = b.g
    var i = 0
    while (i < tri) { x(i) += y(i); i += 1 }
    val xs = a.s
    val ys = b.s
    var k = 0
    while (k < dim) { xs(k) += ys(k); k += 1 }
    GramBuf(x, xs, a.n + b.n)
  }

  override def finish(r: GramBuf): GramBuf = r

  override def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
  override def outputEncoder: Encoder[GramBuf] = ExpressionEncoder[GramBuf]()
}
