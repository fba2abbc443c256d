package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for embedding-vector math.
  *
  * The composable form (`zip_with` + `aggregate` folds) is semantically
  * identical but runs as interpreted higher-order-function lambdas —
  * per-element expression-tree evaluation, measured 10-50× slower at scale.
  * These are proper codegen'd expressions: a tight primitive loop over
  * `ArrayData`, participating in whole-stage codegen, with an interpreted
  * `nullSafeEval` fallback that performs the exact same IEEE operation
  * sequence (strict left-to-right accumulation), so results are bit-identical
  * between modes and with the DuckDB oracle's ordered `list_sum` folds.
  */

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) over two `array<double>` columns.
  * The dot product runs over the common prefix; each norm runs over its full
  * array (mirroring the independent per-array folds of the composable form).
  * Array elements must be non-null (embedding vectors); a null ARRAY yields
  * null via the standard null-intolerant contract. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // nullability may differ per side (a literal array is containsNull=false,
    // a parquet column usually true) — only the element type matters here
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    i = n
    while (i < nx) { val xi = x.getDouble(i); na += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = y.getDouble(i); nb += yi * yi; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final int $n = java.lang.Math.min($nx, $ny);
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  final double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |for (int $i = $n; $i < $nx; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  $na += $xi * $xi;
         |}
         |for (int $i = $n; $i < $ny; $i++) {
         |  final double $yi = $b.getDouble($i);
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) = Σaᵢbᵢ over the common prefix of two `array<double>` columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    // nullability may differ per side (a literal array is containsNull=false,
    // a parquet column usually true) — only the element type matters here
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** squared L2 distance Σ(aᵢ−bᵢ)² over the common prefix of two
  * `array<double>` columns — the metric product-quantization trains and
  * scores with. Strict left-to-right accumulation with `(x−y)*(x−y)` per
  * element, so results are bit-identical to the DuckDB oracle's ordered
  * `list_sum(list_transform(...))` fold of the same expression. */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_distance_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC (asymmetric-distance-computation) LUT sum: given a candidate's PQ
  * `codes` (array<int>, one sub-centroid id per subspace) and a query's
  * per-subspace lookup table `lut` (array<array<double>>, lut(sub)(cid) =
  * partial squared distance), computes Σ_sub lut(sub)(codes(sub)) — the
  * inner loop of every PQ/IVF-PQ index scan. The composable form
  * (`zip_with` + `aggregate`) is an interpreted per-element lambda; this is
  * a tight codegen'd loop, bit-identical to it (strict left-to-right fold,
  * acc starts 0.0) for well-formed inputs.
  *
  * Strictness (the deterministic-oracle discipline): a null slot in either
  * array, or a code outside its LUT row, throws instead of silently
  * skewing the distance — a malformed index must fail loudly, not rank
  * wrong neighbors. Folds over min(|codes|, |lut|) subspaces (equal by
  * construction for any index built with [[graft.ext.Similarity.pqEncode]]). */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || lut.isNullAt(i))
        throw new IllegalArgumentException(
          s"adc_distance: null slot at subspace $i")
      val row = lut.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c))
        throw new IllegalArgumentException(
          s"adc_distance: code $c out of LUT row range [0, ${row.numElements()}) at subspace $i")
      acc += row.getDouble(c)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "adc_distance: null slot at subspace " + $i);
         |  }
         |  final org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |  final int $c = $a.getInt($i);
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |    throw new IllegalArgumentException(
         |      "adc_distance: code " + $c + " out of LUT row range [0, " +
         |        $row.numElements() + ") at subspace " + $i);
         |  }
         |  $acc += $row.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** out_r = Σ_j vecⱼ·signs(r)(j): a whole signed-projection matrix–vector
  * product as ONE codegen'd expression — the unrolled per-coordinate
  * literal-sum form builds a dim×outDims expression tree (measured: MiB-scale
  * task binaries and codegen compile dominating the query), while this is a
  * two-level primitive loop over `ArrayData` plus a reference-carried
  * double[][]. Accumulation is strict left-to-right in ascending j per
  * output coordinate, identical in eval and codegen modes, so the DuckDB
  * oracle's ordered `list_sum` reproduces it bit-for-bit. The matrix rides
  * along as a Seq (structural equality, so expression canonicalization
  * works) and is flattened to primitive arrays once per operator.
  * Strict on malformed input: a vector shorter than a projection row, or a
  * null element, throws — a truncated/zero-padded projection would
  * otherwise surface only as an opaque downstream hash mismatch. */
case class SignedProjection(child: Expression, signs: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val signsArr: Array[Array[Double]] =
    signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "signed_projection"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](signsArr.length)
    var r = 0
    while (r < signsArr.length) {
      val row = signsArr(r)
      // strictness (deterministic-oracle discipline): a vector shorter than
      // the projection dim, or a null slot, throws instead of silently
      // projecting a truncated/zero-padded vector — which would surface
      // only as an opaque downstream hash mismatch
      if (n < row.length)
        throw new IllegalArgumentException(
          s"signed_projection: vector has $n elements, projection row $r needs ${row.length}")
      var acc = 0.0
      var j = 0
      while (j < row.length) {
        if (x.isNullAt(j))
          throw new IllegalArgumentException(
            s"signed_projection: null vector element at index $j")
        acc += x.getDouble(j) * row(j)
        j += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("signs", signsArr, "double[][]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[$s.length];
         |for (int $r = 0; $r < $s.length; $r++) {
         |  final double[] $row = $s[$r];
         |  if ($n < $row.length) {
         |    throw new IllegalArgumentException(
         |      "signed_projection: vector has " + $n +
         |        " elements, projection row " + $r + " needs " + $row.length);
         |  }
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $row.length; $j++) {
         |    if ($a.isNullAt($j)) {
         |      throw new IllegalArgumentException(
         |        "signed_projection: null vector element at index " + $j);
         |    }
         |    $acc += $a.getDouble($j) * $row[$j];
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  private def toDoubleArray(c: Column): Expression =
    GraftColumnBridge.expression(c.cast("array<double>"))

  /** Codegen'd signed-projection matvec; accepts array<float> or
    * array<double>. `signs(r)(j)` weights input dim j in output dim r. */
  def signedProjection(vec: Column, signs: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(SignedProjection(toDoubleArray(vec), signs))

  /** Codegen'd cosine similarity; accepts array<float> or array<double>. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(toDoubleArray(a), toDoubleArray(b)))

  /** Codegen'd dot product; accepts array<float> or array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(toDoubleArray(a), toDoubleArray(b)))

  /** Codegen'd squared L2 distance; accepts array<float> or array<double>. */
  def l2DistSq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2DistanceSq(toDoubleArray(a), toDoubleArray(b)))

  /** Codegen'd PQ/ADC LUT sum; accepts any integral code array (cast to
    * array<int>) and an array<array<double>> lookup table. */
  def adcDistance(codes: Column, lut: Column): Column =
    GraftColumnBridge.column(AdcDistance(
      GraftColumnBridge.expression(codes.cast("array<int>")),
      GraftColumnBridge.expression(lut.cast("array<array<double>>"))))
}
