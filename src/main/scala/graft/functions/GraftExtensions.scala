package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Substring}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, LongType}

/** Exposes graft's native expressions to the SQL surface, so `spark.sql`
  * users call them like built-ins:
  *
  * {{{
  *   SELECT cosine_similarity(embedding, query_vec) FROM embeddings
  * }}}
  *
  * Two ways in:
  *  - config-time (cluster-wide):
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *  - runtime (current session): `GraftFunctions.register(spark)`
  *
  * Arguments are implicitly cast to `array<double>` (SQL literals arrive as
  * array<decimal>/array<float> depending on source), keeping the SQL surface
  * as forgiving as the built-ins while the expression itself stays strict.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def toVec(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def twoArg(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
    mk(toVec(args.head), toVec(args(1)))
  }

  /** (identifier, info, builder) triples in `injectFunction`'s shape. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      twoArg("cosine_similarity")(CosineSimilarity(_, _))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      twoArg("dot_product")(DotProduct(_, _))),
    // the engine's shared 48-bit content hash (first 12 md5 hex digits as a
    // BIGINT) — SQL users get the exact same hash the dedup/sampling
    // operators key on, composed from built-in codegen expressions
    (FunctionIdentifier("graft_hash48"),
      new ExpressionInfo(classOf[Md5].getName, "graft_hash48"),
      { args =>
        require(args.length == 1, s"graft_hash48 expects exactly 1 argument, got ${args.length}")
        Cast(
          Conv(
            Substring(Md5(Cast(args.head, BinaryType)), Literal(1), Literal(12)),
            Literal(16), Literal(10)),
          LongType)
      }))

  /** Register into an already-running session's function registry. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, id.funcName, builder)
    }
}
