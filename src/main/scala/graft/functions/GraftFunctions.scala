package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** Registration surface for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (SQL users);
  *  - [[GraftFunctions]] column API + runtime registration for an
  *    already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.minhashSigDescriptor)
}

object GraftFunctions {

  private[functions] val minhashSigDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
    { args: Seq[Expression] =>
      args match {
        case Seq(c, Literal(k: Int, _), Literal(len: Int, _)) =>
          MinHashSignature(c, k, len)
        case Seq(c) => MinHashSignature(c, 4, 5)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(text[, k, shingle_len]) — k and shingle_len must be int literals")
      }
    })

  /** Column API: k-long MinHash signature of a string column. */
  def minhashSig(c: Column, k: Int = 4, shingleLen: Int = 5): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), k, shingleLen))

  /** Runtime registration for sessions built without the extension. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = minhashSigDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
