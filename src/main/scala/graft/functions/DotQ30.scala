package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Q30 fixed-point dot product of two float vectors as a native
  * expression: Σ floor(aᵢ·bᵢ·2³⁰) / 2³⁰, each step exact IEEE arithmetic
  * (float→double widening is exact; the float-mantissa product fits a
  * double; ×2³⁰ is a power-of-two scale; long summation is exact). The
  * same arithmetic an ANSI-SQL engine performs — so results hash-match a
  * DuckDB oracle — but executed as one fused loop instead of
  * zip_with+aggregate's two array passes and intermediate allocation. */
case class DotQ30(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_q30"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQ30.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotQ30.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotQ30 =
    copy(left = newLeft, right = newRight)
}

object DotQ30 {
  private final val Scale = (1L << 30).toDouble

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale).toLong
      i += 1
    }
    acc.toDouble / Scale
  }
}
