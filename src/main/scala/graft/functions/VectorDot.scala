package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Dot product of two float-array embeddings as a native codegen'd
 * expression: one tight primitive loop, accumulating in double left to
 * right (bit-identical to the composable `aggregate(zip_with(...))` form
 * it replaces, which Spark evaluates interpretively at ~50× the cost —
 * this sits under every cosine in the similarity/dedup operators).
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {

  /** Invoked from generated code — keep signature stable. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toFloatArray()
    val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs(i).toDouble * ys(i).toDouble
      i += 1
    }
    acc
  }

  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      VectorDot(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
