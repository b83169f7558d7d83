package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling hash (Rabin–Karp style) of a string as a native
 * Catalyst expression with whole-stage codegen — document fingerprinting
 * for the training-data pipeline without UDF/serialization overhead.
 *
 * h = fold(bytes b): h ← (h * 31 + b) mod (2^58 - 27)
 *
 * The modulus keeps `h * 31 + 255` inside signed-64 range, so the same
 * recurrence is expressible in engines with checked 64-bit arithmetic
 * (the DuckDB oracle reproduces it over unicode code points of the
 * normalized ASCII text — identical to bytes there).
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod: Long = (1L << 58) - 27L
  final val Base: Long = 31L

  /** Invoked from generated code — keep signature stable. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xFFL)) % Mod
      i += 1
    }
    h
  }

  /** Column API surface. */
  def rolling_hash(c: Column): Column =
    GraftBridge.toColumn(RollingHash(GraftBridge.toExpression(c)))
}
