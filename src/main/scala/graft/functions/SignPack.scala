package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Binary quantization of a float-array embedding: bit i of the result is
 * set iff `emb[i] >= 0` (IEEE: `-0.0f >= 0` is true, `NaN >= 0` is
 * false), for the first `min(64, len)` dimensions — the 1-bit BQ code
 * behind Hamming-distance ANN serving. A 64-dim float vector (256 bytes)
 * collapses to ONE long (8 bytes, a 32× scan-width cut), and candidate
 * scoring becomes `bit_count(a ^ b)` — two instructions per candidate
 * instead of a 64-lane fused multiply-add, the reason BQ shortlisting is
 * the cheapest retrieval rung in modern vector stores.
 *
 * Native codegen'd expression (the [[VectorDot]] pattern): one tight
 * primitive loop, no higher-order-function interpretation on the hot
 * path. Engine-portable: the DuckDB oracle packs the same bits as two
 * 32-bit halves via
 * `sum(CASE WHEN x >= 0 AND NOT isnan(x) THEN 1::BIGINT << i END)`
 * (halves sidestep HUGEINT widening on the sign bit; the isnan guard
 * is load-bearing — DuckDB's `>=` orders NaN ABOVE all floats, while
 * this expression's Java `>=` is false for NaN, bit clear) and compares
 * Hamming = `bit_count(xor(lo)) + bit_count(xor(hi))`.
 */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SignPack.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SignPack.pack($a)")

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)

  override def prettyName: String = "sign_pack"
}

object SignPack {

  /** Invoked from generated code — keep signature stable. */
  def pack(a: ArrayData): Long = {
    val xs = a.toFloatArray()
    val n = math.min(xs.length, 64)
    var code = 0L
    var i = 0
    while (i < n) {
      if (xs(i) >= 0.0f) code |= (1L << i)
      i += 1
    }
    code
  }

  def sign_pack(a: Column): Column =
    GraftBridge.toColumn(SignPack(GraftBridge.toExpression(a)))
}
