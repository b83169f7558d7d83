package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Order-isomorphic DOUBLE ⇄ BIGINT bit transform — the adapter that
 * lets a double score ride a Long-keyed bounded structure (the
 * [[TopKRows]] heap) with EXACTLY the ordering the double had: IEEE-754
 * doubles ordered ascending map to longs ordered ascending under
 * `bits ^ ((bits >> 63) & Long.MaxValue)` (positive doubles keep their
 * raw bits; negative doubles get their magnitude bits flipped so bigger
 * magnitude sorts lower). The transform is an involution, so the score
 * round-trips losslessly — a top-k over the transformed key reports the
 * ORIGINAL double, not an approximation, and tie behavior is identical
 * to sorting the doubles themselves (no precision quantization, unlike
 * a micros-floor which would merge near-ties and flip tiebreaks).
 *
 * Both directions are StaticInvoke (codegen-inlined, null-propagating)
 * — same shape as [[PortableHash.md5Prefix60]].
 */
object OrderBits {

  /** Invoked from generated code — keep signature stable. Monotone:
    * a < b ⇔ fromDouble(a) < fromDouble(b) for all non-NaN doubles. */
  def fromDouble(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Invoked from generated code — the involution's other reading. */
  def toDouble(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & Long.MaxValue))

  /** Column form: order-preserving BIGINT key of a DOUBLE score. */
  def order_bits(c: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      OrderBits.getClass, LongType, "fromDouble",
      Seq(Cast(GraftBridge.toExpression(c), DoubleType)),
      Seq(DoubleType), returnNullable = true))

  /** Column form: recover the DOUBLE score from its BIGINT key. */
  def bits_order(c: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      OrderBits.getClass, DoubleType, "toDouble",
      Seq(Cast(GraftBridge.toExpression(c), LongType)),
      Seq(LongType), returnNullable = true))
}
