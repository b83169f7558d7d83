package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Byte-level scalar helpers over binary payload columns, exposed as
  * codegen'd static calls (the `aggregate(transform(...))` HOF form is
  * interpreted per element). */
object ByteOps {

  /** Invoked from generated code — keep signature stable.
    * Sum of unsigned byte values; 0 for the empty payload. */
  def byteSum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc += bytes(i) & 0xFF
      i += 1
    }
    acc
  }

  def byte_sum(payload: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      ByteOps.getClass,
      LongType,
      "byteSum",
      Seq(GraftBridge.toExpression(payload)),
      Seq(BinaryType),
      returnNullable = false))
}
