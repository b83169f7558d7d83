package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hand-rolled protobuf (proto3) wire-format encode/decode for the
 * reference's Kafka payload — `message Trade` with seven scalar fields
 * (`proto/currencymarket.proto:7-15`; encoded at
 * `consumer/consuming/service.go:29`, decoded at
 * `importer/importing/service.go:117-121`). The wire format is public
 * knowledge (tag = field<<3 | wire_type, LEB128 varints, length-delimited
 * strings), so no protobuf runtime is needed:
 *
 *   1 user_id             string   (wire type 2)
 *   2 currency_from       string
 *   3 currency_to         string
 *   4 amount_sell_micros  int64    (wire type 0; negative → 10-byte varint)
 *   5 amount_buy_micros   int64
 *   6 time_placed_ms      int64
 *   7 originating_country string
 *
 * Encoding matches Go `proto.Marshal` canonically: fields in field-number
 * order, proto3 defaults (empty string, 0) omitted. Decoding accepts any
 * field order, skips unknown fields (wire types 0/1/2/5), applies
 * last-one-wins, and returns null on malformed input (truncated varint or
 * payload, wrong wire type for a known field) — the row-level analogue of
 * the reference's unmarshal error path.
 *
 * Both directions are exposed as codegen'd StaticInvoke expressions — a
 * direct static call inside whole-stage codegen, no interpreted fallback.
 */
object ProtoTrade {

  val schema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("currency_from", StringType, nullable = false),
    StructField("currency_to", StringType, nullable = false),
    StructField("amount_sell_micros", LongType, nullable = false),
    StructField("amount_buy_micros", LongType, nullable = false),
    StructField("time_placed_ms", LongType, nullable = false),
    StructField("originating_country", StringType, nullable = false)))

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7FL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeString(out: java.io.ByteArrayOutputStream, field: Int,
      s: UTF8String): Unit =
    if (s != null && s.numBytes() > 0) {
      writeVarint(out, (field << 3) | 2L)
      val bytes = s.getBytes
      writeVarint(out, bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
    }

  private def writeInt64(out: java.io.ByteArrayOutputStream, field: Int,
      v: Long): Unit =
    if (v != 0L) {
      writeVarint(out, (field << 3).toLong)
      writeVarint(out, v)
    }

  /** Invoked from generated code — keep signature stable. */
  def encode(userId: UTF8String, currencyFrom: UTF8String,
      currencyTo: UTF8String, amountSellMicros: Long, amountBuyMicros: Long,
      timePlacedMs: Long, originatingCountry: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    writeString(out, 1, userId)
    writeString(out, 2, currencyFrom)
    writeString(out, 3, currencyTo)
    writeInt64(out, 4, amountSellMicros)
    writeInt64(out, 5, amountBuyMicros)
    writeInt64(out, 6, timePlacedMs)
    writeString(out, 7, originatingCountry)
    out.toByteArray
  }

  /** Invoked from generated code — keep signature stable.
    * Returns null on malformed input. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    var uId, cFrom, cTo, oCountry = UTF8String.EMPTY_UTF8
    var sell, buy, placedMs = 0L
    var i = 0
    val n = bytes.length

    // LEB128 varint at i; returns the value and advances i. -1 sentinel via
    // the `bad` flag (the value space is the full signed-64 range).
    var bad = false
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      var more = true
      while (more) {
        if (i >= n || shift > 63) { bad = true; return 0L }
        val b = bytes(i) & 0xFF
        i += 1
        // 10th byte (shift 63): only the low bit fits in 64 — Go protowire
        // rejects anything wider as overflow rather than truncating
        if (shift == 63 && (b & 0xFE) != 0) { bad = true; return 0L }
        acc |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      acc
    }

    while (i < n) {
      val key = varint()
      if (bad) return null
      val field = (key >>> 3).toInt
      (key & 7L).toInt match {
        case 0 =>
          val v = varint()
          if (bad) return null
          field match {
            case 4 => sell = v
            case 5 => buy = v
            case 6 => placedMs = v
            case 1 | 2 | 3 | 7 => return null // known string, wrong wire type
            case _ => () // unknown field: value consumed, skip
          }
        case 2 =>
          val len = varint()
          if (bad || len < 0 || i + len > n) return null
          val s = UTF8String.fromBytes(bytes, i, len.toInt)
          i += len.toInt
          field match {
            case 1 => uId = s
            case 2 => cFrom = s
            case 3 => cTo = s
            case 7 => oCountry = s
            case 4 | 5 | 6 => return null // known int64, wrong wire type
            case _ => ()
          }
        case 1 => // unknown 64-bit field: skip 8 bytes
          if (field >= 1 && field <= 7) return null
          if (i + 8 > n) return null
          i += 8
        case 5 => // unknown 32-bit field: skip 4 bytes
          if (field >= 1 && field <= 7) return null
          if (i + 4 > n) return null
          i += 4
        case _ => return null // groups (3/4) unsupported in proto3
      }
    }
    new GenericInternalRow(Array[Any](uId, cFrom, cTo, sell, buy, placedMs,
      oCountry))
  }

  /** Encode a trade to proto3 bytes (never null; nulls encode as proto3
    * defaults, i.e. omitted fields). */
  def proto_encode_trade(userId: Column, currencyFrom: Column,
      currencyTo: Column, amountSellMicros: Column, amountBuyMicros: Column,
      timePlacedMs: Column, originatingCountry: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    def s(c: Column) = GraftBridge.toExpression(coalesce(c, lit("")))
    def l(c: Column) = GraftBridge.toExpression(coalesce(c, lit(0L)))
    GraftBridge.toColumn(StaticInvoke(
      ProtoTrade.getClass,
      BinaryType,
      "encode",
      Seq(s(userId), s(currencyFrom), s(currencyTo), l(amountSellMicros),
        l(amountBuyMicros), l(timePlacedMs), s(originatingCountry)),
      Seq(StringType, StringType, StringType, LongType, LongType, LongType,
        StringType),
      returnNullable = false))
  }

  /** Decode proto3 bytes to the trade struct; null for malformed input. */
  def proto_decode_trade(bytes: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      ProtoTrade.getClass,
      schema,
      "decode",
      Seq(GraftBridge.toExpression(bytes)),
      Seq(BinaryType),
      returnNullable = true))
}
