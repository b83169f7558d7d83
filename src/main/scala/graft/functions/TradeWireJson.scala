package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Specialized single-pass parser for the trade wire JSON
 * (`consumer/http/rest/api.go:48-59` field set — graft.model.wireSchema),
 * replacing `from_json` on the ingest hot path. `from_json`
 * (JsonToStructs) is a CodegenFallback: every row crosses an interpreted
 * boundary into Jackson, splitting the whole-stage-codegen pipeline —
 * the same pathology as the HOF/TryEval cases measured in COVERAGE.md.
 * This parser is a StaticInvoke: a direct static call that stays inside
 * the generated stage. (Implementation note: parser state lives in class
 * fields, not captured locals — Scala lifts vars captured by nested defs
 * into heap-allocated IntRefs, measurably slower on a per-row path.)
 *
 * Semantics (deliberately STRICTER than from_json, matching Go
 * `encoding/json` binding into a typed struct — the reference's actual
 * behavior): returns null (→ the 400 reject path) for malformed JSON,
 * trailing content, or a known field with the wrong JSON type (from_json
 * would stringify any value into a StringType field; Go errors).
 * Missing fields and JSON nulls bind as null fields, duplicate keys take
 * the last value, unknown fields of any shape (nested objects/arrays
 * included) are skipped — all exactly as Jackson/Go do.
 */
object TradeWireJson {

  /** Field order of graft.model.wireSchema. */
  private val USER_ID = 0
  private val CURRENCY_FROM = 1
  private val CURRENCY_TO = 2
  private val AMOUNT_SELL = 3
  private val AMOUNT_BUY = 4
  private val RATE = 5
  private val TIME_PLACED = 6
  private val ORIGINATING_COUNTRY = 7

  private final class Malformed extends Exception {
    override def fillInStackTrace(): Throwable = this // no stack cost
  }
  private val malformed = new Malformed

  private final class Parser(s: String) {
    private[this] val n = s.length
    private[this] var i = 0
    private[this] val sb = new java.lang.StringBuilder(32)

    private def ws(): Unit = {
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }

    private def expect(c: Char): Unit = {
      if (i >= n || s.charAt(i) != c) throw malformed
      i += 1
    }

    private def parseStr(): String = {
      expect('"')
      sb.setLength(0)
      while (true) {
        if (i >= n) throw malformed
        val c = s.charAt(i)
        i += 1
        if (c == '"') return sb.toString
        else if (c == '\\') {
          if (i >= n) throw malformed
          val e = s.charAt(i)
          i += 1
          e match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              // strictly 4 hex digits — Integer.parseInt alone would also
              // accept a sign ("\u-0af"), which Go/Jackson reject
              if (i + 4 > n) throw malformed
              var cp = 0
              var j = i
              while (j < i + 4) {
                val h = s.charAt(j)
                val d =
                  if (h >= '0' && h <= '9') h - '0'
                  else if (h >= 'a' && h <= 'f') h - 'a' + 10
                  else if (h >= 'A' && h <= 'F') h - 'A' + 10
                  else throw malformed
                cp = (cp << 4) | d
                j += 1
              }
              i += 4
              sb.append(cp.toChar)
            case _ => throw malformed
          }
        } else if (c < ' ') throw malformed // raw control char
        else sb.append(c)
      }
      null // unreachable
    }

    private def parseNum(): Double = {
      val start = i
      if (i < n && s.charAt(i) == '-') i += 1
      if (i >= n || !isDigit(s.charAt(i))) throw malformed
      // Go encoding/json rejects leading zeros ("01"): a '0' integer part
      // must stand alone
      if (s.charAt(i) == '0' && i + 1 < n && isDigit(s.charAt(i + 1)))
        throw malformed
      while (i < n && isDigit(s.charAt(i))) i += 1
      if (i < n && s.charAt(i) == '.') {
        i += 1
        if (i >= n || !isDigit(s.charAt(i))) throw malformed
        while (i < n && isDigit(s.charAt(i))) i += 1
      }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= n || !isDigit(s.charAt(i))) throw malformed
        while (i < n && isDigit(s.charAt(i))) i += 1
      }
      java.lang.Double.parseDouble(s.substring(start, i))
    }

    private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

    private def tryNull(): Boolean =
      if (i + 4 <= n && s.charAt(i) == 'n' && s.startsWith("null", i)) {
        i += 4; true
      } else false

    /** Skip an arbitrary JSON value (unknown fields). */
    private def skipValue(): Unit = {
      ws()
      if (i >= n) throw malformed
      s.charAt(i) match {
        case '"' => parseStr()
        case '{' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == '}') { i += 1; return }
          while (true) {
            ws(); parseStr(); ws(); expect(':'); skipValue(); ws()
            if (i >= n) throw malformed
            if (s.charAt(i) == '}') { i += 1; return }
            expect(',')
          }
        case '[' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == ']') { i += 1; return }
          while (true) {
            skipValue(); ws()
            if (i >= n) throw malformed
            if (s.charAt(i) == ']') { i += 1; return }
            expect(',')
          }
        case 't' => if (s.startsWith("true", i)) i += 4 else throw malformed
        case 'f' => if (s.startsWith("false", i)) i += 5 else throw malformed
        case 'n' => if (!tryNull()) throw malformed
        case _ => parseNum()
      }
    }

    def parse(): InternalRow = {
      val out = new Array[Any](8)
      ws(); expect('{'); ws()
      if (i < n && s.charAt(i) == '}') i += 1
      else {
        var more = true
        while (more) {
          ws()
          val key = parseStr()
          ws(); expect(':'); ws()
          val slot = key match {
            case "userId" => USER_ID
            case "currencyFrom" => CURRENCY_FROM
            case "currencyTo" => CURRENCY_TO
            case "amountSell" => AMOUNT_SELL
            case "amountBuy" => AMOUNT_BUY
            case "rate" => RATE
            case "timePlaced" => TIME_PLACED
            case "originatingCountry" => ORIGINATING_COUNTRY
            case _ => -1
          }
          if (slot < 0) skipValue()
          else if (tryNull()) out(slot) = null
          else if (slot == AMOUNT_SELL || slot == AMOUNT_BUY || slot == RATE)
            out(slot) = parseNum() // number required, like Go float64 binding
          else
            out(slot) = UTF8String.fromString(parseStr())
          ws()
          if (i >= n) throw malformed
          if (s.charAt(i) == '}') { i += 1; more = false }
          else expect(',')
        }
      }
      ws()
      if (i != n) throw malformed // trailing content
      new GenericInternalRow(out)
    }
  }

  /** Invoked from generated code — keep signature stable.
    * Returns null for input that Go json.Unmarshal would reject. */
  def parse(json: UTF8String): InternalRow = {
    if (json == null) return null
    try new Parser(json.toString).parse()
    catch { case _: Malformed | _: NumberFormatException => null }
  }

  /** Parse the wire JSON to the wireSchema struct; null on input Go's
    * json.Unmarshal would reject. */
  def parse_trade_wire(json: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      TradeWireJson.getClass,
      graft.model.wireSchema,
      "parse",
      Seq(GraftBridge.toExpression(json)),
      Seq(StringType),
      returnNullable = true))
}
