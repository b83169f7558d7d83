package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType, StringType}

/**
 * Encoding/mojibake artifact census — the ftfy-class curation gate: a
 * web-scale corpus accumulates double-encoded UTF-8 (the Latin-1 lead
 * chars Ã/â/Â rendered as text), U+FFFD replacement chars (lossy
 * transcodes), C1 controls (CP-1252 bytes read as ISO-8859-1), raw C0
 * controls, and over-long punctuation runs (markup shrapnel). One
 * codegen'd pass per document counts all six classes over CODE POINTS
 * (so the DuckDB oracle's `regexp_extract_all` lengths replay the
 * counts bit-for-bit — DuckDB `length`/regex are code-point based too).
 *
 * Same StaticInvoke shape as [[PortableHash.md5Prefix60]]: the string
 * crosses as UTF-8 bytes, the loop is one tight scan, and the whole
 * expression inlines into whole-stage codegen.
 */
object EncodingOps {

  /** Counter layout of [[counts]] (element index ↔ meaning). */
  val NonAscii = 0      // code point > 0x7F
  val MojibakeLead = 1  // Ã (0xC3), â (0xE2), Â (0xC2) — UTF-8-as-Latin-1
  val Replacement = 2   // U+FFFD
  val C1Controls = 3    // U+0080–U+009F
  val C0Controls = 4    // < 0x20 except \t \n \r
  val PunctRuns = 5     // maximal runs of ≥ 4 ASCII punctuation chars

  /** Invoked from generated code — keep signature stable. Decodes the
    * UTF-8 bytes and tallies the six artifact classes in one code-point
    * scan. ASCII punctuation = the four ASCII ranges !-/ :-@ [-` {-~
    * (the oracle's character class, spelled as ranges there). */
  def counts(bytes: Array[Byte])
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Long](6)
    var run = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp > 0x7F) out(NonAscii) += 1
      if (cp == 0xC3 || cp == 0xE2 || cp == 0xC2) out(MojibakeLead) += 1
      if (cp == 0xFFFD) out(Replacement) += 1
      if (cp >= 0x80 && cp <= 0x9F) out(C1Controls) += 1
      if (cp < 0x20 && cp != 0x09 && cp != 0x0A && cp != 0x0D)
        out(C0Controls) += 1
      val isPunct = (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
        (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')
      if (isPunct) run += 1
      else { if (run >= 4) out(PunctRuns) += 1; run = 0 }
      i += Character.charCount(cp)
    }
    if (run >= 4) out(PunctRuns) += 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column form: six-element BIGINT array of artifact tallies; null in
    * → null out (StaticInvoke propagates). */
  def encoding_counts(c: Column): Column =
    GraftBridge.toColumn(StaticInvoke(
      EncodingOps.getClass,
      ArrayType(LongType, containsNull = false),
      "counts",
      Seq(Cast(Cast(GraftBridge.toExpression(c), StringType), BinaryType)),
      Seq(BinaryType),
      returnNullable = true))
}
