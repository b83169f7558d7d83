package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The encoding/mojibake census: per-class counter semantics pinned on
  * hand-built dirty strings (the DuckDB gate pins cross-engine parity;
  * this pins the SEMANTICS — what each class means, run maximality,
  * code-point counting, the flagged-doc rule). */
class EncodingAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: (Long, String, String)*) =
    TextAnalysis.encodingAudit(
      rows.toSeq.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).toMap
  // value order: (n_docs, non_ascii, mojibake, replacement, c1, c0,
  //               punct_runs, flagged)

  test("each artifact class counts exactly; clean multilingual text unflagged") {
    val got = audit(
      // the classic double-encode: caf<Ã©> — Ã and â are mojibake leads
      (1L, "cafÃ© â€™", "moj"),
      // lossy transcode marker ×2
      (2L, "a�b�", "rep"),
      // C1 control (U+0080), C0 controls (BS, US); tab/newline/CR exempt
      (3L, "abcd\te\nf\rg", "ctl"),
      // run lengths: 3 (no), 4 (yes), 11 (yes, ONE maximal run), run at
      // string end (yes)
      (4L, "a!!! b!!!! c!!!!????*** d....", "pun"),
      // clean multilingual text: non-ASCII mass but NOT an artifact
      (5L, "日本語 😀", "cln"))
    assert(got("moj") == (1L, 5L, 2L, 0L, 0L, 0L, 0L, 1L))
    assert(got("rep") == (1L, 2L, 0L, 2L, 0L, 0L, 0L, 1L))
    assert(got("ctl") == (1L, 1L, 0L, 0L, 1L, 2L, 0L, 1L))
    assert(got("pun") == (1L, 0L, 0L, 0L, 0L, 0L, 3L, 1L))
    // the emoji is one CODE POINT (surrogate pair), not two chars
    assert(got("cln") == (1L, 4L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("encodingRepair: fixed digraph table, order-sensitive chain, md5 receipt") {
    val d = Seq(
      (1L, "cafÃ© â€™ naÃ¯ve"), // 3 repairs → café ’ naïve
      (2L, "clean text"),       // untouched
      (3L, "Ã©Ã©"))             // same pattern twice in one doc
      .toDF("doc_id", "text")
    val got = TextAnalysis.encodingRepair(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    def m(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(1L) == (3L, m("café ’ naïve")))
    assert(got(2L) == (0L, m("clean text")))
    assert(got(3L) == (2L, m("éé")))
  }

  test("per-source aggregation sums counters and flags per doc") {
    val got = audit(
      (1L, "x�", "s"), (2L, "clean", "s"), (3L, "y!!!! z????", "s"))
    assert(got("s") == (3L, 1L, 0L, 1L, 0L, 0L, 2L, 2L))
  }
}
