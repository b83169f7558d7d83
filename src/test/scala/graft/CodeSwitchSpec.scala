package graft

import graft.operators.TextAnalysis

/** Chunked language-consistency semantics on constructed docs: chunking
  * arithmetic, the per-chunk marker argmax, the majority election and
  * its declared-order tiebreak, and the undecided fallbacks. */
class CodeSwitchSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextAnalysis.codeSwitch(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toMap
  // value order: (n_chunks, n_decided, n_langs, lang_major, mixed)

  private def toks(ts: String*) = ts.mkString(" ")
  private val fill = Seq.fill(31)("zzz")

  test("a language flip across the chunk boundary flags the doc mixed") {
    val enChunk = toks(("the" +: fill): _*) // 32 tokens, en decides
    val deChunk = toks(("der" +: fill): _*) // 32 tokens, de decides
    val got = run(
      (1L, enChunk + " " + deChunk), // en | de → mixed, tie → en
      (2L, enChunk + " " + enChunk), // en | en → consistent
      (3L, enChunk + " " + deChunk + " " + deChunk)) // majority de
    assert(got(1L) == (2L, 2L, 2L, "en", 1L)) // tie breaks by marker order
    assert(got(2L) == (2L, 2L, 1L, "en", 0L))
    assert(got(3L) == (3L, 3L, 2L, "de", 1L))
  }

  test("chunk arithmetic: ceil at 32 tokens; short docs get one chunk") {
    val t32 = toks(("the" +: fill): _*)
    val got = run(
      (1L, t32),             // exactly 32 → 1 chunk
      (2L, t32 + " zzz"),    // 33 → 2 chunks, second undecided
      (3L, "the zzz"))       // tiny doc → 1 chunk
    assert(got(1L) == (1L, 1L, 1L, "en", 0L))
    assert(got(2L) == (2L, 1L, 1L, "en", 0L))
    assert(got(3L) == (1L, 1L, 1L, "en", 0L))
  }

  test("undecided chunks don't vote; fully-undecided docs read 'und'") {
    val got = run(
      (1L, "zzz qqq xxx"),   // nothing matches any marker set
      (2L, ""))              // empty normalized stream still reports
    assert(got(1L) == (1L, 0L, 0L, "und", 0L))
    assert(got(2L) == (1L, 0L, 0L, "und", 0L))
  }

  test("per-chunk argmax is the langId CASE: ties fall to declared order") {
    // 'de' is a SPANISH marker; 'und' is German — the classic traps
    val got = run(
      (1L, toks(("de" +: fill): _*)),  // es hit, not German
      (2L, toks(("und" +: fill): _*)), // de hit
      // one chunk, en and de tie at 1 hit each → en by CASE order
      (3L, toks(Seq("the", "der").++(Seq.fill(30)("zzz")): _*)))
    assert(got(1L)._4 == "es")
    assert(got(2L)._4 == "de")
    assert(got(3L)._4 == "en")
  }
}
