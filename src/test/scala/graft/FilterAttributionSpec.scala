package graft

import graft.operators.TextAnalysis

/** Filter attribution: per-gate flagged/unique counts over the curate
  * gates — the dup gate has no exercise on the synthetic corpus (no
  * exact text copies), so this pins it on constructed docs along with
  * the unique-attribution arithmetic. */
class FilterAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("gate attribution: dup-only, lang-only, multi-gate, pass") {
    val en = "the quick brown fox and the lazy dog ran to the park in " +
      "the morning for a long walk of fun and joy and the sun is warm " +
      "for all of the animals to enjoy in peace and quiet today"
    val de = "der hund und die katze das ist gut und der tag ist lang " +
      "und die sonne ist warm und das gras ist weich und der park ist " +
      "still und das wetter ist gut heute morgen hier"
    val got = TextAnalysis.filterAttribution(Seq(
        (1L, en),    // passes everything — the keeper
        (2L, en),    // exact copy → dup gate ONLY
        (3L, de),    // German → lang gate ONLY (quality markers pass)
        (4L, "!!!")) // short punct junk → lang AND quality (not unique)
      .toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      "dup" -> (1L, 1L),
      "lang" -> (2L, 1L),
      "quality" -> (1L, 0L),
      "pass" -> (1L, 1L)))
  }

  test("empty corpus: four zero rows, never null") {
    val got = TextAnalysis.filterAttribution(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("dup", 0L, 0L), ("lang", 0L, 0L),
      ("pass", 0L, 0L), ("quality", 0L, 0L)))
  }
}
