package graft

import graft.operators.TextAnalysis

/** The generalize-until-clean executor: ladder monotonicity, the
  * first-floor width election, residual suppression, and the no-op
  * case where the base grid is already clean. */
class KAnonCoarsenSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toSeq.map { case (id, src, lang, n) => (id, "t", src, lang, n) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")

  test("widens exactly until the at-risk floor, then releases that grid") {
    // k=2, base=500: three docs in bucket 0 and a SINGLETON in bucket 1
    // at width 500 (at risk); at width 1000 buckets 0|1 merge → clean.
    // The floor is 0 and j=1 first reaches it → width 1000, one cell.
    val d = docs(
      (1L, "sA", "en", 100L), (2L, "sA", "en", 200L), (3L, "sA", "en", 300L),
      (4L, "sA", "en", 600L))
    val got = TextAnalysis.kAnonCoarsen(d, k = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(got.toSeq == Seq(("sA", "en", 0L, 4L, "release", 1000L)))
  }

  test("an under-k (source, lang) pair is the irreducible floor: suppressed, never chased") {
    // (sB, de) holds ONE doc — no length widening can save it, so the
    // executor must not overshoot the ladder hunting for it: everything
    // else is clean at j=0, so j* = 0 and the singleton is suppressed
    val d = docs(
      (1L, "sA", "en", 100L), (2L, "sA", "en", 200L),
      (3L, "sB", "de", 100L))
    val got = TextAnalysis.kAnonCoarsen(d, k = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(4),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      ("sA", "en", "release", 500L),
      ("sB", "de", "suppress", 500L)))
  }

  test("already-clean base grid is a width-500 no-op release") {
    val d = docs((1L, "s", "en", 10L), (2L, "s", "en", 20L),
      (3L, "s", "en", 30L))
    val got = TextAnalysis.kAnonCoarsen(d, k = 2L).collect()
      .map(r => (r.getLong(3), r.getString(4), r.getLong(5)))
    assert(got.toSeq == Seq((3L, "release", 500L)))
  }

  test("at-risk mass is monotone down the ladder (the doubling-union argument)") {
    // randomized-ish lengths; property: for consecutive widths the
    // suppressed mass never grows (computed via the audit at each width)
    val d = docs((1L to 40L).map(i =>
      (i, s"s${i % 3}", "en", (i * i * 37L) % 4000L)): _*)
    val masses = (0 to 4).map { j =>
      TextAnalysis.kAnonymity(d, k = 3L, bucket = 500L << j)
        .collect().filter(_.getLong(4) == 1L).map(_.getLong(3)).sum
    }
    masses.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }
}
