package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.store.SubstrStore
import graft.streaming.StreamSubstrCheck

/** Streaming exact-substring ingest check: per-batch probe of the
  * persisted window-hash census, streamed ≡ batch by construction
  * (shared `dupSubstringsAgainst` code path), plus the census-append
  * admission loop. */
class StreamSubstrCheckSpec extends SparkSpec {
  import spark.implicits._

  private val L = 4

  test("streamed probe reports per batch exactly the batch operator's spans") {
    val docs = Tables.documents(spark, sf001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_substr_spec").toString
    SubstrStore.writeWindowCensus(corp, path, minLen = L)

    val newRows = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = newRows.splitAt(newRows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Long)]]
    val q = StreamSubstrCheck.start(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet,
      minLen = L)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def batchProbe(rows: Seq[(Long, String)]) =
      StreamSubstrCheck.probe(spark,
        rows.toDF("doc_id", "text"), path, minLen = L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

    // per-batch equality (same code path), and the union equals one
    // batch pass: spans are per-doc against a FIXED census, so batch
    // boundaries cannot change the outcome
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == batchProbe(b1))
    assert(got(1L) == batchProbe(b2))
    assert(got.values.flatten.toSet == batchProbe(newRows))
    assert(got.values.flatten.nonEmpty)
  }

  test("probe flags exactly corpus-covered spans, not batch-internal repeats") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_probe_spec").toString
    // corpus holds "a b c d" (one L=4 window); "p q r s" exists ONLY
    // twice inside the incoming batch — an ingest check against the
    // corpus must NOT flag it (that is dup_substrings' job, not ours)
    SubstrStore.writeWindowCensus(
      Seq((10L, "a b c d e")).toDF("doc_id", "text"), path, minLen = L)
    val batch = Seq(
      (1L, "x x a b c d y y"), // corpus window at pos 2 → span (2, 4)
      (2L, "p q r s"), (3L, "p q r s")).toDF("doc_id", "text")
    val got = StreamSubstrCheck.probe(spark, batch, path, minLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 4L)))
  }

  test("admission loop: batch N's content flags duplicates in batch N+1") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_admit_spec").toString
    SubstrStore.writeWindowCensus(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), path, minLen = L)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long)]]
    val q = StreamSubstrCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      minLen = L)
    try {
      // batch 0: "w x y z" is novel — no flag; its census is appended
      src.addData((1L, "w x y z")); q.processAllAvailable()
      // batch 1: the SAME window must now flag against the census,
      // alongside the original corpus content
      src.addData((2L, "w x y z"), (3L, "a b c d"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got(0L) == Set.empty)
    assert(got(1L) == Set((2L, 0L, 4L), (3L, 0L, 4L)))
  }

  test("admit-cleaned loop: streamed ≡ batch apply; only ADMITTED content enters the census") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_admit_clean_spec").toString
    SubstrStore.writeWindowCensus(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), path, minLen = L)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, String, Long, Long)]]
    val q = StreamSubstrCheck.startAdmittingCleaned(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet,
      minLen = L)
    try {
      // batch 0: the corpus-covered head "a b c d" is stripped, the doc
      // is admitted as "w x y z" — and ONLY that cleaned text's windows
      // enter the census
      src.addData((1L, "a b c d w x y z")); q.processAllAvailable()
      // batch 1: the admitted cleaned window flags (doc 2); the original
      // corpus content flags (doc 3); but a window of batch 0's RAW doc
      // that spanned the stripped boundary ("b c d w") must NOT — the
      // raw batch never entered the census, the cleaned doc did
      src.addData((2L, "w x y z"), (3L, "a b c d"), (4L, "b c d w"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got(0L) == Set((1L, "w x y z", 8L, 4L)))
    assert(got(1L) == Set(
      (2L, "", 4L, 4L), (3L, "", 4L, 4L), (4L, "b c d w", 4L, 0L)))
    // streamed ≡ batch: batch 0's cleaned stream equals the batch apply
    // operator over the ORIGINAL census (same code path, spec-pinned by
    // rebuilding the pre-append state)
    val path2 = java.nio.file.Files
      .createTempDirectory("graft_substr_admit_clean_ref").toString
    SubstrStore.writeWindowCensus(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), path2, minLen = L)
    val ref = StreamSubstrCheck.probeApply(spark,
      Seq((1L, "a b c d w x y z")).toDF("doc_id", "text"), path2,
      minLen = L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got(0L) == ref)
  }

  test("periodic in-loop compaction: probes unchanged, census stays distinct") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_substr_compact_loop").toString
    SubstrStore.writeWindowCensus(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), path, minLen = L)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long)]]
    val q = StreamSubstrCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      minLen = L, compactEvery = 1) // compact after EVERY admit
    try {
      // every batch re-admits "a b c d" (already in the corpus census)
      // — without compaction the census would grow per batch
      src.addData((1L, "a b c d")); q.processAllAvailable()
      src.addData((2L, "a b c d w x y z")); q.processAllAvailable()
      src.addData((3L, "w x y z")); q.processAllAvailable()
    } finally q.stop()
    // gate decisions identical to the uncompacted loop's semantics
    assert(got(0L) == Set((1L, 0L, 4L)))
    assert(got(1L) == Set((2L, 0L, 4L))) // "w x y z" novel at batch 1
    assert(got(2L) == Set((3L, 0L, 4L))) // ... and flagged at batch 2
    // census holds exactly the distinct windows ever admitted/seeded:
    // 1×"a b c d" + the 5 windows of batch 1's 8-token doc
    val census = SubstrStore.readWindowCensus(spark, path)
    assert(census.count() ==
      census.select(org.apache.spark.sql.functions.col("h"))
        .distinct().count())
  }
}
