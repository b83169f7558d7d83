package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamCurate

/** Streaming curation: the stateless quality filter agrees bit-for-bit
  * with the batch scorer, and the stateful per-source quota admits in
  * arrival order, never exceeds the cap, and never revokes an admission. */
class StreamCurateSpec extends SparkSpec {
  import spark.implicits._

  // long enough (≥200 chars) and stopword-dense → quality ≥ 0.7, lang=en
  private def good(i: Long): String =
    (s"doc $i " + "the quick brown fox jumps over the lazy dog and " +
      "a small cat is on the mat for the night in the house of friends ") * 3
  private def junk(i: Long): String = s"### $i !!!! ???? 0x00 @@@@ %%%%"

  test("streamed quality filter ≡ batch scorer; quota admits in arrival order and holds across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val docs = src.toDF().toDF("doc_id", "text", "source")
    val q = StreamCurate.curateStream(docs, quota = 2).toDF()
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()

    // batch 1: three good docs in source A (cap is 2), one junk, one good B
    src.addData((1L, good(1), "A"), (2L, good(2), "A"), (3L, good(3), "A"),
      (4L, junk(4), "A"), (10L, good(10), "B"))
    q.processAllAvailable()
    val after1 = spark.table("curated").as[StreamCurate.Admitted]
      .collect().sortBy(_.doc_id)
    assert(after1.map(_.doc_id).toSeq == Seq(1L, 2L, 10L),
      "batch 1 should admit the two lowest good A docs and the B doc")
    assert(after1.map(d => d.source -> d.rank_in_source).toSeq ==
      Seq("A" -> 1L, "A" -> 2L, "B" -> 1L))

    // batch 2: A is closed — even a lower doc_id is refused; B has room
    src.addData((0L, good(0), "A"), (11L, good(11), "B"), (12L, good(12), "B"))
    q.processAllAvailable()
    val after2 = spark.table("curated").as[StreamCurate.Admitted]
      .collect().sortBy(_.doc_id)
    q.stop()
    assert(after2.map(_.doc_id).toSeq == Seq(1L, 2L, 10L, 11L),
      "quota must persist across batches and admissions must be monotone")
    assert(after2.filter(_.source == "B").map(_.rank_in_source).toSeq ==
      Seq(1L, 2L), "B ranks must continue, not restart")

    // the streamed filter decision is the batch decision, bit-for-bit
    val all = Seq(
      (1L, good(1), "A"), (2L, good(2), "A"), (3L, good(3), "A"),
      (4L, junk(4), "A"), (10L, good(10), "B"),
      (0L, good(0), "A"), (11L, good(11), "B"), (12L, good(12), "B"))
      .toDF("doc_id", "text", "source")
    val batchPass = TextAnalysis.scoredRows(all, keep = Seq("source"))
      .filter(col("lang_pred") === "en" && col("quality") >= 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(batchPass.contains(1L) && !batchPass.contains(4L))
    val streamedPass = StreamCurate.qualityFilter(all)
      .select("doc_id").as[Long].collect().toSet
    assert(streamedPass == batchPass)
  }

  test("scoredRows pass-through columns preserve the quality/lang values") {
    val docs = Tables.documents(spark, sf0001)
    val plain = TextAnalysis.scoredRows(docs)
      .select("doc_id", "quality", "lang_pred").collect().toSeq
    val kept = TextAnalysis.scoredRows(docs, keep = Seq("source"))
    assert(kept.columns.contains("source"))
    assert(kept.select("doc_id", "quality", "lang_pred").collect().toSeq
      == plain)
  }
}
