package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.store.MediaStore
import graft.streaming.StreamMediaCheck

/** Streaming media ingest check: per-batch probe of the persisted
  * perceptual-hash index, streamed ≡ batch by shared code path. */
class StreamMediaCheckSpec extends SparkSpec {
  import spark.implicits._

  test("streamed probe flags re-encoded media exactly as the batch probe") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_media_spec").toString
    MediaStore.writePhashIndex(corp, path)

    val newRows = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = newRows.splitAt(newRows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Int)]]
    val q = StreamMediaCheck.start(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def batchProbe(rows: Seq[(Long, String)]) =
      StreamMediaCheck.probe(spark,
        rows.toDF("doc_id", "text"), path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == batchProbe(b1))
    assert(got(1L) == batchProbe(b2))
    // flags only cross-corpus matches, and the testdata's planted dups
    // make the check non-vacuous
    val all = got(0L) ++ got(1L)
    assert(all.nonEmpty, "planted near-dups should trip the check")
    val corpusIds = corp.select("doc_id").as[Long].collect().toSet
    all.foreach { case (n, c, d) =>
      assert(n % 5 == 0 && corpusIds.contains(c) && d >= 0 && d <= 3)
    }
    // exact copies across the boundary land at distance 0
    val exact = Multimodal.mediaPhashDups(docs).collect()
      .filter(r => r.getInt(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
    exact.foreach { case (a, b) =>
      val (n, c) = if (a % 5 == 0) (a, b) else (b, a)
      assert(all.contains((n, c, 0)),
        s"cross-boundary exact pair ($n,$c) must be flagged at 0")
    }
  }

  test("admission loop: media admitted in batch N flag a re-send in batch N+1") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(col("doc_id") >= 100)
    val path = java.nio.file.Files
      .createTempDirectory("graft_media_admit_spec").toString
    MediaStore.writePhashIndex(corp, path)

    // batch 0 admits doc 7's media (novel vs the corpus split);
    // batch 1 re-sends the identical payload under a new id — it can
    // only flag (dist 0) through batch 0's appended band rows
    val t7 = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Int)]]
    val q = StreamMediaCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
    try {
      src.addData(t7); q.processAllAvailable()
      src.addData((7007L, t7._2)); q.processAllAvailable()
    } finally q.stop()
    assert(!got(0L).exists(_._2 == t7._1),
      "doc 7's media was novel in batch 0")
    assert(got(1L).exists(p => p._1 == 7007L && p._2 == t7._1 && p._3 == 0),
      "batch 1's identical payload must flag at Hamming distance 0")
  }
}
