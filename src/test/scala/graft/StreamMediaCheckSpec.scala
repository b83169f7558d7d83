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
}
