package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamChunkDedup

/** Streaming chunk dedup: first arrival of a chunk digest is admitted,
  * later copies drop across micro-batches within the watermark. */
class StreamChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch shared chunks drop; unique chunks keep flowing") {
    val page = "lorem " * 33 + "xy"   // exactly one 200-char chunk
    val other = "unique " * 28 + "zz".take(200)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val q = StreamChunkDedup.dedupChunks(
        src.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("chunk_admitted")
      .outputMode("append").start()
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000)
    try {
      src.addData((1L, page, t(0)), (2L, other.take(200), t(1)))
      q.processAllAvailable()
      // batch 2: doc 3 repeats doc 1's page (drops), doc 4 is new
      src.addData((3L, page, t(5)), (4L, "fresh " * 34, t(6)))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table("chunk_admitted")
      .select("doc_id").as[Long].collect().toSeq
    // doc 3 contributed nothing: its only chunk digest was admitted in
    // batch 1; every other doc's chunks flowed through
    assert(!admitted.contains(3L))
    assert(Set(1L, 2L, 4L).subsetOf(admitted.toSet))
    // within-stream totals: each admitted digest appears exactly once
    val digests = spark.table("chunk_admitted")
      .select("chunk_md5").as[String].collect().toSeq
    assert(digests.distinct.size == digests.size)
  }
}
