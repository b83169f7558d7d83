package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.UrlCuration
import graft.streaming.StreamUrlDedup

/** Standing canonical-URL recrawl census: sum/min-mergeable folds on
  * the StandingTable base; dedup readout ≡ the batch url_dedup
  * bit-for-bit via the shared urlDedupFrom; snapshot/resume under the
  * fold-watermark contract. */
class StreamUrlDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed recrawl census ≡ batch url_dedup, bit-for-bit") {
    // seed a recrawl cohort like the gated query does (mod-11 docs
    // share one landing page per source, canonicalization dimensions
    // varying) — the raw seeded urls embed doc_id and never collide
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
      .withColumn("url",
        when(pmod(col("doc_id"), lit(11)) === 4,
          concat(lit("https://www."), col("source"),
            lit(".example.com/shared/landing"),
            when(col("doc_id") % 2 === 0, lit("?utm_source=recrawl"))
              .otherwise(lit("")),
            when(col("doc_id") % 3 === 1, lit("#frag")).otherwise(lit(""))))
          .otherwise(col("url")))
    val rows = docs.select(col("doc_id"), col("url"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    // uneven split on purpose: a canonical URL's fetches may straddle
    // the batch boundary — the mergeable fold must not care
    val (b1, b2) = rows.splitAt(rows.length / 3)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamUrlDedup.CensusTable(spark)
    val q = StreamUrlDedup.start(
      src.toDF().toDF("doc_id", "url", "n_chars"), table)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = table.dedup.collect().toSeq
    val batch = UrlCuration.urlDedup(docs).collect().toSeq
    assert(streamed.nonEmpty, "the seeded corpus must carry recrawls")
    assert(streamed == batch, s"streamed $streamed\n!= batch $batch")
  }

  test("keeper election merges order-free: fullest fetch wins, ties to earliest doc") {
    def batch(rows: (Long, String, Long)*) =
      rows.toDF("doc_id", "url", "n_chars")
    // the same canonical URL fetched across three batches in an order
    // where the winner arrives in the MIDDLE — a fold that kept the
    // latest or first arrival instead of the min-struct election would
    // elect differently
    val t = new StreamUrlDedup.CensusTable(spark)
    t.fold(batch((5L, "https://ex.com/a", 10L)), batchId = 0L)
    t.fold(batch((3L, "https://ex.com/a", 30L),
      (9L, "https://other.com/b", 7L)), batchId = 1L)
    t.fold(batch((4L, "https://ex.com/a?utm_source=x", 30L)), batchId = 2L)
    val got = t.dedup.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // canon collapses the utm param → 3 dups; keeper = 30 chars, tie
    // between doc 3 and doc 4 → smallest doc_id; dropped = 10 + 30
    assert(got.toSeq == Seq(("https://ex.com/a", 3L, 3L, 40L)), got.toSeq)
  }

  test("snapshot/resume: replayed batch skipped, next batch applies") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_urldedup_snap").toString + "/snap"
    def batch(rows: (Long, String, Long)*) =
      rows.toDF("doc_id", "url", "n_chars")
    val t = new StreamUrlDedup.CensusTable(spark)
    t.fold(batch((1L, "https://ex.com/a", 10L)), batchId = 3L)
    t.save(dir)

    val resumed = new StreamUrlDedup.CensusTable(spark)
    resumed.load(dir)
    resumed.fold(batch((1L, "https://ex.com/a", 10L)), batchId = 3L) // replay
    resumed.fold(batch((2L, "https://ex.com/a", 4L)), batchId = 4L)
    val got = resumed.dedup.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("https://ex.com/a", 2L, 1L, 4L)),
      s"got ${got.toSeq}")
  }
}
