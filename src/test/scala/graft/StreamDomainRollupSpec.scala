package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.UrlCuration
import graft.streaming.StreamDomainRollup

/** Standing per-host census: sum-mergeable two-weight folds on the
  * StandingTable base; domain readout ≡ the batch domain_rollup
  * bit-for-bit via the shared domainRollupFrom; snapshot/resume under
  * the fold-watermark contract. */
class StreamDomainRollupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed domain rollup ≡ batch domain_rollup, bit-for-bit") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val rows = docs.select(col("doc_id"), col("url"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 3) // uneven on purpose

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamDomainRollup.CensusTable(spark)
    val q = StreamDomainRollup.start(
      src.toDF().toDF("doc_id", "url", "n_chars"), table)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamDomainRollup.rollup(table).collect().toSeq
    val batch = UrlCuration.domainRollup(docs).collect().toSeq
    assert(streamed == batch,
      s"streamed $streamed\n!= batch $batch")

    // the standing census itself equals the batch host census
    val state = table.state.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = UrlCuration.hostCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(state == direct)
  }

  test("snapshot/resume: replayed batch skipped, next batch applies") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files
      .createTempDirectory("graft_domroll_snap").toString + "/snap"
    def hostBatch(tag: String, w: Long): DataFrame =
      Seq((s"https://www.$tag.ex/a", w)).toDF("url", "n_chars")
        .select(
          UrlCuration.hostOf(UrlCuration.canonUrl(col("url"))).as("host"),
          col("n_chars"))

    val t = new StreamDomainRollup.CensusTable(spark)
    t.fold(hostBatch("d1", 10L), batchId = 3L)
    t.save(dir)

    val resumed = new StreamDomainRollup.CensusTable(spark)
    resumed.load(dir)
    resumed.fold(hostBatch("d1", 10L), batchId = 3L) // replay → skipped
    resumed.fold(hostBatch("d2", 5L), batchId = 4L)
    val got = resumed.state.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("www.d1.ex", 1L, 10L), ("www.d2.ex", 1L, 5L)),
      s"got $got")
    // and the domain readout folds the www prefix away
    val doms = StreamDomainRollup.rollup(resumed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(doms.toSeq == Seq(("d1.ex", 1L, 1L, 10L), ("d2.ex", 1L, 1L, 5L)))
  }
}
