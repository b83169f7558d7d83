package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Profiling, UrlCuration}
import graft.streaming.StreamHostMass

/** Standing weighted host-mass table: sum-mergeable folds on the
  * StandingTable base, concentration readout ≡ the batch host_gini
  * bit-for-bit, snapshot/resume under the fold-watermark contract. */
class StreamHostMassSpec extends SparkSpec {
  import spark.implicits._

  test("streamed host-mass gini ≡ batch host_gini, bit-for-bit") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val rows = docs.select(col("doc_id"), col("url"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 3) // uneven on purpose

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamHostMass.MassTable(spark)
    val q = StreamHostMass.start(
      src.toDF().toDF("doc_id", "url", "n_chars"), table)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamHostMass.gini(table).collect()
    val batch = Profiling.giniFrom(docs
      .select(UrlCuration.hostOf(
        UrlCuration.canonUrl(col("url"))).as("k"), col("n_chars"))
      .groupBy(col("k"))
      .agg(sum(col("n_chars")).cast("long").as("cnt"))).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head == batch.head,
      s"streamed ${streamed.head} != batch ${batch.head}")

    // the standing mass itself equals the batch aggregation
    val state = table.state.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = docs
      .select(UrlCuration.hostOf(
        UrlCuration.canonUrl(col("url"))).as("k"), col("n_chars"))
      .groupBy(col("k")).agg(sum(col("n_chars")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(state == direct)
  }

  test("snapshot/resume: fold-after-load ≡ uninterrupted") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hostmass_snap").toString + "/snap"
    def batchDf(tag: String, w: Long): DataFrame =
      Seq((s"https://$tag.ex/a", w)).toDF("url", "n_chars")
        .select(col("url"), col("n_chars"))
        .withColumn("doc_id", lit(0L))

    val t = new StreamHostMass.MassTable(spark)
    t.fold(batchDf("h1", 10L).select(
      UrlCuration.hostOf(UrlCuration.canonUrl(col("url"))).as("k"),
      col("n_chars").as("w")), batchId = 3L)
    t.save(dir)

    val resumed = new StreamHostMass.MassTable(spark)
    resumed.load(dir)
    // replay of batch 3 is skipped; batch 4 applies
    resumed.fold(batchDf("h1", 10L).select(
      UrlCuration.hostOf(UrlCuration.canonUrl(col("url"))).as("k"),
      col("n_chars").as("w")), batchId = 3L)
    resumed.fold(batchDf("h2", 5L).select(
      UrlCuration.hostOf(UrlCuration.canonUrl(col("url"))).as("k"),
      col("n_chars").as("w")), batchId = 4L)
    val got = resumed.state.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("h1.ex" -> 10L, "h2.ex" -> 5L), s"got $got")
  }
}
