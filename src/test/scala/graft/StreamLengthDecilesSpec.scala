package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.TextAnalysis
import graft.streaming.StreamLengthDeciles

/** Streaming length deciles: histogram-state fold converges to the batch
  * report under any arrival order; state stays length-domain-bounded. */
class StreamLengthDecilesSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves converge to the batch deciles; state is histogram-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val shuffled = docs.sortBy(d => (d._1 % 5, -d._1))
    val src = MemoryStream[(Long, String)]
    val table = new StreamLengthDeciles.LengthHistTable(spark)
    val q = StreamLengthDeciles.start(
      src.toDS().toDF("doc_id", "text"), table)
    try {
      shuffled.grouped(90).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.deciles.collect().map(_.toSeq).toSeq
    val batch = TextAnalysis.lengthDeciles(
      Tables.documents(spark, sf0001)).collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed deciles diverged from batch")
    // bounded state: one row per distinct length, counts conserve docs
    val distinctLengths = docs.map(_._2.length).distinct.size
    assert(table.hist.count() == distinctLengths)
    assert(table.hist.agg(org.apache.spark.sql.functions.sum("cnt"))
      .collect()(0).getLong(0) == docs.size)
  }

  test("redelivery inflates the histogram; a keyed dedup gate restores batch") {
    // Executable delivery contract: histogram addition counts every
    // delivery (divergence asserted), and the documented StreamDedup-
    // style identity gate upstream restores the batch report.
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val waves = docs.grouped(90).toSeq
    val batch = TextAnalysis.lengthDeciles(
      Tables.documents(spark, sf0001)).collect().map(_.toSeq).toSeq

    val ungated = new StreamLengthDeciles.LengthHistTable(spark)
    waves.foreach(w => ungated.fold(w.toDF("doc_id", "text")))
    ungated.fold(waves.head.toDF("doc_id", "text"))
    assert(ungated.hist.agg(org.apache.spark.sql.functions.sum("cnt"))
      .collect()(0).getLong(0) == docs.size + waves.head.size,
      "histogram mass must count every delivery")
    assert(ungated.deciles.collect().map(_.toSeq).toSeq != batch,
      "redelivered wave must be visible in the ungated deciles")

    val src = MemoryStream[(Long, String)]
    val gated = new StreamLengthDeciles.LengthHistTable(spark)
    val q = StreamLengthDeciles.start(
      src.toDS().toDF("doc_id", "text").dropDuplicates("doc_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gated.deciles.collect().map(_.toSeq).toSeq == batch,
      "dedup-gated chain must match the batch deciles under redelivery")
  }
}
