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
}
