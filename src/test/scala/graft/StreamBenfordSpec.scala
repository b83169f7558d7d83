package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.EventsOps
import graft.streaming.StreamBenford

/** Streaming Benford: additive census state converges to the batch audit
  * under any arrival order; state stays 9·types-bounded. */
class StreamBenfordSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves converge to the batch audit; state is digit-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val shuffled = ev.sortBy(e => (e._2, e._1))
    val src = MemoryStream[(String, Double)]
    val table = new StreamBenford.BenfordTable(spark)
    val q = StreamBenford.start(src.toDS().toDF("event_type", "value"), table)
    try {
      shuffled.grouped(500).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.audit.collect().map(_.toSeq).toSeq
    val batch = EventsOps.benfordValues(
      Tables.events(spark, sf0001)).collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed Benford audit diverged from batch")
    val nTypes = ev.map(_._1).distinct.size
    assert(table.counts.count() <= 9L * nTypes)
  }
}
