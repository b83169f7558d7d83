package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.EventsOps
import graft.streaming.StreamSurvival

/** Streaming KM retention: min/max span state converges to the batch
  * curve under shuffled arrival AND redelivery; state is user-bounded. */
class StreamSurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves + a redelivered wave converge to the batch curve") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // adversarial arrival: order by user-mod stripe, time descending
    val shuffled = ev.sortBy(e => (e._1 % 7, -e._2))
    val src = MemoryStream[(Long, Long)]
    val table = new StreamSurvival.SpanTable(spark)
    val q = StreamSurvival.start(src.toDS().toDF("user_id", "ts_ns"), table)
    try {
      val waves = shuffled.grouped(400).toSeq
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        // redeliver the first wave mid-stream: min/max state must be
        // idempotent under at-least-once duplication
        if (i == 2) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.survival().collect().map(_.toSeq).toSeq
    val batch = EventsOps.survivalRetention(
      Tables.events(spark, sf0001)).collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed KM curve diverged from batch")
    // bounded state: exactly one row per distinct user
    assert(table.spans.count() == ev.map(_._1).distinct.size)
  }
}
