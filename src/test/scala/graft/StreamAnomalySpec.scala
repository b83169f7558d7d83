package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamAnomaly

/** Streamed Hampel gate ≡ batch: an envelope frozen from the full
  * corpus plus a live stream of the same rows must reproduce the batch
  * [[EventsOps.anomalyMad]] counts EXACTLY — the gate is pure integer
  * comparison against frozen state and counts are sum-mergeable, so
  * micro-batch boundaries cannot flip a row. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("frozen envelope vs streamed rows equals the batch Hampel counts") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
    val batch = EventsOps.anomalyMad(ev)
    val envelope = batch.select(col("event_type"), col("med2"), col("mad4"))

    val table = new StreamAnomaly.AnomalyTable(spark, envelope)
    val src = MemoryStream[(String, Double)]
    val q = StreamAnomaly.start(
      src.toDS().toDF("event_type", "value"), table)
    val rows = ev.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    try {
      rows.grouped(173).foreach { wave => // uneven cuts
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(table.stat.collect().map(_.toSeq).toSeq ==
      batch.collect().map(_.toSeq).toSeq)
  }

  test("state is bounded at the envelope's type count; unseen types dropped") {
    implicit val sqlCtx = spark.sqlContext
    val envelope = Seq(("a", 200L, 8L)).toDF("event_type", "med2", "mad4")
    val table = new StreamAnomaly.AnomalyTable(spark, envelope)
    val src = MemoryStream[(String, Double)]
    val q = StreamAnomaly.start(
      src.toDS().toDF("event_type", "value"), table)
    try {
      (1 to 3).foreach { _ =>
        src.addData((1 to 100).map(i =>
          (if (i % 2 == 0) "a" else "zzz", i / 10.0)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val s = table.stat.collect()
    assert(s.length == 1 && s(0).getString(0) == "a")
    assert(s(0).getLong(1) == 150L) // only the enveloped type counts
  }
}
