package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamDau

/** Streaming DAU/WAU: the folded activity matrix reproduces the batch
  * stickiness bit-for-bit, and the set-semantic fold absorbs
  * redelivery with no identity gate. */
class StreamDauSpec extends SparkSpec {
  import spark.implicits._

  test("streamed stickiness ≡ batch under splits AND redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
    val rows = ev.select(col("ts_ns"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val waves = rows.grouped((rows.length / 4).max(1)).toSeq

    val src = MemoryStream[(Long, Long)]
    val table = new StreamDau.ActivityTable(spark)
    val q = StreamDau.start(src.toDS().toDF("ts_ns", "user_id"), table)
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        src.addData(w: _*)
        // redeliver wave 0 mid-stream: the distinct fold must absorb it
        if (i == 2) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = table.stickiness.collect().map(_.toSeq).toSeq
    val batch = EventsOps.dauStickiness(ev).collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "set-semantic fold must match batch under redelivery, no gate")
    assert(streamed.nonEmpty)
  }

  test("resume + replay-guard: fold-after-load ≡ uninterrupted") {
    val ev = Tables.events(spark, sf0001)
    val e0 = ev.filter(col("event_id") % 2 === 0)
    val e1 = ev.filter(col("event_id") % 2 === 1)
    val a = new StreamDau.ActivityTable(spark)
    a.fold(e0, 0L)
    val snap = java.nio.file.Files.createTempDirectory("dau_snap")
      .resolve("m").toString
    a.save(snap)
    val b = new StreamDau.ActivityTable(spark)
    b.load(snap); b.fold(e0, 0L); b.fold(e1, 1L)
    val u = new StreamDau.ActivityTable(spark)
    u.fold(e0, 0L); u.fold(e1, 1L)
    assert(b.stickiness.collect().map(_.toSeq).toSeq ==
      u.stickiness.collect().map(_.toSeq).toSeq)
  }
}
