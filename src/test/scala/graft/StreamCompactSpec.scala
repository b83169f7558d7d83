package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamCompact
import graft.streaming.StreamCompact.{Ev, Latest}

/** Streaming compaction: converges to the batch latestEvents under
  * out-of-order and duplicate delivery, emits only changed winners, and an
  * older replay never displaces a newer winner. */
class StreamCompactSpec extends SparkSpec {
  import spark.implicits._

  private def run(waves: Seq[Seq[Ev]]): Seq[Seq[Latest]] = {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = StreamCompact.latest(src.toDS()).toDF()
      .writeStream.format("memory").queryName("compacted")
      .outputMode("append").start()
    val out = waves.map { w =>
      val before = spark.table("compacted").count()
      src.addData(w)
      q.processAllAvailable()
      spark.table("compacted").as[Latest].collect().drop(before.toInt).toSeq
    }
    q.stop()
    spark.catalog.dropTempView("compacted")
    out
  }

  test("converges to batch latestEvents; older replays never win; deltas are minimal") {
    val e = Seq(
      Ev(1L, 1L, "click", 100L, 1.0),
      Ev(2L, 1L, "click", 200L, 2.0),   // newer: wins
      Ev(3L, 2L, "view", 150L, 3.0))
    val replayOlder = Seq(
      Ev(1L, 1L, "click", 100L, 1.0),   // duplicate of an old event
      Ev(4L, 2L, "view", 150L, 4.0),    // same us, higher id: wins tie
      Ev(5L, 3L, "buy", 50L, 5.0))      // new key
    val Seq(d1, d2) = run(Seq(e, replayOlder))

    assert(d1.map(l => (l.user_id, l.event_type, l.latest_id)).toSet ==
      Set((1L, "click", 2L), (2L, "view", 3L)))
    // wave 2: the old replay emits nothing; the tie upgrade and new key do
    assert(d2.map(l => (l.user_id, l.event_type, l.latest_id)).toSet ==
      Set((2L, "view", 4L), (3L, "buy", 5L)),
      "only changed winners may be emitted")

    // final winners ≡ the batch operator over the union of all waves
    val all = (e ++ replayOlder).toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("value"))
    val batch = EventsOps.latestEvents(all)
      .select("user_id", "event_type", "latest_id").as[(Long, String, Long)]
      .collect().toSet
    val streamedFinal = (d1 ++ d2)
      .groupBy(l => (l.user_id, l.event_type))
      .map { case (_, ls) => ls.maxBy(l => (l.latest_us, l.latest_id)) }
      .map(l => (l.user_id, l.event_type, l.latest_id)).toSet
    assert(streamedFinal == batch)
  }

  test("arrival-order invariance: reversed waves reach the same winners") {
    val waves = Seq(
      Seq(Ev(10L, 7L, "x", 500L, 1.0), Ev(11L, 7L, "x", 300L, 2.0)),
      Seq(Ev(12L, 7L, "x", 400L, 3.0)))
    val fwd = run(waves).flatten
    val rev = run(waves.reverse.map(_.reverse)).flatten
    def winners(ds: Seq[Latest]) = ds.groupBy(l => (l.user_id, l.event_type))
      .map { case (_, ls) => ls.maxBy(l => (l.latest_us, l.latest_id)) }.toSet
    assert(winners(fwd) == winners(rev))
    assert(winners(fwd).head.latest_id == 10L, "us=500 event must win")
  }
}
