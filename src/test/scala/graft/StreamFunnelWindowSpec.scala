package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, unix_micros}

import graft.operators.EventsOps
import graft.streaming.StreamFunnelWindow

class StreamFunnelWindowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed funnel: reverse-time waves converge to batch; converged users collapse to flags") {
    implicit val sqlCtx = spark.sqlContext
    val windowSec = 21600L // (15, 14, 1) on sf0.001 — every level live
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // adversarial arrival: reverse time order — every wave delivers
    // events EARLIER than already-folded ones, so late views must
    // retro-open chains against already-seen clicks/purchases
    val shuffled = events.sortBy(-_._3)
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamFunnelWindow.FunnelWindowTable(spark, windowSec)
    val q = StreamFunnelWindow.start(
      src.toDS().toDF("user_id", "event_type", "us"), table)
    shuffled.grouped(250).foreach { wave =>
      src.addData(wave: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = table.funnel.collect()(0)
    val batch = EventsOps.funnelWindow(
      Tables.events(spark, sf0001), windowSec).collect()(0)
    assert((0 to 3).map(streamed.getLong) == (0 to 3).map(batch.getLong),
      s"streamed $streamed != batch $batch")
    // the converged user's history collapsed to a flag
    assert(table.done.count() == batch.getLong(3))
    val doneIds = table.done.collect().map(_.getLong(0)).toSet
    assert(table.kept.collect().forall(r => !doneIds(r.getLong(0))),
      "converged users must hold no event rows")
  }

  test("late events for a converged user are dead on arrival; level is frozen") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamFunnelWindow.FunnelWindowTable(spark, 3600L)
    val q = StreamFunnelWindow.start(
      src.toDS().toDF("user_id", "event_type", "us"), table)
    val M = 60L * 1000000L // one minute in μs
    // u1 converts inside batch 1; u2 has click+purchase but no view yet
    src.addData(
      (1L, "view", 0L), (1L, "click", M), (1L, "purchase", 2 * M),
      (2L, "click", 10 * M), (2L, "purchase", 12 * M))
    q.processAllAvailable()
    assert(table.done.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(table.kept.filter(col("user_id") === 1L).count() == 0)
    // batch 2: more u1 traffic (must be dropped on arrival) and the LATE
    // u2 view that retro-opens a full chain from already-seen events
    src.addData((1L, "view", 100 * M), (2L, "view", 9 * M))
    q.processAllAvailable()
    q.stop()
    assert(table.kept.filter(col("user_id") === 1L).count() == 0)
    val r = table.funnel.collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (2L, 2L, 2L),
      s"both users should sit at level 3, got $r")
  }

  test("horizon-bounded table: streamed == batch within the lateness contract; history is pruned") {
    implicit val sqlCtx = spark.sqlContext
    val windowSec = 21600L
    val latenessUs = 3600L * 1000000L // 1h allowed lateness
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    // horizon-respecting arrival: ascending event time, so every wave
    // honors "arrivals >= hwm - L" trivially
    val ordered = events.sortBy(_._3)
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamFunnelWindow.FunnelWindowTable(spark, windowSec,
      latenessUs = Some(latenessUs))
    val q = StreamFunnelWindow.start(
      src.toDS().toDF("user_id", "event_type", "us"), table)
    ordered.grouped(250).foreach { wave =>
      src.addData(wave: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = table.funnel.collect()(0)
    val batch = EventsOps.funnelWindow(
      Tables.events(spark, sf0001), windowSec).collect()(0)
    assert((0 to 3).map(streamed.getLong) == (0 to 3).map(batch.getLong),
      s"bounded streamed $streamed != batch $batch")
    // the retention guarantee actually bit: kept holds only events within
    // windowSec + lateness of the high-water mark, far below the
    // funnel-relevant history the unbounded table would hold
    val hwm = ordered.map(_._3).max
    val cutoff = hwm - latenessUs - windowSec * 1000000L
    assert(table.kept.filter(col("us") < cutoff).count() == 0,
      "events below the horizon cutoff survived pruning")
    val unboundedSize = events.count { case (_, t, _) =>
      Set("view", "click", "purchase")(t) }
    assert(table.kept.count() < unboundedSize / 2,
      "horizon pruning kept most of the history — bound not effective")
  }
}
