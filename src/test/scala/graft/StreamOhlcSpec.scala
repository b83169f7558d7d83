package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.MarketStats
import graft.streaming.StreamOhlc

/** Top-level so the tuple encoder codegen can instantiate it (an inner
  * case class needs the spec's outer pointer — Janino then falls back
  * to interpreted projections for every batch). */
private[graft] case class Tick(event_id: Long, ts: Timestamp,
    event_type: String, value: Double)

/** Streaming candles: incremental min_by/max_by state must agree with the
  * batch OHLC operator over the same ticks, across micro-batch splits. */
class StreamOhlcSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming candles equal the batch bars, across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamOhlc.candles(src.toDF())
      .writeStream.format("memory").queryName("candles")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 1: two ticks of one window, out of order
      src.addData(
        Tick(2, t("2024-08-12 10:03:00"), "eurusd", 1.30),
        Tick(1, t("2024-08-12 10:01:00"), "eurusd", 1.10))
      q.processAllAvailable()
      // batch 2: a LATER-arriving tick that is the true open, plus a
      // second window — state must merge, not restart
      src.addData(
        Tick(3, t("2024-08-12 10:00:30"), "eurusd", 1.20),
        Tick(4, t("2024-08-12 10:12:00"), "eurusd", 0.90))
      q.processAllAvailable()

      val got = spark.table("candles")
        .orderBy("event_type", "window_start").collect()
      assert(got.map(r => (r.getTimestamp(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq ==
        Seq(("2024-08-12 10:00:00.0", 1.20, 1.30, 1.10, 1.30, 3L),
          ("2024-08-12 10:10:00.0", 0.90, 0.90, 0.90, 0.90, 1L)))

      // and the batch operator over the same ticks says the same
      val batch = MarketStats.ohlcBars(
        Seq((1L, t("2024-08-12 10:01:00"), "eurusd", 1.10),
          (2L, t("2024-08-12 10:03:00"), "eurusd", 1.30),
          (3L, t("2024-08-12 10:00:30"), "eurusd", 1.20),
          (4L, t("2024-08-12 10:12:00"), "eurusd", 0.90))
          .toDF("event_id", "ts", "event_type", "value")
          .withColumn("ts_ns",
            org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000")))
        .collect()
      assert(batch.map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6))).toSeq ==
        got.map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toSeq)
    } finally q.stop()
  }

  test("session candles merge when a late tick bridges two partial sessions") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamOhlc.sessionCandles(src.toDF(), gap = "10 minutes")
      .writeStream.format("memory").queryName("sess_candles")
      .outputMode(OutputMode.Complete()).start()
    try {
      // two ticks 16 min apart: separate sessions at first...
      src.addData(
        Tick(1, t("2024-08-12 10:00:00"), "eurusd", 1.00),
        Tick(2, t("2024-08-12 10:16:00"), "eurusd", 3.00))
      q.processAllAvailable()
      assert(spark.table("sess_candles").count() == 2)
      // ...until a bridging tick lands between them (8 min to each —
      // both gaps < 10 min): the two session states must MERGE
      src.addData(Tick(3, t("2024-08-12 10:08:00"), "eurusd", 2.00))
      q.processAllAvailable()
      val rows = spark.table("sess_candles").collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6)) == (1.00, 3.00, 1.00, 3.00, 3L))
      assert(r.getTimestamp(1).toString == "2024-08-12 10:00:00.0")
    } finally q.stop()
  }

  test("streaming VWAP accumulates exact sums across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String, Double, Long)]
    val df = src.toDF().toDF("event_id", "ts", "event_type", "value", "size")
    val q = StreamOhlc.vwapStream(df)
      .writeStream.format("memory").queryName("vwap_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      src.addData((1L, t("2024-08-12 10:10:00"), "eurusd", 2.00, 1L))
      q.processAllAvailable()
      src.addData((2L, t("2024-08-12 10:50:00"), "eurusd", 4.00, 3L))
      q.processAllAvailable()
      val r = spark.table("vwap_stream").collect()
      // (2·1 + 4·3)/4 = 3.5 — exact across the two micro-batches
      assert(r.length == 1 && r(0).getLong(2) == 3500000L &&
        r(0).getLong(3) == 4L && r(0).getLong(4) == 2L)
    } finally q.stop()
  }

  test("append mode emits a candle only once the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamOhlc.candles(src.toDF(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("candles_append")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData(Tick(1, t("2024-08-12 10:01:00"), "eurusd", 1.10))
      q.processAllAvailable()
      assert(spark.table("candles_append").count() == 0) // still open
      // advance the watermark past the closed candles; the 11:00 one
      // stays open (watermark 10:55) and must NOT emit
      src.addData(Tick(2, t("2024-08-12 10:30:00"), "eurusd", 2.00))
      q.processAllAvailable()
      src.addData(Tick(3, t("2024-08-12 11:00:00"), "eurusd", 3.00))
      q.processAllAvailable()
      val rows = spark.table("candles_append").orderBy("window_start").collect()
      assert(rows.map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSeq
        == Seq(("2024-08-12 10:00:00.0", 1.10), ("2024-08-12 10:30:00.0", 2.00)))
    } finally q.stop()
  }
}
