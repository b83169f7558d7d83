package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.MarketStats
import graft.streaming.StreamOrderFlow
import graft.streaming.StreamOrderFlow.Tick

/** Streaming tick-rule signs must equal the batch window formulation —
  * including sign inheritance carried ACROSS a micro-batch boundary. */
class StreamOrderFlowSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600L * 1000000L

  test("streamed signs equal the batch tick rule, state carried across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamOrderFlow(src.toDS())
      .writeStream.format("memory").queryName("flow")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 (out of order inside the batch): 1.00 → 1.02 → 1.02
      // signs: first 0, uptick +1, zero-tick inherits +1
      src.addData(
        Tick("a", 3, 3000L, 102, 7),
        Tick("a", 1, 1000L, 100, 10),
        Tick("a", 2, 2000L, 102, 5))
      q.processAllAvailable()
      // batch 2: zero-tick FIRST — must inherit +1 from the carried
      // state, then a downtick flips to −1; second instrument starts 0
      src.addData(
        Tick("a", 4, hourUs + 1000L, 102, 4),
        Tick("a", 5, hourUs + 2000L, 101, 6),
        Tick("b", 6, 1000L, 500, 9))
      q.processAllAvailable()

      val got = spark.table("flow")
        .orderBy("event_type", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getInt(4), r.getLong(5)))
      assert(got.toSeq == Seq(
        ("a", 1L, 0L, 0, 0L), ("a", 2L, 0L, 1, 5L), ("a", 3L, 0L, 1, 7L),
        ("a", 4L, 3600L, 1, 4L), ("a", 5L, 3600L, -1, -6L),
        ("b", 6L, 0L, 0, 0L)))

      // windowed imbalance assembled from the emitted rows equals the
      // batch operator over the same ticks
      val streamedImb = spark.table("flow")
        .groupBy(col("event_type"), col("window_start"))
        .agg(sum(col("signed_size")).as("imbalance"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = MarketStats.orderFlowImbalance(
        Seq((1L, 1000L, "a", 1.00, 10L), (2L, 2000L, "a", 1.02, 5L),
          (3L, 3000L, "a", 1.02, 7L),
          (4L, hourUs + 1000L, "a", 1.02, 4L),
          (5L, hourUs + 2000L, "a", 1.01, 6L),
          (6L, 1000L, "b", 5.00, 9L))
          .toDF("event_id", "ts_us", "event_type", "value", "k")
          .select(col("event_id"), expr("ts_us * 1000").as("ts_ns"),
            col("event_type"), col("value"),
            format_string("{\"k\": %d}", col("k")).as("props")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamedImb == batch)
    } finally q.stop()
  }
}
