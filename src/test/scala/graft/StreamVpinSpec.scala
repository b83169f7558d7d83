package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.MarketStats
import graft.streaming.StreamVpin
import graft.streaming.StreamVpin.Tick

/** Streaming volume-clock bucket assignments must equal the batch
  * window formulation — including a bucket straddling a micro-batch
  * boundary and sign/volume state carried across it. */
class StreamVpinSpec extends SparkSpec {
  import spark.implicits._

  test("streamed bucket assignments equal the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Tick]
    val q = StreamVpin(src.toDS(), bucketVol = 10L)
      .writeStream.format("memory").queryName("vpin")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 (out of order inside): cumPrev 0,4,8 → all bucket 0
      src.addData(
        Tick("a", 3, 3000L, 105, 4), // down-tick −1
        Tick("a", 1, 1000L, 100, 4), // first tick, sign 0
        Tick("a", 2, 2000L, 110, 4)) // up-tick +1
      q.processAllAvailable()
      // batch 2: bucket 1 opens mid-state (cumPrev 12, 17); the
      // zero-tick must inherit −1 through the carried state
      src.addData(
        Tick("a", 4, 4000L, 105, 5),
        Tick("a", 5, 5000L, 120, 7),
        Tick("b", 6, 1000L, 500, 9)) // fresh instrument, sign 0
      q.processAllAvailable()

      val got = spark.table("vpin")
        .orderBy("event_type", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getLong(4)))
      assert(got.toSeq == Seq(
        ("a", 1L, 0L, 0, 4L), ("a", 2L, 0L, 1, 4L), ("a", 3L, 0L, -1, 4L),
        ("a", 4L, 1L, -1, 5L), ("a", 5L, 1L, 1, 7L),
        ("b", 6L, 0L, 0, 9L)))

      // per-bucket imbalance assembled from the emitted rows equals the
      // batch operator over the same ticks
      val streamed = spark.table("vpin")
        .groupBy(col("event_type"), col("bucket"))
        .agg(
          sum(when(col("sign") === 1, col("size")).otherwise(0L))
            .cast("long").as("buy_vol"),
          sum(when(col("sign") === -1, col("size")).otherwise(0L))
            .cast("long").as("sell_vol"),
          sum(col("size")).cast("long").as("bucket_vol"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val events = Seq(
        (1L, 1000L * 1000L, "a", 1.00, """{"k": 4}"""),
        (2L, 2000L * 1000L, "a", 1.10, """{"k": 4}"""),
        (3L, 3000L * 1000L, "a", 1.05, """{"k": 4}"""),
        (4L, 4000L * 1000L, "a", 1.05, """{"k": 5}"""),
        (5L, 5000L * 1000L, "a", 1.20, """{"k": 7}"""),
        (6L, 1000L * 1000L, "b", 5.00, """{"k": 9}"""))
        .toDF("event_id", "ts_ns", "event_type", "value", "props")
      val batch = MarketStats.vpinBuckets(events, bucketVol = 10L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
