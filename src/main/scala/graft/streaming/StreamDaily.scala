package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MarketStats

/**
 * Streaming DAILY-BAR maintenance — the incremental form of the daily
 * indicator family (`ewma_daily` / `macd_daily` / `rsi_daily`'s shared
 * close election): the per-(instrument, day) LAST-tick close is a
 * max-by-(ts_ns, event_id) election, which is MERGEABLE — folding each
 * micro-batch's winners against the held winners yields exactly the
 * batch election over everything seen, under any arrival order (late
 * ticks retro-correct their day, the no-watermark ST3 convention).
 * State is bounded by instruments × CALENDAR DAYS — it grows with the
 * clock, not the tick volume, which is what makes the daily family
 * cheap to maintain continuously while the tape is unbounded.
 *
 * Readout: [[MarketStats.macdFromCloses]] over the held day-cardinality
 * table — the identical recurrence the batch operator runs, so
 * streamed ≡ batch by construction, not by a parallel implementation.
 * Same foreachBatch + driver-held-table shape as [[StreamFunnel]].
 */
object StreamDaily {

  /** Running per-(event_type, day) close-election winners. */
  final class DailyTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long, Long, Double)]
        .toDF("event_type", "day", "ts_ns", "event_id", "value")
    protected def stateColumns: Seq[String] =
      Seq("event_type", "day", "ts_ns", "event_id", "value")
    def kept: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        batch: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      state
        .unionByName(batch
          .select(col("event_type"),
            expr(s"ts_ns div ${86400L * 1000000000L}").as("day"),
            col("ts_ns"), col("event_id"), col("value")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day"), col("ts_ns"),
          col("event_id"), col("value"))
    }
    def closes: DataFrame = currentState.select(col("event_type"),
      col("day"),
      expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
    def macd: DataFrame = MarketStats.macdFromCloses(closes)
  }

  /** Stream of (event_type, ts_ns, event_id, value) tick rows →
    * continuously-maintained daily close table. */
  def start(events: DataFrame, table: DailyTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
