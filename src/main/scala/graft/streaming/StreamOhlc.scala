package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming OHLC candles — the incremental form of
 * [[graft.operators.MarketStats.ohlcBars]]: per instrument × event-time
 * tumbling window, open/high/low/close/volume maintained as the ticks
 * arrive instead of recomputed per query (the reference recomputes its
 * trend windows on every request and caches 60 s,
 * `trends/listing/service.go:49-63`; a live candle feed inverts that).
 *
 * Open/close ride `min_by`/`max_by` over the (epoch, event_id) tick
 * order — declarative aggregates with O(1) per-group state that merge
 * correctly across partial aggregation and micro-batches, unlike a
 * window-function formulation (row_number needs the full window
 * buffered and is unsupported on streams anyway). The watermark bounds
 * state: a candle's group state lives until the watermark passes its
 * window end, then emits (append mode) and is dropped — state tracks
 * OPEN candles only, never history, which is what keeps a 100 TB/day
 * tick feed's state constant-sized per instrument.
 */
object StreamOhlc {

  /** `ticks` needs (ts: timestamp, event_type, event_id, value). */
  def candles(ticks: DataFrame, window: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    // (epoch_us, event_id) as one orderable struct: the deterministic
    // tick order shared with the batch operator
    val ord = struct(unix_micros(col("ts")).as("us"), col("event_id"))
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))
  }

  /** Streaming VWAP per instrument × window: Σ(rate·size) and Σsize as
    * exact DECIMAL/long running state (mergeable across micro-batches —
    * the same no-float-sums contract as the batch operator), the
    * division deferred to emission. NULL on zero traded size. */
  def vwapStream(ticks: DataFrame, window: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(8, 2)) *
          col("size")).as("pv"),
        sum(col("size")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("window.start").as("window_start"),
        when(col("volume") =!= 0, expr("(pv * 1000000) div volume"))
          .as("vwap_micro"),
        col("volume"), col("n_ticks"))

  /** Streaming SESSION candles — the incremental form of
    * [[graft.operators.MarketStats.sessionOhlc]]: MERGING session
    * windows (`session_window`) instead of fixed ones, so a candle's
    * extent itself is data-driven and two micro-batches' partial
    * sessions coalesce when a late tick bridges their gap — the hard
    * case a fixed-window pipeline never faces. Same O(1) min_by/max_by
    * state per OPEN session; the watermark closes a session once no
    * bridging tick can still arrive (gap + watermark past its end). */
  def sessionCandles(ticks: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val ord = struct(unix_micros(col("ts")).as("us"), col("event_id"))
    ticks
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), session_window(col("ts"), gap))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"),
        col("session_window.start").as("session_start"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))
  }
}
