package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming Kaplan–Meier retention — the continuously-folded form of
 * [[EventsOps.survivalRetention]]: the curve a live retention dashboard
 * reads without ever rescanning the event history.
 *
 * State is the per-user (first, last) ns-span — two longs per user,
 * bounded by the USER domain, not the stream (a million events from one
 * user are one state row) — merged per micro-batch by min/max cell
 * folds. min/max is commutative, associative AND idempotent, so unlike
 * additive histogram state this table is safe under at-least-once
 * REDELIVERY too: refolding a delivered batch cannot move a span.
 * Arrival order and batch slicing cannot either (spec-asserted
 * streamed ≡ batch on shuffled waves).
 *
 * Readout runs the IDENTICAL spine arithmetic the batch operator uses
 * ([[EventsOps.survivalFromSpans]]) — shared code, not a parallel
 * reimplementation — including re-deriving the observation horizon
 * t_end = max(last) from the state itself, so a quiet stream's curve
 * keeps pricing censoring against the newest event actually seen.
 */
object StreamSurvival {

  /** Running per-user span table. */
  final class SpanTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long, Long)].toDF("user_id", "f", "l")
    protected def stateColumns: Seq[String] = Seq("user_id", "f", "l")
    def spans: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame =
      state
        .unionByName(events.select(col("user_id"),
          col("ts_ns").as("f"), col("ts_ns").as("l")))
        .groupBy(col("user_id"))
        .agg(min(col("f")).as("f"), max(col("l")).as("l"))
    /** Current KM curve over everything ingested so far. */
    def survival(horizonDays: Long = 1L): DataFrame =
      EventsOps.survivalFromSpans(currentState, horizonDays)
  }

  /** Stream of event rows (user_id, ts_ns, ...) → continuously-folded
    * retention curve. */
  def start(events: DataFrame, table: SpanTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
