package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming Benford first-digit audit — the continuously-folded form of
 * [[EventsOps.benfordValues]]: the forensic value-quality read kept live
 * over an event stream, so a feed that starts emitting synthetic or
 * clipped values is visible within a micro-batch, not at the next batch
 * sweep.
 *
 * State is the (event_type, digit) count census — at most 9 rows per
 * type, bounded by the attribute domain, not the stream — merged per
 * micro-batch by cell addition (commutative + associative, so arrival
 * order and batch slicing cannot change it; spec-asserted streamed ≡
 * batch). Readout runs the IDENTICAL restored-grid arithmetic the batch
 * operator uses ([[EventsOps.benfordFromCounts]]).
 *
 * NOTE on delivery: like the length-decile table, addition counts every
 * delivery — exactly-once feeding assumed (the foreachBatch contract
 * under checkpointed sources); pair with [[StreamDedup]] upstream when
 * the transport is at-least-once. EXECUTABLE in StreamBenfordSpec: a
 * redelivered wave provably inflates the census, and the identity-gated
 * chain provably restores the batch audit.
 */
object StreamBenford {

  /** Running bounded (type, digit) census. */
  final class BenfordTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long)].toDF("event_type", "digit", "n")
    protected def stateColumns: Seq[String] =
      Seq("event_type", "digit", "n")
    def counts: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame =
      state
        .unionByName(EventsOps.benfordCounts(events))
        .groupBy(col("event_type"), col("digit"))
        .agg(sum(col("n")).cast("long").as("n"))
    /** Current audit over everything ingested so far. */
    def audit: DataFrame = EventsOps.benfordFromCounts(currentState)
  }

  /** Stream of event rows (event_type, value, ...) → continuously-folded
    * Benford audit. */
  def start(events: DataFrame, table: BenfordTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
