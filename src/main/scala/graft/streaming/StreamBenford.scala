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
  final class BenfordTable(spark: SparkSession) {
    import spark.implicits._
    @volatile private var cntT: DataFrame =
      Seq.empty[(String, Long, Long)].toDF("event_type", "digit", "n")
    def counts: DataFrame = cntT
    def fold(events: DataFrame): Unit = synchronized {
      cntT = cntT
        .unionByName(EventsOps.benfordCounts(events))
        .groupBy(col("event_type"), col("digit"))
        .agg(sum(col("n")).cast("long").as("n"))
        .localCheckpoint(true)
    }
    /** Current audit over everything ingested so far. */
    def audit: DataFrame = EventsOps.benfordFromCounts(cntT)
  }

  /** Stream of event rows (event_type, value, ...) → continuously-folded
    * Benford audit. */
  def start(events: DataFrame, table: BenfordTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => table.fold(batch))
      .start()
}
