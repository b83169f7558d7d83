package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming DAU/WAU stickiness — the continuous form of
 * `EventsOps.dauStickiness`: the standing state is the distinct
 * (day, user) activity matrix (distinct-union mergeable, so batch
 * boundaries, arrival order AND at-least-once redelivery are absorbed
 * by construction — the set-semantics contract, like the KMV/HLL
 * folds, not the ADD/XOR ones), and every readout is
 * [[EventsOps.dauStickinessFrom]] VERBATIM over the standing matrix —
 * streamed ≡ batch bit-for-bit (spec-asserted).
 *
 * State is days × actives rows — the activity matrix a product
 * warehouse materializes anyway; bounded by the user base per day, not
 * by event volume. [[StandingTable]] plumbing: checkpoint-per-fold,
 * batchId idempotence, watermarked snapshot/resume.
 */
object StreamDau {

  /** Running distinct (day, user) matrix, checkpointed per fold. */
  final class ActivityTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long)].toDF("day", "user_id")
    protected def stateColumns: Seq[String] = Seq("day", "user_id")
    def matrix: DataFrame = currentState
    /** Current stickiness report over everything ingested so far. */
    def stickiness: DataFrame =
      EventsOps.dauStickinessFrom(currentState)
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame =
      state.unionByName(EventsOps.dayUserMatrix(events)).distinct()
  }

  /** Stream of events (ts_ns + user_id) → continuously-folded matrix. */
  def start(events: DataFrame, table: ActivityTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
