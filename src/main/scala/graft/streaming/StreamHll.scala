package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming HyperLogLog maintenance — the register-table twin of
 * [[StreamKmv]]. HLL registers are MAX-MERGEABLE: the pointwise max of
 * two register tables is exactly the register table of the union of
 * their inputs, so each micro-batch folds its own (event_type, bucket,
 * reg) partial into the running table with one max-aggregate. State is
 * bounded at groups·m rows FOREVER (m = 2^b registers per group), and
 * the streamed sketch equals the batch sketch over the same events
 * EXACTLY — max is order-insensitive, so arrival order cannot perturb a
 * register (spec-asserted in StreamingSpec-style tests).
 *
 * Same foreachBatch + driver-held-table shape as [[StreamKmv]] /
 * [[StreamCms]]; estimates read via [[EventsOps.hllEstimate]], the SAME
 * assembly the batch query uses.
 */
object StreamHll {

  /** Running (event_type, bucket, reg) register table. */
  final class HllTable(spark: SparkSession, b: Int = 6)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long)].toDF("event_type", "bucket", "reg")
    protected def stateColumns: Seq[String] =
      Seq("event_type", "bucket", "reg")
    def registers: DataFrame = currentState
    def estimate: DataFrame = EventsOps.hllEstimate(currentState, b)
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame = {
      import graft.functions.PortableHash.h60
      val incoming = EventsOps.hllRegisters(
        events.select(col("event_type"),
          h60(col("user_id").cast("string")).as("h")), b)
      state
        .unionByName(incoming)
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("reg")).as("reg"))
    }
  }

  /** Stream of events (event_type, user_id) → continuously-folded sketch. */
  def start(events: DataFrame, table: HllTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
