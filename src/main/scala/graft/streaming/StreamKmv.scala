package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming KMV distinct-count maintenance — per-group cardinality
 * tracking over an unbounded event stream. Bottom-k sketches are
 * MERGEABLE: min-union of two bottom-k sets, re-truncated to k, is the
 * bottom-k of the union. So each micro-batch hashes its keys, unions
 * them into the running set, and re-truncates — the state is bounded at
 * groups·k rows FOREVER, and the streamed sketch equals the batch
 * sketch over the same events EXACTLY (spec-asserted): set union is
 * order-insensitive, so arrival order cannot perturb it.
 *
 * Same foreachBatch + driver-held-table shape as [[StreamCms]] /
 * [[StreamGroups]]; estimates read via [[EventsOps.kmvEstimate]], the
 * SAME projection the batch query uses, so streamed ≡ batch is true by
 * construction, not by parallel implementation.
 */
object StreamKmv {

  /** Running bottom-k (event_type, h) table, re-truncated per fold —
    * [[StandingTable]] plumbing (checkpoint-per-fold, batchId
    * idempotence, snapshot/resume). */
  final class KmvTable(spark: SparkSession, k: Int = 64)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long)].toDF("event_type", "h")
    protected def stateColumns: Seq[String] = Seq("event_type", "h")
    def hashes: DataFrame = currentState
    def estimate: DataFrame = EventsOps.kmvEstimate(currentState, k)
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame = {
      import graft.functions.PortableHash.h60
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      state
        .unionByName(events.select(col("event_type"),
          h60(col("user_id").cast("string")).as("h")))
        .distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("event_type"), col("h"))
    }
  }

  /** Stream of events (event_type, user_id) → continuously-folded sketch. */
  def start(events: DataFrame, table: KmvTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
