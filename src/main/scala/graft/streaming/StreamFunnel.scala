package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming ordered-funnel maintenance — per-user view→click→purchase
 * conversion over an unbounded, out-of-order event stream, EXACTLY
 * convergent to the batch [[EventsOps.funnelSteps]] (spec-asserted under
 * shuffled arrival).
 *
 * The trick is a provably SUFFICIENT pruned state. Per user keep:
 *   - the minimum view time v (a plain min — folds trivially);
 *   - clicks ≤ c*, where c* = min click after v. v only decreases as
 *     late views arrive, so the qualifying set {clicks > v} only GROWS,
 *     and c* only decreases. A discarded click t ≥ c*(then) ≥ c*(final)
 *     can never become the first qualifying click — so pruning clicks
 *     above c* loses nothing, ever;
 *   - purchases ≤ p* by the same argument against c*.
 *
 * State is the corpus' pre-conversion prefix only (typically a handful
 * of rows per user: everything after the first conversion is dropped on
 * arrival), yet the fold never needs a watermark to stay correct —
 * arbitrarily late data just re-prunes. Readout reuses
 * [[EventsOps.funnelFromUs]], so streamed ≡ batch is by construction.
 * Same foreachBatch + driver-held-table shape as [[StreamKmv]].
 */
object StreamFunnel {

  /** Running pruned (user_id, event_type, us) table. */
  final class FunnelTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, String, Long)].toDF("user_id", "event_type", "us")
    protected def stateColumns: Seq[String] =
      Seq("user_id", "event_type", "us")
    def kept: DataFrame = currentState
    def funnel: DataFrame = EventsOps.funnelFromUs(currentState)
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
      val all = state
        .unionByName(events
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("us")))
        .distinct()
      all
        .withColumn("v_us",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("c_us",
          min(when(col("event_type") === "click" && col("us") > col("v_us"),
            col("us"))).over(w))
        .withColumn("p_us",
          min(when(col("event_type") === "purchase" && col("us") > col("c_us"),
            col("us"))).over(w))
        .filter(
          (col("event_type") === "view" && col("us") === col("v_us")) ||
          (col("event_type") === "click" &&
            (col("c_us").isNull || col("us") <= col("c_us"))) ||
          (col("event_type") === "purchase" &&
            (col("p_us").isNull || col("us") <= col("p_us"))))
        .select(col("user_id"), col("event_type"), col("us"))
    }
  }

  /** Stream of (user_id, event_type, us) rows → continuously-folded funnel. */
  def start(events: DataFrame, table: FunnelTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
