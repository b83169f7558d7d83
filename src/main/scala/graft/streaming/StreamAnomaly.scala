package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming Hampel anomaly monitor — the live twin of
 * [[graft.operators.EventsOps.anomalyMad]]: a FROZEN robust envelope
 * (per-type doubled median `med2` and quadrupled MAD `mad4`, fit on
 * yesterday's corpus exactly as a production detector freezes its
 * baseline) against a continuously-folded live (n, n_outliers) count
 * per type, gated by the identical integer comparison
 * 2·|2·cents − med2| > 3·mad4 — no float anywhere, so a streamed count
 * can never disagree with the batch gate on the same rows.
 *
 * Counts are SUM-mergeable, so each micro-batch folds with one
 * per-type sum (the [[StreamDrift]] shape); state is bounded at the
 * type count FOREVER. Types absent from the frozen envelope are
 * dropped (an unseen type has no baseline — production alerts on them
 * separately via the ingest monitor).
 */
object StreamAnomaly {

  /** Per-type (n, n_outliers) of a batch against a (med2, mad4)
    * envelope — the shared assembly: the batch identity spec feeds it
    * the batch's own fit, the stream folds it per micro-batch. */
  def gate(events: DataFrame, envelope: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)")
          .as("cents"))
      .join(broadcast(envelope), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("cents") * 2 - col("med2")) * 2 >
          col("mad4") * 3, 1L).otherwise(0L)).as("n_outliers"))

  /** Running live counts vs a frozen (event_type, med2, mad4) fit. */
  final class AnomalyTable(spark: SparkSession, envelope: DataFrame)
      extends StandingTable(spark) {
    import spark.implicits._
    private val env = envelope
      .select(col("event_type"), col("med2").cast("long"),
        col("mad4").cast("long")).localCheckpoint(true)
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long)].toDF("event_type", "n", "n_outliers")
    protected def stateColumns: Seq[String] =
      Seq("event_type", "n", "n_outliers")
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame =
      state
        .unionByName(gate(events, env))
        .groupBy(col("event_type"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("n_outliers")).cast("long").as("n_outliers"))
    /** Live per-type totals with the frozen envelope echoed back —
      * the same columns as the batch operator. */
    def stat: DataFrame =
      currentState.join(env, Seq("event_type"))
        .select(col("event_type"), col("n"), col("n_outliers"),
          col("med2"), col("mad4"))
        .orderBy(col("event_type"))
  }

  /** Stream of events (event_type, value) → continuously-folded gate. */
  def start(events: DataFrame, table: AnomalyTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
