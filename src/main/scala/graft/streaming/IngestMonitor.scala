package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.TradeIngest

/**
 * Ingest observability — the streaming counterpart of the reference's 400
 * path (`consumer/http/rest/api.go:44-59`: invalid wire JSON is rejected,
 * valid rows proceed): per micro-batch, how many messages arrived, how
 * many bound+validated, how many the pipeline refused, and the mean
 * derived rate of the admitted rows. A production curation/ingest job runs
 * this beside the store sink; a reject-rate spike is the earliest signal
 * of an upstream format break, and per-batch granularity points at the
 * offending window.
 *
 * Scale: both passes are full-batch aggregations to ONE row (map-side
 * combined); the stats object handed to `onBatch` is constant-size. State
 * across batches lives with the caller (counters, alerting) — the monitor
 * itself is stateless, so it can restart from any offset.
 */
object IngestMonitor {

  /** One micro-batch's ingest health. `mean_rate` is NaN when no row was
    * admitted (no valid rows to average — distinguishable from a real 0). */
  case class BatchStats(batch_id: Long, n_total: Long, n_valid: Long,
      n_invalid: Long, mean_rate: Double)

  /** Start the monitoring stream over a wire-JSON stream. `onBatch` fires
    * once per micro-batch with that batch's stats. */
  def start(
      jsonStream: DataFrame,
      jsonCol: String,
      checkpointPath: String,
      onBatch: BatchStats => Unit,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    jsonStream
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val total = batch.count()
        val row = TradeIngest.parseTrades(batch, jsonCol)
          .agg(count(lit(1)).as("n_valid"), avg(col("rate")).as("mean_rate"))
          .head()
        val valid = row.getLong(0)
        val mean = if (row.isNullAt(1)) Double.NaN else row.getDouble(1)
        onBatch(BatchStats(batchId, total, valid, total - valid, mean))
      }
      .start()
}
