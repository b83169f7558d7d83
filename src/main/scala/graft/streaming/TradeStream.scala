package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.TradeIngest
import graft.store.TradeStore

/**
 * The import plane (SURVEY.md §2.4, §3.3): wire JSON stream → validated,
 * normalized trades → 1-second micro-batches → columnar store, with
 * checkpointed offsets.
 *
 * Reference semantics reproduced:
 *  - ST1 micro-batching: `Trigger.ProcessingTime("1 second")` ≡ the
 *    importer's 1 s flush ticker (`importer/importing/service.go:96-106`).
 *  - ST2 delivery: the reference is at-least-once (offsets committed after
 *    insert, `service.go:126-128`) and rows carry no unique id, so
 *    duplicates are possible and downstream queries double-count them.
 *    Spark's checkpoint WAL gives the stronger exactly-once-per-batch on
 *    clean restart; on a crash mid-batch the parquet append can replay —
 *    i.e. at-least-once, the same guarantee. No dedup is added (there is
 *    no key to dedup on) — deliberate, documented, tested.
 *  - ST3 late data: NO watermark on the store path. Rows land wherever
 *    `time_placed` says; the trends query aggregates from storage at query
 *    time, so late rows retroactively appear in their event-time window.
 *  - ST5 failure: restart from checkpoint resumes from committed offsets.
 *
 * For deployments with a real broker, the same pipeline reads
 * `spark.readStream.format("kafka")...` — the transform chain is identical
 * (it is a pure DataFrame function); the sandbox has no broker, so tests
 * drive it with MemoryStream.
 */
object TradeStream {

  /** Start the ingest→store stream over any streaming DataFrame bearing one
    * wire-JSON message per row in `jsonCol`. */
  def start(
      jsonStream: DataFrame,
      jsonCol: String,
      storePath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      idempotent: Boolean = false): StreamingQuery = {
    TradeIngest.parseTrades(jsonStream, jsonCol)
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent=true upgrades ST2's at-least-once to exactly-once:
        // a replayed batch overwrites its own batch_id partition
        if (idempotent) TradeStore.writeBatch(batch, storePath, batchId)
        else TradeStore.write(batch, storePath)
      }
      .start()
  }

  /**
   * Continuously-maintained windowed aggregate (the alternative serving
   * path). Needs a watermark to bound state, so — documented deviation from
   * the store-then-query path (ST3) — rows later than the watermark are
   * dropped here, and `median` is the approximate percentile (streaming
   * state must be mergeable; ClickHouse's own `median` is approximate too,
   * SURVEY.md §2.3 A3).
   */
  def continuousTrends(trades: DataFrame, watermark: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    trades
      .withWatermark("time_placed", watermark)
      .groupBy(
        // optional overlapping windows (slide < window): state grows by
        // window/slide open groups per pair, still watermark-bounded
        slide match {
          case Some(s) => window(col("time_placed"), "10 minutes", s)
          case None => window(col("time_placed"), "10 minutes")
        },
        col("currency_from"), col("currency_to"))
      .agg(
        min(col("rate")).as("min"),
        max(col("rate")).as("max"),
        avg(col("rate")).as("mean"),
        percentile_approx(col("rate"), lit(0.5), lit(10000)).as("median_approx"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window"), col("currency_from"),
        col("currency_to"), col("min"), col("max"), col("mean"),
        col("median_approx"), col("n"))
}
