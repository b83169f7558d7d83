package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift

/**
 * Streaming drift monitor — the live twin of [[Drift.valueDrift]]: a
 * FROZEN reference histogram (yesterday's corpus, the training
 * snapshot) against a continuously-folded live histogram, with the
 * chi-square statistic re-assembled on demand via the SAME
 * [[Drift.chiSquare]] the batch operator uses, so streamed ≡ batch by
 * construction (spec-asserted across micro-batch splits).
 *
 * Counts are SUM-mergeable, so each micro-batch folds with one
 * (type, bin) sum — the same driver-held-table shape as [[StreamHll]] /
 * [[StreamKmv]]; state is bounded at types × bins FOREVER, independent
 * of stream length. Bins absent from one side surface through the full
 * outer join with zero counts — exactly how a batch half sees a bin the
 * other half lacks.
 */
object StreamDrift {

  /** Per-(event_type, bin) live histogram of `floor(value/width)`. */
  def histogram(events: DataFrame, width: Double = 10.0): DataFrame =
    events
      .groupBy(col("event_type"),
        floor(col("value") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))

  /** Running live histogram vs a frozen reference — [[StandingTable]]
    * plumbing for the LIVE side (checkpoint-per-fold, batchId
    * idempotence, snapshot/resume); the reference is constructor-frozen
    * and travels with the monitor, not the snapshot. */
  final class DriftTable(spark: SparkSession, reference: DataFrame,
      width: Double = 10.0) extends StandingTable(spark) {
    import spark.implicits._
    private val ref = reference.select(col("event_type"), col("bin"),
      col("c").cast("long").as("c")).localCheckpoint(true)
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long)].toDF("event_type", "bin", "c")
    protected def stateColumns: Seq[String] = Seq("event_type", "bin", "c")
    /** The folded live histogram — rows bounded by types × bins. */
    def liveHistogram: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        events: DataFrame): DataFrame =
      state
        .unionByName(histogram(events, width))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(col("c")).cast("long").as("c"))
    /** The (type, bin, c0, c1) reference-vs-live count frame both
      * statistics assemble from. */
    private def joined: DataFrame =
      ref.select(col("event_type"), col("bin"), col("c").as("c0"))
        .join(currentState.select(col("event_type"), col("bin"),
          col("c").as("c1")), Seq("event_type", "bin"), "full_outer")
        .select(col("event_type"), col("bin"),
          coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("c1"), lit(0L)).as("c1"))

    /** Chi-square drift of live vs reference, one row per type. */
    def stat: DataFrame = Drift.chiSquare(joined)

    /** PSI of live vs reference off the same folded counts — assembled
      * by the shared [[Drift.psi]], so streamed ≡ batch by construction
      * (the chi-square argument verbatim). */
    def psiStat: DataFrame = Drift.psi(joined)
  }

  /** Stream of events (event_type, value) → continuously-folded counts. */
  def start(events: DataFrame, table: DriftTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
