package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming LENGTH-DECILE report — the continuously-folded form of
 * [[TextAnalysis.lengthDeciles]], and the streaming face of the round's
 * closed-form-ranking theme: an equal-population report that LOOKS like
 * it needs a global sort needs only a BOUNDED histogram.
 *
 * State is the (n_chars, cnt) histogram — bounded by the length domain,
 * not the stream (a million docs of the same length are ONE state row) —
 * merged per micro-batch by cell addition, which is commutative and
 * associative, so arrival order and batch boundaries cannot change the
 * state (streamed ≡ batch identically, spec-asserted). Readout runs the
 * IDENTICAL closed-form decile arithmetic the batch operator uses
 * ([[TextAnalysis.lengthDecilesFromHist]]) — shared code, not a parallel
 * reimplementation.
 *
 * NOTE on delivery: histogram addition counts every delivery, so this
 * table assumes exactly-once feeding (the foreachBatch contract under
 * checkpointed sources); pair it with [[StreamDedup]] upstream when the
 * transport is at-least-once. EXECUTABLE in StreamLengthDecilesSpec:
 * redelivery provably inflates the histogram; the identity-gated chain
 * provably restores the batch report.
 */
object StreamLengthDeciles {

  /** Running bounded histogram of document lengths. */
  final class LengthHistTable(spark: SparkSession, k: Int = 10)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long)].toDF("n_chars", "cnt")
    protected def stateColumns: Seq[String] = Seq("n_chars", "cnt")
    def hist: DataFrame = currentState
    protected def foldInto(state: DataFrame, docs: DataFrame): DataFrame =
      state
        .unionByName(docs
          .select(length(col("text")).cast("long").as("n_chars"))
          .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt")))
        .groupBy(col("n_chars"))
        .agg(sum(col("cnt")).cast("long").as("cnt"))
    /** Current decile report over everything ingested so far. */
    def deciles: DataFrame =
      TextAnalysis.lengthDecilesFromHist(currentState, k)
  }

  /** Stream of document rows (text, ...) → continuously-folded decile
    * report. */
  def start(documents: DataFrame, table: LengthHistTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
