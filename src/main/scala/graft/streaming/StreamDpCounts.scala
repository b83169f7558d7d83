package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming differentially-private telemetry — the continuous form of
 * `TextAnalysis.dpCounts`: the standing state is the EXACT per-
 * (source, lang) cell count (sum-foldable per micro-batch, bounded at
 * the attribute-domain cell grid forever — the trusted curator's
 * internal table), and every readout applies the keyed PRF noise via
 * `TextAnalysis.dpCountsFrom` VERBATIM over the standing counts.
 *
 * Two properties fall out of noise-at-readout with PRF noise:
 *  - streamed ≡ batch: a readout after any batch split equals the
 *    batch release over the same documents bit-for-bit (the noise
 *    depends only on the cell key; the folded count is exact);
 *  - budget safety under repeated reads: every readout of a cell adds
 *    the SAME noise draw, so publishing the release twice (or reading
 *    mid-stream and again at the end) reveals nothing beyond one
 *    ln 2-DP release per cell snapshot — the PRF-noise argument of
 *    [[TextAnalysis.dpNoise]] made operational.
 *
 * Same foreachBatch + checkpointed-table shape as [[StreamEncodingAudit]].
 */
object StreamDpCounts {

  /** Running exact cell-count table — [[StandingTable]] plumbing
    * (checkpoint-per-fold, batchId idempotence, snapshot/resume). The
    * snapshot holds EXACT counts — it is curator-internal state and
    * must stay as protected as the raw corpus; only [[release]] output
    * is the private artifact. */
  final class CellTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, String, Long)].toDF("source", "lang", "n")
    protected def stateColumns: Seq[String] = Seq("source", "lang", "n")
    def cells: DataFrame = currentState
    /** The private release off the standing counts — the batch
      * operator's noise-at-readout half. */
    def release(seed: String = "dp1"): DataFrame =
      TextAnalysis.dpCountsFrom(currentState, seed)
    protected def foldInto(state: DataFrame,
        documents: DataFrame): DataFrame =
      state
        .unionByName(documents.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n")))
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n")).cast("long").as("n"))
  }

  /** Stream of documents (source + lang columns) → continuously-folded
    * exact cell counts; read releases via [[CellTable.release]]. */
  def start(documents: DataFrame, table: CellTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
