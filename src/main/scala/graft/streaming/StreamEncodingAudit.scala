package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming encoding/mojibake monitoring — the continuous form of
 * `TextAnalysis.encodingAudit`: every artifact counter (and the
 * flagged-doc count — the flag is a per-doc decision, independent of
 * other docs) is a per-doc sum, so the per-source census is
 * sum-mergeable and the streaming form needs no special machinery:
 * each micro-batch runs the BATCH operator on its own rows and folds
 * the result into the running census by summing. State is bounded at
 * |sources| rows forever; integer counts mean streamed ≡ batch over
 * the same documents EXACTLY (spec-asserted), under any batch split.
 *
 * The live read an ingest pipeline keeps per feed: a source whose
 * mojibake/replacement counters start climbing mid-crawl is flagged
 * batches — not a full-corpus audit — after the damage starts.
 * Same foreachBatch + driver-held-table shape as [[StreamCms]].
 */
object StreamEncodingAudit {

  private val Counters = Seq("n_docs", "n_non_ascii", "n_mojibake_lead",
    "n_replacement", "n_c1_controls", "n_c0_controls", "n_punct_runs",
    "n_flagged_docs")

  /** Running per-source census — [[StandingTable]] plumbing
    * (checkpoint-per-fold with superseded-block release, batchId
    * idempotence, snapshot/resume). */
  final class CensusTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
        .toDF(("source" +: Counters): _*)
    protected def stateColumns: Seq[String] = "source" +: Counters
    def census: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        documents: DataFrame): DataFrame = {
      val aggs = Counters.map(c => sum(col(c)).cast("long").as(c))
      state
        .unionByName(TextAnalysis.encodingAudit(documents))
        .groupBy(col("source"))
        .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Stream of documents (text + source columns) → continuously-folded
    * per-source artifact census. */
  def start(documents: DataFrame, table: CensusTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
