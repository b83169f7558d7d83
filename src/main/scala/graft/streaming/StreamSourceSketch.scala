package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/**
 * Streaming per-source shingle-sketch maintenance — the continuous form
 * of [[Dedup.corpusOverlapKmv]]'s write-time state: as document batches
 * arrive, each source's bottom-k distinct shingle-hash sketch folds
 * forward by MIN-UNION (union, distinct, re-truncate to k — bottom-k
 * sets are mergeable, so the folded sketch equals the batch sketch over
 * all documents seen, EXACTLY, under any arrival order or batch
 * slicing; spec-asserted). State is bounded at sources·k rows forever.
 *
 * The readout IS the batch pair-estimate arithmetic
 * ([[Dedup.overlapFromSketches]]) over the folded state — streamed ≡
 * batch by shared code path, the [[StreamKmv]] / [[StreamDrift]]
 * contract. This is how the corpus-overlap planning matrix stays
 * current at 100 TB: per-ingest cost ∝ batch shingles, and the
 * source×source estimate reads sources·k state rows, never a corpus.
 */
object StreamSourceSketch {

  /** Running per-source bottom-k (source, h) table. */
  final class SketchTable(spark: SparkSession, n: Int = 3, k: Int = 128)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(String, Long)].toDF("source", "h")
    protected def stateColumns: Seq[String] = Seq("source", "h")
    def sketch: DataFrame = currentState
    /** Pair overlap estimates over the folded state — the batch readout. */
    def overlap: DataFrame = Dedup.overlapFromSketches(currentState, k)
    protected def foldInto(state: DataFrame,
        documents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col("h"))
      state
        .unionByName(Dedup.sourceSketch(documents, n, k))
        .distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("source"), col("h"))
    }
  }

  /** Stream of documents (doc_id, text, source) → continuously-folded
    * per-source sketches. */
  def start(documents: DataFrame, table: SketchTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
