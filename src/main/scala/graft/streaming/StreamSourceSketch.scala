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
  final class SketchTable(spark: SparkSession, n: Int = 3, k: Int = 128) {
    import spark.implicits._
    @volatile private var current: DataFrame =
      Seq.empty[(String, Long)].toDF("source", "h")
    def sketch: DataFrame = current
    /** Pair overlap estimates over the folded state — the batch readout. */
    def overlap: DataFrame = Dedup.overlapFromSketches(current, k)
    def fold(documents: DataFrame): Unit = synchronized {
      val w = Window.partitionBy(col("source")).orderBy(col("h"))
      current = current
        .unionByName(Dedup.sourceSketch(documents, n, k))
        .distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("source"), col("h"))
        .localCheckpoint(true)
    }
  }

  /** Stream of documents (doc_id, text, source) → continuously-folded
    * per-source sketches. */
  def start(documents: DataFrame, table: SketchTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => table.fold(batch))
      .start()
}
