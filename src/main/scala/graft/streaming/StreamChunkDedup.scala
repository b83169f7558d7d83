package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * Streaming chunk-level dedup — the continuous form of
 * `TextAnalysis.chunkDedup`: incoming documents are cut into the same
 * stride-overlapped chunk windows (the batch projection, reused
 * verbatim), and a chunk whose content digest was already admitted
 * within the watermark horizon is dropped — catching the shared
 * boilerplate paragraph an arriving page copies from one admitted
 * minutes ago, which whole-document streaming dedup ([[StreamDedup]])
 * misses entirely.
 *
 * Keep-first semantics match the batch operator (the FIRST arrival of a
 * digest is admitted, later copies drop); the horizon is the honest
 * difference — batch elects keepers over the whole corpus, a stream can
 * only afford digest state for the duplicate-arrival window, which is
 * `dropDuplicatesWithinWatermark`'s contract and exactly the bounded
 * state that survives 100 TB/day (state ∝ chunks per horizon, not
 * corpus size; the cross-horizon complement is the batch operator run
 * at compaction time).
 */
object StreamChunkDedup {

  /** Admitted (first-seen) chunks of a stream of (doc_id, text,
    * `eventTimeCol`) documents. */
  def dedupChunks(documents: DataFrame, eventTimeCol: String = "ts",
      watermark: String = "1 hour", window: Int = 200,
      stride: Int = 150): DataFrame =
    TextAnalysis.chunkProjection(
        documents.withWatermark(eventTimeCol, watermark), window, stride)
      .dropDuplicatesWithinWatermark("chunk_md5")
}
