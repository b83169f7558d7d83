package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sampling

/**
 * Streaming PACKING LEDGER — the continuously-folded form of
 * [[Sampling.packSequences]]: as documents arrive, maintain the
 * token-budget sequence assignment of EVERYTHING ingested so far.
 *
 * The layout is doc_id-ordered within each hash shard, so a late-arriving
 * low doc_id legitimately REFLOWS every assignment after it in its shard
 * — retroactive by design, like the store path's unbounded windows (ST3).
 * The fold therefore keeps per-doc METADATA, not text: each batch maps
 * documents to (doc_id, shard, n_tokens) with the same map-side
 * projection the batch operator uses ([[Sampling.packMeta]]), and the
 * readout runs the IDENTICAL sequence arithmetic
 * ([[Sampling.packSequencesFromMeta]]) over the accumulated ledger —
 * streamed ≡ batch by construction, not by a parallel reimplementation.
 *
 * Idempotent under at-least-once delivery: the ledger dedups on doc_id
 * (a replayed document carries the same deterministic metadata), so
 * duplicate waves cannot shift any assignment — spec-asserted alongside
 * arrival-order insensitivity. State is doc-cardinality × three longs;
 * the text itself never enters the ledger.
 */
object StreamPack {

  /** Running (doc_id, shard, n_tokens) ledger. */
  final class PackTable(spark: SparkSession, budgetTokens: Long = 512L,
      nShards: Int = 8) extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "shard", "n_tokens")
    protected def stateColumns: Seq[String] =
      Seq("doc_id", "shard", "n_tokens")
    def meta: DataFrame = currentState
    protected def foldInto(state: DataFrame, docs: DataFrame): DataFrame =
      state
        .unionByName(Sampling.packMeta(docs, nShards))
        .dropDuplicates("doc_id")
    /** Current packing of everything ingested so far. */
    def packed: DataFrame =
      Sampling.packSequencesFromMeta(currentState, budgetTokens)
  }

  /** Stream of document rows (doc_id, text, ...) → continuously-folded
    * packing ledger. */
  def start(documents: DataFrame, table: PackTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
