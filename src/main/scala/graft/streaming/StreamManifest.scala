package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sampling

/**
 * Streaming SHARD MANIFEST — the incrementally-maintained form of
 * [[Sampling.shardManifest]], proving the manifest's design claim: every
 * per-shard statistic is a commutative/associative combine (count and
 * char-mass ADD, id-range MIN/MAX, content fingerprint XOR), so a
 * continuously-ingesting export can keep its reproducibility receipt
 * current by folding each micro-batch's shard-partial manifest into
 * shard-cardinality state — no corpus re-scan, ever. Arrival order and
 * batch boundaries cannot change the state (all combines are order-free),
 * so streamed ≡ batch identically, spec-asserted against the batch
 * operator on the same corpus.
 *
 * State is `nShards` rows forever — the same bounded-state contract as
 * [[StreamLengthDeciles]]' histogram or the sketch tables.
 *
 * NOTE on delivery: XOR and ADD count every delivery (XOR is
 * specifically NOT idempotent — a re-delivered doc cancels its own
 * fingerprint contribution), so this table assumes exactly-once feeding
 * (the foreachBatch contract under checkpointed sources); pair with
 * [[StreamDedup]] upstream when the transport is at-least-once.
 * EXECUTABLE in StreamManifestSpec: redelivery provably double-counts
 * the ADDs and provably cancels the redelivered docs out of the XOR
 * receipt (the silent mode), and the identity-gated chain restores the
 * batch manifest.
 */
object StreamManifest {

  /** Running per-shard manifest (shard-cardinality state) —
    * [[StandingTable]] plumbing (checkpoint-per-fold, batchId
    * idempotence, snapshot/resume). */
  final class ManifestTable(spark: SparkSession, nShards: Int = 16)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("shard", "n_docs", "chars", "min_doc", "max_doc",
          "fingerprint")
    protected def stateColumns: Seq[String] =
      Seq("shard", "n_docs", "chars", "min_doc", "max_doc", "fingerprint")
    def state: DataFrame = currentState
    protected def foldInto(state: DataFrame, docs: DataFrame): DataFrame =
      state
        .unionByName(Sampling.shardManifest(docs, nShards))
        .groupBy(col("shard"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("chars")).cast("long").as("chars"),
          min(col("min_doc")).as("min_doc"),
          max(col("max_doc")).as("max_doc"),
          expr("bit_xor(fingerprint)").as("fingerprint"))
    /** Current manifest over everything ingested so far. */
    def manifest: DataFrame = currentState.orderBy(col("shard"))
  }

  /** Stream of document rows → continuously-folded shard manifest. */
  def start(documents: DataFrame, table: ManifestTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
