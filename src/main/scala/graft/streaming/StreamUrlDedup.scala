package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.UrlCuration

/**
 * Standing canonical-URL recrawl census — the streaming twin of the
 * batch `url_dedup` gate on the [[StandingTable]] base
 * (batchId-idempotent folds, eager-checkpoint block release, atomic
 * snapshot/resume): as crawl batches arrive, each canonical URL's
 * standing row accumulates (n_dups, fullest-fetch keeper, total chars),
 * and [[dedup]] reads the census through
 * [[UrlCuration.urlDedupFrom]] VERBATIM — streamed ≡ batch bit-for-bit
 * by the shared readout (spec-asserted).
 *
 * Mergeability is the design point: the duplicate count and char mass
 * are sums, and the keeper election min(struct(−n_chars, doc_id)) —
 * keep the FULLEST fetch, ties to the earliest doc — is a min, so the
 * fold is order-free across any batch arrival order and the census
 * equals the one-shot batch census over the union of all batches. A
 * crawl frontier consults the standing census before re-fetching
 * (recrawl suppression) instead of re-scanning the corpus per audit;
 * state is distinct-canonical-URL-cardinality, fold cost ∝ batch.
 */
object StreamUrlDedup {

  /** Standing (url_canon, n_dups, neg, id, total_chars) census table —
    * the keeper struct flattened into snapshot-friendly columns. */
  final class CensusTable(s: SparkSession) extends StandingTable(s) {
    protected def emptyState: DataFrame = {
      import s.implicits._
      Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("url_canon", "n_dups", "neg", "id", "total_chars")
    }
    protected def stateColumns: Seq[String] =
      Seq("url_canon", "n_dups", "neg", "id", "total_chars")
    protected def foldInto(state: DataFrame, batch: DataFrame): DataFrame =
      state.unionByName(
          UrlCuration.urlDedupCensusRaw(batch)
            .select(col("url_canon"), col("n_dups"),
              col("kept.neg").as("neg"), col("kept.id").as("id"),
              col("total_chars")))
        .groupBy(col("url_canon"))
        .agg(sum(col("n_dups")).cast("long").as("n_dups"),
          min(struct(col("neg"), col("id"))).as("m"),
          sum(col("total_chars")).cast("long").as("total_chars"))
        .select(col("url_canon"), col("n_dups"),
          col("m.neg").as("neg"), col("m.id").as("id"), col("total_chars"))
    /** The standing raw census (all canonical URLs, thresholdless). */
    def state: DataFrame = currentState
    /** The recrawl-dedup readout — batch [[UrlCuration.urlDedupFrom]]
      * verbatim over the standing census, so streamed ≡ batch. */
    def dedup: DataFrame =
      UrlCuration.urlDedupFrom(
        currentState.select(col("url_canon"), col("n_dups"),
          struct(col("neg"), col("id")).as("kept"), col("total_chars")))
  }

  /** Fold a (doc_id, url, n_chars) document stream into the standing
    * canonical-URL census. */
  def start(docsWithUrl: DataFrame, table: CensusTable): StreamingQuery =
    docsWithUrl.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
