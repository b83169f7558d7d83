package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.UrlCuration

/**
 * Standing per-host census — the two-weight sibling of
 * [[StreamHostMass]] on the [[StandingTable]] base (batchId-idempotent
 * folds, eager-checkpoint block release, atomic snapshot/resume): each
 * micro-batch's documents sum-merge (doc count, char mass) under their
 * canonical host, and [[rollup]] reads the standing census through
 * [[UrlCuration.domainRollupFrom]] VERBATIM — the continuous form of
 * the batch `domain_rollup` gate (streamed ≡ batch bit-for-bit by the
 * shared readout). A crawl operator watches the domain hierarchy grow
 * live instead of re-scanning the corpus per audit; state is
 * host-cardinality, fold cost ∝ batch.
 */
object StreamDomainRollup {

  /** Standing (host, n_docs, chars) census table. */
  final class CensusTable(s: SparkSession) extends StandingTable(s) {
    protected def emptyState: DataFrame = {
      import s.implicits._
      Seq.empty[(String, Long, Long)].toDF("host", "n_docs", "chars")
    }
    protected def stateColumns: Seq[String] = Seq("host", "n_docs", "chars")
    protected def foldInto(state: DataFrame, batch: DataFrame): DataFrame =
      state.unionByName(
          batch.groupBy(col("host"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).cast("long").as("chars")))
        .groupBy(col("host"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("chars")).cast("long").as("chars"))
    /** The standing (host, n_docs, chars) census. */
    def state: DataFrame = currentState
  }

  /** Fold a document stream's (canonical host, char mass) into the
    * standing census. */
  def start(docsWithUrl: DataFrame, table: CensusTable): StreamingQuery =
    docsWithUrl.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch.select(
          UrlCuration.hostOf(
            UrlCuration.canonUrl(col("url"))).as("host"),
          col("n_chars")), batchId))
      .start()

  /** The domain readout — batch [[UrlCuration.domainRollupFrom]]
    * verbatim over the standing census, so streamed ≡ batch. */
  def rollup(table: CensusTable): DataFrame =
    UrlCuration.domainRollupFrom(table.state)
}
