package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Profiling, UrlCuration}

/**
 * Standing WEIGHTED per-key mass — the char-mass sibling of
 * [[StreamJoinSize]]'s row-count SideState, on the [[StandingTable]]
 * base (batchId-idempotent folds, eager-checkpoint block release,
 * atomic snapshot/resume): each micro-batch's (k, w) rows sum-merge
 * into the standing (k, cnt) relation, so the fold is exactly the
 * batch aggregation and streamed ≡ batch for every readout that
 * consumes it.
 *
 * Wired here as the HOST-MASS monitor: documents fold under their
 * canonical host with their char mass, and [[gini]] reads the standing
 * relation through [[Profiling.giniFrom]] verbatim — the continuous
 * form of `host_gini` (and, keyed by source, of `source_gini`): a
 * crawl operator watches domain concentration drift live instead of
 * re-scanning the corpus per audit. State is host-cardinality, fold
 * cost ∝ batch.
 */
object StreamHostMass {

  /** Standing (k, cnt) weighted-mass table. `cnt` is the summed
    * weight — named to feed `giniFrom`'s mass contract directly. */
  final class MassTable(s: SparkSession) extends StandingTable(s) {
    protected def emptyState: DataFrame = {
      import s.implicits._
      Seq.empty[(String, Long)].toDF("k", "cnt")
    }
    protected def stateColumns: Seq[String] = Seq("k", "cnt")
    protected def foldInto(state: DataFrame, batch: DataFrame): DataFrame =
      state.unionByName(
          batch.groupBy(col("k")).agg(sum(col("w")).cast("long").as("cnt")))
        .groupBy(col("k")).agg(sum(col("cnt")).cast("long").as("cnt"))
    /** The standing (k, cnt) mass relation. */
    def state: DataFrame = currentState
  }

  /** Fold a document stream's (canonical host, char mass) into the
    * standing table. */
  def start(docsWithUrl: DataFrame, table: MassTable): StreamingQuery =
    docsWithUrl.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch.select(
          UrlCuration.hostOf(
            UrlCuration.canonUrl(col("url"))).as("k"),
          col("n_chars").as("w")), batchId))
      .start()

  /** The concentration readout — batch `giniFrom` verbatim over the
    * standing mass, so streamed ≡ batch bit-for-bit. */
  def gini(table: MassTable): DataFrame =
    Profiling.giniFrom(table.state)
}
