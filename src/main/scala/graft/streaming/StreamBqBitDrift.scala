package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift

/**
 * Streaming BQ-code drift monitor — the 1-bit sibling of
 * [[StreamEmbeddingDrift]]: a FROZEN per-bit (set-count, count) table
 * (the training snapshot's code marginals) against a continuously
 * folded live table, the drift statistic re-assembled on demand via
 * the SAME [[Drift.bqBitDriftFrom]] the batch operator uses — streamed
 * ≡ batch by construction.
 *
 * Per-bit counts are SUM-mergeable, so each micro-batch folds with one
 * ≤ 64-row sum; state is 64 rows FOREVER, independent of stream
 * volume — the cheapest continuous embedding-distribution check there
 * is (a moved bit = a sign dimension whose balance moved: a rogue
 * dimension forming, an encoder swap, a normalization bug), caught
 * without touching float geometry.
 */
object StreamBqBitDrift {

  /** Running live per-bit state vs a frozen reference (both in
    * [[Drift.bqBitSums]]'s (bit, s, c) shape). */
  final class BitTable(spark: SparkSession, reference: DataFrame)
      extends StandingTable(spark) {
    import spark.implicits._
    private val ref = reference.select(col("bit"),
      col("s").cast("long").as("s"), col("c").cast("long").as("c"))
      .localCheckpoint(true)
    protected def emptyState: DataFrame =
      Seq.empty[(Int, Long, Long)].toDF("bit", "s", "c")
    protected def stateColumns: Seq[String] = Seq("bit", "s", "c")
    /** The folded live state — ≤ 64 rows. */
    def liveSums: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        embeddings: DataFrame): DataFrame =
      state
        .unionByName(Drift.bqBitSums(embeddings))
        .groupBy(col("bit"))
        .agg(sum(col("s")).cast("long").as("s"),
          sum(col("c")).cast("long").as("c"))
    /** Per-bit drift of live vs reference — batch
      * [[Drift.bqBitDriftFrom]] verbatim. */
    def stat: DataFrame = {
      val joined = ref.select(col("bit"),
          col("s").as("s0"), col("c").as("c0"))
        .join(currentState.select(col("bit"),
          col("s").as("s1"), col("c").as("c1")),
          Seq("bit"), "full_outer")
        .select(col("bit"),
          coalesce(col("s0"), lit(0L)).as("s0"),
          coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("s1"), lit(0L)).as("s1"),
          coalesce(col("c1"), lit(0L)).as("c1"))
      Drift.bqBitDriftFrom(joined)
    }
  }

  /** Stream of (vec_id, embedding, label) rows → continuously-folded
    * per-bit code state. */
  def start(embeddings: DataFrame, table: BitTable): StreamingQuery =
    embeddings.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
