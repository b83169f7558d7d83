package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming Count-Min maintenance — heavy-hitter counting over an
 * unbounded document stream. Count-Min sketches are MERGEABLE (cell-wise
 * sum), so the streaming form needs no special machinery: each
 * micro-batch builds its own d×w cell table (one pass over the batch,
 * map-side combined) and folds it into the running table by summing
 * counts. The running state is bounded at d·w rows FOREVER — the reason
 * a sketch, not an exact groupBy, is the right shape for an unbounded
 * vocabulary. Integer counts mean the streamed sketch equals the batch
 * sketch over the same documents EXACTLY (spec-asserted), not just
 * approximately — merge order cannot perturb sums of longs.
 *
 * Same foreachBatch + driver-held-table shape as [[StreamGroups]]; at
 * scale the table is a tiny storage table and the fold is one
 * bounded-size merge per batch.
 */
object StreamCms {

  /** Running (seed, pos, cnt) table — [[StandingTable]] plumbing
    * (checkpoint-per-fold, batchId idempotence, snapshot/resume). */
  final class SketchTable(spark: SparkSession, w: Int = 16384, d: Int = 4)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Int, Long, Long)].toDF("seed", "pos", "cnt")
    protected def stateColumns: Seq[String] = Seq("seed", "pos", "cnt")
    def cells: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        documents: DataFrame): DataFrame =
      state
        .unionByName(TextAnalysis.cmsCells(documents, w, d)
          .select(col("seed").cast("int").as("seed"),
            col("pos").cast("long").as("pos"), col("cnt")))
        .groupBy("seed", "pos").agg(sum(col("cnt")).as("cnt"))
  }

  /** Stream of documents (a `text` column) → continuously-folded sketch. */
  def start(documents: DataFrame, table: SketchTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
