package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming cluster-stratified diversity sample — the continuously-
 * maintained form of [[graft.operators.Similarity.diversitySample]]:
 * keep, per write-time IVF cell, the `quota` vectors with the smallest
 * h60 priorities seen so far, converging to EXACTLY the batch operator
 * over the same rows (spec-asserted under shuffled, multi-batch
 * arrival AND redelivery).
 *
 * Priorities are a pure function of the vec_id, and per-cell bottom-k
 * by priority is min-union MERGEABLE exactly like the flat
 * [[StreamPrioritySample]] (the k smallest of a union is the k
 * smallest of per-batch k-smallest sets, per cell) — so arrival order
 * and batch slicing cannot perturb the result, at-least-once replay is
 * absorbed by the distinct (same row ⇒ same priority), and state is
 * bounded at cells·quota rows FOREVER. Centroids are FROZEN (the
 * [[StreamIvfIngest]] contract: the quantizer is write-time state; a
 * re-cluster is a new table).
 *
 * Per fold, the BATCH side is cut to ≤ quota rows per cell by the
 * bounded-heap TopKRows aggregate before touching the state table, so
 * the only window sort runs over the ≤ 2·cells·quota merged relation —
 * never the stream.
 */
object StreamDiversitySample {

  /** Running per-cell bottom-quota (c_id, vec_id, pr) table. */
  final class DiversityTable(spark: SparkSession,
      centroids: Array[Array[Double]], quota: Int = 10)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Int, Long, Long)].toDF("c_id", "vec_id", "pr")
    protected def stateColumns: Seq[String] = Seq("c_id", "vec_id", "pr")
    def state: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        embeddings: DataFrame): DataFrame = {
      import graft.functions.NearestCentroid.nearest_centroid
      import graft.functions.PortableHash.h60
      import graft.functions.TopKRows.topk_rows
      val batchCut = embeddings
        .select(col("vec_id"),
          nearest_centroid(col("embedding"), centroids).as("c_id"),
          h60(col("vec_id").cast("string")).as("pr"))
        .groupBy(col("c_id"))
        .agg(topk_rows(-col("pr"), col("vec_id"), quota).as("top"))
        .select(col("c_id"), explode(col("top")).as("e"))
        .select(col("c_id"), col("e.id").as("vec_id"),
          (-col("e.score")).as("pr"))
      val w = Window.partitionBy(col("c_id"))
        .orderBy(col("pr"), col("vec_id"))
      state
        .unionByName(batchCut)
        .distinct()
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= quota)
        .drop("r")
    }
    /** Ranked view matching the batch operator's output shape. */
    def sample: DataFrame = {
      val w = Window.partitionBy(col("c_id"))
        .orderBy(col("pr"), col("vec_id"))
      currentState
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("c_id"), col("rank"), col("vec_id"), col("pr"))
        .orderBy(col("c_id"), col("rank"))
    }
  }

  /** Stream of (vec_id, embedding) rows → running stratified sample. */
  def start(embeddings: DataFrame, table: DiversityTable): StreamingQuery =
    embeddings.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
