package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming weighted priority-sample maintenance — keep a running
 * weighted sample of an unbounded document stream, converging to
 * EXACTLY the batch [[graft.operators.Sampling.prioritySample]] over the
 * same rows (spec-asserted under shuffled, multi-batch arrival).
 *
 * Priorities (h60 div weight — integer, content-derived, see the batch
 * operator) are a pure function of the ROW, not of arrival: the k
 * smallest of a union is the k smallest of per-batch k-smallest sets,
 * so bottom-k-by-priority state is MERGEABLE the same way the KMV
 * bottom-k sketch is. Each micro-batch computes its rows' priorities,
 * unions into the running table, re-truncates to k — state is bounded
 * at k rows FOREVER, arrival order cannot perturb the result, and
 * at-least-once replay is absorbed by the distinct (same row ⇒ same
 * priority ⇒ dedupes).
 *
 * Same foreachBatch + driver-held-table shape as [[StreamKmv]].
 */
object StreamPrioritySample {

  /** Running bottom-k (priority, doc) table, re-truncated per fold. */
  final class SampleTable(spark: SparkSession, k: Int = 100,
      weightCol: String = "n_chars") extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, String, Long, Long)]
        .toDF("doc_id", "source", weightCol, "priority")
    protected def stateColumns: Seq[String] =
      Seq("doc_id", "source", weightCol, "priority")
    def sample: DataFrame = currentState
    protected def foldInto(state: DataFrame, docs: DataFrame): DataFrame = {
      import graft.functions.PortableHash.h60
      val scored = docs
        .filter(col(weightCol) > 0)
        .withColumn("__h", h60(col("doc_id").cast("string")))
        .withColumn("priority", expr(s"__h div $weightCol"))
        .select(col("doc_id"), col("source"), col(weightCol), col("priority"))
      state
        .unionByName(scored)
        .distinct()
        .orderBy(col("priority"), col("doc_id"))
        .limit(k)
    }
  }

  /** Stream of documents (doc_id, source, weight) → running sample. */
  def start(docs: DataFrame, table: SampleTable): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
