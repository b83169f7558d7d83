package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming IVF-index ingest — the continuous form of
 * `store.EmbeddingStore.writeClustered`: as embedding batches arrive,
 * each vector is assigned its coarse-quantizer cell MAP-SIDE (the
 * codegen'd [[graft.functions.NearestCentroid]] projection against the
 * FROZEN centroid table) and appended to the cell-partitioned layout,
 * so the serving path's partition pruning keeps holding as the corpus
 * grows. This closes the ANN write path: `ann_ivf_topk` /
 * `ann_ivf_pq_topk` read write-time state; this is the operator that
 * maintains that state under ingest.
 *
 * Statelessness is the design point (the [[StreamSemanticCheck]] /
 * [[StreamDsir]] contract): the centroids are write-time state fixed at
 * fit time — the cell ids in the layout are only meaningful under the
 * centroids that built them — so the stream carries NO Spark state
 * beyond source offsets. Per-batch cost is one map-side projection +
 * one partitioned append ∝ batch, never the corpus.
 *
 * Delivery: appends are at-least-once under replay (a re-run batch
 * re-appends its files — vec_id duplicates, the `latest_events`
 * compaction contract cleans at read or rewrite). Exactly-once needs
 * the foreachBatch-txn pattern (batchId-named output, the
 * `TradeStore` swap-on-success move) — out of scope here, documented
 * rather than faked.
 *
 * Cell-size accounting rides the same fold: per batch the assignment
 * counts are emitted to `sink` (c_id, n) — sum-mergeable, so a
 * monitor accumulates exact per-cell cardinalities under any arrival
 * order. That statistic is what triggers a re-cluster (cells drifting
 * far from balance degrade probe selectivity), exactly like a table
 * layout's compaction trigger: fold the counts into a census, measure
 * `EmbeddingStore.cellSkewMicro`, and when it crosses threshold run
 * `EmbeddingStore.recluster` + `swapReclustered` — the executor half
 * of the loop (IvfReclusterSpec drives trigger → refit → swap
 * end-to-end and asserts margins/balance improve, recall holds).
 *
 * At 100 TB: the append is nCells-way partitioned parquet (small-file
 * pressure is the known cost of frequent micro-batches — compaction
 * per cell is embarrassingly parallel and deterministic, per
 * `TradeStore.compact`); the assignment never shuffles.
 */
object StreamIvfIngest {

  /** Assign-and-append each micro-batch to the clustered store at
    * `path`; per-batch cell counts go to `sink`. */
  def start(newVecs: DataFrame, path: String,
      cents: Array[Array[Double]],
      sink: (DataFrame, Long) => Unit = (_, _) => (),
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = newVecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned = assign(batch, cents)
        assigned.write.partitionBy("c_id").mode("append").parquet(path)
        sink(assigned.groupBy(col("c_id")).agg(count(lit(1)).as("n")),
          batchId)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }

  /** One batch's assignment — the exact projection
    * [[graft.store.EmbeddingStore.writeClustered]] runs, kept
    * separable so specs and batch backfills share the code path
    * (streamed ≡ batch by construction). */
  def assign(batch: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    batch.select(col("vec_id"), col("embedding"),
      nearest_centroid(col("embedding"), cents).as("c_id"))
  }
}
