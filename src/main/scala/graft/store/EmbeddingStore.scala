package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Write-time IVF clustering — the storage layout that makes
 * inverted-file ANN scale (the claim `operators.Similarity.annIvf`
 * documents, made concrete): the corpus is materialized PARTITIONED BY
 * its coarse-quantizer cell, so probing `nProbe` lists at query time is
 * partition PRUNING at the scan — unread bytes, not filtered rows. The
 * vector-store analogue of `TradeStore`'s time clustering: the dominant
 * predicate becomes the physical layout.
 *
 * At 100 TB the flow is: fit centroids on a sample
 * (`Similarity.kmeansCentroids(fitPermille)`), one map-side assignment
 * pass (`NearestCentroid` — no shuffle beyond the partitioned write),
 * then every query reads nProbe/nCentroids of the bytes. Re-clustering
 * is a rewrite, amortized over the query load like any table layout
 * decision.
 */
object EmbeddingStore {

  /** Materialize the corpus clustered by nearest centroid. The centroid
    * table comes from the caller (fit once, reuse for probing — the ids
    * in the layout are only meaningful under the centroids that built
    * it). */
  def writeClustered(embeddings: DataFrame, path: String,
      cents: Array[Array[Double]]): Unit = {
    import graft.functions.NearestCentroid.nearest_centroid
    embeddings
      .select(col("vec_id"), col("embedding"),
        nearest_centroid(col("embedding"), cents).as("c_id"))
      .write.partitionBy("c_id").mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scan restricted to the probed cells — compiles to partition pruning
    * (assert `PartitionFilters` in the plan, not a post-scan filter). */
  def readProbed(spark: SparkSession, path: String,
      probeLists: Seq[Int]): DataFrame =
    read(spark, path).filter(col("c_id").isin(probeLists: _*))
}
