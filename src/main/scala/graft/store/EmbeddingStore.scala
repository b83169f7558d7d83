package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Persist the banded hyperplane-LSH index for the semantic-dedup
    * family — the signature table computed ONCE per vector at ingest
    * (`sigs/`: vec_id, band, bv — 3 small integers per band, clustered
    * by band) plus the vector payloads with their precomputed norms
    * (`vecs/`: vec_id, embedding, nrm). Cross-corpus checks
    * ([[graft.operators.Similarity.semanticDedupAgainstStore]]) then
    * probe `sigs` with a new batch's bands and verify candidates
    * against `vecs` — the corpus's signature cost is never paid at
    * query time, mirroring the MinHash side's write-time band state. */
  def writeBanded(embeddings: DataFrame, path: String, bands: Int = 16,
      bitsPerBand: Int = 4): Unit = {
    import graft.functions.VectorOps.dot
    val bt = graft.operators.Similarity.bandTable(embeddings, bands, bitsPerBand)
    bt.select(col("vec_id"), col("band"), col("bv"))
      .write.partitionBy("band").mode("overwrite").parquet(s"$path/sigs")
    embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .write.mode("overwrite").parquet(s"$path/vecs")
  }

  // explicit schemas: an EMPTY corpus writes no parquet footer to infer
  // from (only _SUCCESS), and a fresh deployment's store IS empty —
  // schema inference would throw UNABLE_TO_INFER_SCHEMA exactly there
  private val sigsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("bv", LongType),
    StructField("band", IntegerType))) // partition column, discovered last

  private val vecsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType)))

  def readBandedSigs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(sigsSchema).parquet(s"$path/sigs")

  def readBandedVecs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(vecsSchema).parquet(s"$path/vecs")
}
