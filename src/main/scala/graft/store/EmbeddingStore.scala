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
    * (`vecs/`: vec_id, embedding, nrm; reclaimed by [[compactBanded]]
    * under at-least-once feeding). Cross-corpus checks
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

  /** Append an admitted batch's signatures + payloads — the incremental
    * maintenance step after an ingest admits vectors, the banded-index
    * twin of `SubstrStore.appendWindowCensus`. At-least-once feeding:
    * a redelivered batch re-appends its rows, and duplicate vec_id rows
    * duplicate the probe's flagged pairs (the vecs join is row-level) —
    * feed exactly-once (the TradeStore batch_id pattern) or compact via
    * [[compactBanded]] + [[swapBanded]] (wired into the admission loop
    * by `StreamSemanticCheck.startAdmitting(compactEvery)`). */
  def appendBanded(embeddings: DataFrame, path: String, bands: Int = 16,
      bitsPerBand: Int = 4): Unit = {
    import graft.functions.VectorOps.dot
    val bt = graft.operators.Similarity.bandTable(embeddings, bands, bitsPerBand)
    bt.select(col("vec_id"), col("band"), col("bv"))
      .write.partitionBy("band").mode("append").parquet(s"$path/sigs")
    embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .write.mode("append").parquet(s"$path/vecs")
  }

  def readBandedSigs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(sigsSchema).parquet(s"$path/sigs")

  def readBandedVecs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(vecsSchema).parquet(s"$path/vecs")

  /** COMPACTION — the maintenance pass the append-only banded index
    * needs (the `SubstrStore.compactWindowCensus` contract, one layer
    * up): at-least-once feeding re-appends a redelivered batch's rows,
    * duplicate vec_id payload rows DUPLICATE the probe's flagged pairs
    * (the vecs join is row-level), and the index grows with every
    * admit instead of with distinct content. The rewrite restores
    * exactly-once state to a SIBLING path:
    *
    *  - `sigs` DISTINCT — band determines the partition, so at 100 TB
    *    the same rewrite runs band-by-band as `bands` independent jobs
    *    (read one band partition, distinct, write), each bounded at
    *    index/bands;
    *  - `vecs` elected to ONE row per vec_id via min(struct) — the
    *    house deterministic election; under the redelivery contract
    *    (byte-identical re-appends) the election is the identity.
    *
    * The live index stays readable until [[swapBanded]] (the
    * `Swap.commit` two-rename point, covering BOTH halves in one
    * directory swap — a probe never sees compacted sigs against
    * uncompacted vecs). Crash taxonomy: before the swap — re-run (pure
    * function of the live index); between the renames —
    * [[recoverBanded]]. Probe-invariance, duplicate absorption and
    * crash recovery are spec-asserted (`BandedCompactSpec`). */
  def compactBanded(spark: SparkSession, path: String,
      outPath: String): Unit = {
    readBandedSigs(spark, path).distinct()
      .write.partitionBy("band").mode("overwrite")
      .parquet(s"$outPath/sigs")
    readBandedVecs(spark, path)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("embedding"), col("nrm"))).as("w"))
      .select(col("vec_id"), col("w.embedding").as("embedding"),
        col("w.nrm").as("nrm"))
      .write.mode("overwrite").parquet(s"$outPath/vecs")
  }

  /** Commit a compacted banded index (see [[Swap.commit]]). */
  def swapBanded(path: String, outPath: String): Unit =
    Swap.commit(path, outPath)

  /** Crash-between-renames recovery for [[swapBanded]]. */
  def recoverBanded(path: String): Unit = Swap.recover(path)

  /** RE-CLUSTER executor — the action half of the maintenance loop
    * `streaming.StreamIvfIngest`'s cell-size census only TRIGGERS: when
    * continuous ingest under a frozen coarse quantizer drifts the cells
    * far from balance (probe selectivity degrades — a hot cell makes
    * every probe of it scan a growing fraction of the corpus), refit
    * the quantizer from the CURRENT store contents and rewrite the
    * cell-partitioned layout under the new centroids to a NEW path.
    * The live layout stays readable until [[swapReclustered]] (the
    * `Swap.commit` contract); a crash before the swap is recovered by
    * re-running (pure function of the store).
    *
    * Returns the new centroid table: cell ids in a layout are only
    * meaningful under the centroids that built them, so the caller
    * must repoint layout and centroids TOGETHER (and then refresh any
    * write-time state derived from cell ids — e.g. re-run
    * [[writeBanded]] if the band index lives beside this store; the
    * spec exercises the full loop).
    *
    * At 100 TB: the refit samples (`fitPermille`, the
    * `Similarity.kmeansCentroids` knob), the rewrite is one map-side
    * assignment pass + the partitioned write — the same cost as the
    * original `writeClustered`, amortized over the query load like any
    * layout decision; ingest continues against the old layout until
    * the swap. */
  def recluster(spark: SparkSession, path: String, outPath: String,
      nCentroids: Int = 12, iters: Int = 3,
      fitPermille: Int = 1000): Array[Array[Double]] = {
    val vecs = read(spark, path).select(col("vec_id"), col("embedding"))
    val cents = graft.operators.Similarity.kmeansCentroids(
      vecs, nCentroids, iters, fitPermille)
    writeClustered(vecs, outPath, cents)
    cents
  }

  /** Commit a re-clustered layout (see [[Swap.commit]] for the crash
    * taxonomy; [[Swap.recover]] handles the between-renames window). */
  def swapReclustered(path: String, outPath: String): Unit =
    Swap.commit(path, outPath)

  /** Cell-balance trigger metric over a cell-count census (c_id, n) —
    * the normalized max/mean cell load in micros (1_000_000 = perfectly
    * balanced). `StreamIvfIngest`'s per-batch counts are sum-mergeable
    * into exactly this census; a monitor re-clusters when the skew
    * crosses its threshold. Driver-sized input (≤ nCells rows). */
  def cellSkewMicro(census: Seq[(Int, Long)]): Long = {
    val loads = census.map(_._2)
    if (loads.isEmpty || loads.sum == 0L) return 1000000L
    // BigInt: max·10⁶·nCells overflows Long right at the hot-store
    // scale this trigger exists for (2e11-row cell × 64 cells wraps
    // negative and the re-cluster would never fire); driver-sized
    (BigInt(loads.max) * 1000000 * loads.length / BigInt(loads.sum))
      .toLong
  }
}
