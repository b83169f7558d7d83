package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Write-time perceptual-hash index for the media corpus — the banded
 * fingerprint table [[graft.operators.Multimodal.mediaPhashDups]]
 * computes inline, PERSISTED so cross-corpus ingest checks probe state
 * instead of recomputing the corpus (the `EmbeddingStore.writeBanded` /
 * MinHash band-state contract, extended to the media column).
 *
 * Layout: (media_id, phash, chunk, cv) clustered by `chunk` — a probe
 * brings its own four (chunk, cv) keys, so the scan prunes to the four
 * chunk partitions and the equi-join touches band rows, never payloads.
 * Admitted media append their own band rows via [[appendPhashIndex]]
 * (`StreamMediaCheck.startAdmitting` wires the loop), exactly like the
 * embedding and substring sides.
 */
object MediaStore {

  private def indexRows(documents: DataFrame): DataFrame = {
    import graft.operators.Multimodal
    val ph = Multimodal.perceptualHash(Multimodal.mediaTable(documents))
      .toDF()
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("phash"), c * 15).bitwiseAND(0x7FFFL).as("cv"))
    }
    ph.select(col("media_id"), col("phash"),
      explode(array(chunks: _*)).as("bk"))
      .select(col("media_id"), col("phash"), col("bk.cv").as("cv"),
        col("bk.chunk").as("chunk"))
  }

  def writePhashIndex(documents: DataFrame, path: String): Unit =
    indexRows(documents)
      .write.partitionBy("chunk").mode("overwrite").parquet(path)

  /** Append an admitted batch's band rows — the incremental maintenance
    * step after an ingest admits media (`SubstrStore.appendWindowCensus`
    * / `EmbeddingStore.appendBanded` contract; redelivered appends
    * duplicate index rows — the probe's trailing DISTINCT keeps its
    * OUTPUT stable, but storage and probe scan cost grow with every
    * admit: feed exactly-once or compact via [[compactPhashIndex]] +
    * [[swapCompacted]], wired into the admission loop by
    * `StreamMediaCheck.startAdmitting(compactEvery)`). */
  def appendPhashIndex(documents: DataFrame, path: String): Unit =
    indexRows(documents)
      .write.partitionBy("chunk").mode("append").parquet(path)

  /** COMPACTION — per-chunk DISTINCT rewrite of the band index to a
    * SIBLING path (the `SubstrStore.compactWindowCensus` contract:
    * chunk determines the partition, so at 100 TB the rewrite runs
    * chunk-by-chunk as 4 independent jobs, each bounded at index/4).
    * The live index stays readable until [[swapCompacted]]; a crash
    * before the swap re-runs (pure function of the live index),
    * between the renames recovers via [[recoverSwap]]. Probe
    * invariance, duplicate absorption and crash recovery are
    * spec-asserted (`BandedCompactSpec`). */
  def compactPhashIndex(spark: SparkSession, path: String,
      outPath: String): Unit =
    readPhashIndex(spark, path).distinct()
      .write.partitionBy("chunk").mode("overwrite").parquet(outPath)

  /** Commit a compacted index (see [[Swap.commit]]). */
  def swapCompacted(path: String, outPath: String): Unit =
    Swap.commit(path, outPath)

  /** Crash-between-renames recovery for [[swapCompacted]]. */
  def recoverSwap(path: String): Unit = Swap.recover(path)

  // explicit schema: an empty corpus writes only _SUCCESS (the
  // EmbeddingStore rationale — a fresh deployment's store IS empty)
  private val indexSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("phash", LongType),
    StructField("cv", LongType),
    StructField("chunk", IntegerType)))

  def readPhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(indexSchema).parquet(path)
}
