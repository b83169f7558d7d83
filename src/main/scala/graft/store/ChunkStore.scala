package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * Write-time FUZZY-CHUNK band index — the persisted corpus state behind
 * [[graft.operators.Dedup.chunkDedupAgainstStore]], completing the
 * against-family's store tier (`SubstrStore` exact substrings,
 * `EmbeddingStore` semantic bands, `MediaStore` perceptual hashes; this
 * one holds near-dup PARAGRAPH state). Three relations under one path:
 *
 *  - `sigs/` (cid, n_sh, band, bh) PARTITIONED BY band — a probe's band
 *    join prunes to the 16 band partitions, touching band rows, never
 *    chunk text;
 *  - `posts/` (cid, sh) — the cut shingle payloads the exact-Jaccard
 *    verify fetches for CANDIDATE cids only (an output-sized join);
 *  - `hot/` (sh) — the df-cut census, FROZEN at index build: probes and
 *    appended batches must cut identically, so appends consult this
 *    census rather than re-counting (re-censusing = full index rebuild,
 *    the `EmbeddingStore.recluster` analog).
 *
 * Corpus chunks exact-collapse to representatives at write time (the
 * `chunkReps` election) — also the bucket-skew guard: 10⁴ copies of a
 * boilerplate paragraph are ONE band unit. At-least-once feeding
 * re-appends byte-identical rows; [[compactBandIndex]] +
 * [[swapCompacted]] reclaim them (the `SubstrStore`/`EmbeddingStore`
 * maintenance contract, spec'd in `StreamChunkFuzzySpec`).
 */
object ChunkStore {

  // explicit schemas: an empty corpus writes no parquet footer to infer
  // from (the EmbeddingStore empty-store rationale)
  private val sigsSchema = StructType(Seq(
    StructField("cid", LongType),
    StructField("n_sh", LongType),
    StructField("bh", StringType),
    StructField("band", IntegerType))) // partition column, discovered last

  private val postsSchema = StructType(Seq(
    StructField("cid", LongType),
    StructField("sh", StringType)))

  private val hotSchema = StructType(Seq(StructField("sh", StringType)))

  /** Materialize the three index relations from the corpus. */
  def writeBandIndex(corpus: DataFrame, path: String, window: Int = 200,
      stride: Int = 150, bands: Int = 16, rowsPerBand: Int = 4,
      maxDf: Long = 1000): Unit = {
    val (sigs, posts, hot) = graft.operators.Dedup.chunkIndexRelations(
      corpus, window, stride, bands, rowsPerBand, maxDf)
    sigs.write.partitionBy("band").mode("overwrite").parquet(s"$path/sigs")
    posts.write.mode("overwrite").parquet(s"$path/posts")
    hot.write.mode("overwrite").parquet(s"$path/hot")
  }

  /** Append an admitted batch's representative-chunk state — cut by the
    * FROZEN hot census (probe/append consistency; see class doc). The
    * batch collapses its own exact-dup chunks; content already in the
    * corpus under another cid stays a separate row (it IS another
    * corpus chunk), while a REDELIVERED batch re-appends byte-identical
    * rows that [[compactBandIndex]] absorbs. */
  def appendBandIndex(batch: DataFrame, path: String, window: Int = 200,
      stride: Int = 150, bands: Int = 16, rowsPerBand: Int = 4): Unit = {
    val spark = batch.sparkSession
    val (sigs, posts, _) = graft.operators.Dedup.chunkIndexRelations(
      batch, window, stride, bands, rowsPerBand, maxDf = Long.MaxValue,
      frozenHot = Some(readHot(spark, path)))
    sigs.write.partitionBy("band").mode("append").parquet(s"$path/sigs")
    posts.write.mode("append").parquet(s"$path/posts")
  }

  def readSigs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(sigsSchema).parquet(s"$path/sigs")

  def readPosts(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(postsSchema).parquet(s"$path/posts")

  def readHot(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(hotSchema).parquet(s"$path/hot")

  /** COMPACTION — DISTINCT rewrite of sigs (band-partitioned, so at
    * 100 TB it runs band-by-band as `bands` independent jobs) and posts
    * to a SIBLING path; the frozen hot census copies through unchanged.
    * One [[Swap.commit]] covers all three relations — a probe never
    * sees compacted sigs against uncompacted posts. Crash taxonomy as
    * everywhere: before the swap re-run (pure function), between the
    * renames [[recoverSwap]]. */
  def compactBandIndex(spark: SparkSession, path: String,
      outPath: String): Unit = {
    readSigs(spark, path).distinct()
      .write.partitionBy("band").mode("overwrite").parquet(s"$outPath/sigs")
    readPosts(spark, path).distinct()
      .write.mode("overwrite").parquet(s"$outPath/posts")
    readHot(spark, path).distinct()
      .write.mode("overwrite").parquet(s"$outPath/hot")
  }

  /** Commit a compacted index (see [[Swap.commit]]). */
  def swapCompacted(path: String, outPath: String): Unit =
    Swap.commit(path, outPath)

  /** Crash-between-renames recovery for [[swapCompacted]]. */
  def recoverSwap(path: String): Unit = Swap.recover(path)
}
