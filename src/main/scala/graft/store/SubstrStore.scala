package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Write-time WINDOW-HASH CENSUS for the exact-substring dedup family
 * (Lee et al. 2022) — the persisted state that makes exact-substring
 * checking affordable at ingest time: the corpus's distinct length-L
 * token-window hashes (60-bit portable h60, the digest-as-identity
 * convention the whole dedup family carries), materialized ONCE at
 * write time and probed per batch. Ids and hashes only — never text.
 *
 * Layout: partitioned by a 64-way hash bucket (`hb = h mod 64`) so a
 * probe can prune to the buckets a batch actually touches and a
 * compaction can rewrite buckets independently; within a bucket the
 * single `h` column dictionary/RLE-encodes tightly. Maintenance is
 * append-only: admitted batches append their own window hashes
 * ([[appendWindowCensus]]) — duplicate h rows across appends are
 * harmless because every consumer probes with a semi join (set
 * semantics), and a periodic per-bucket DISTINCT rewrite compacts.
 *
 * At 100 TB the probe cost is batch-census + the hash-keyed semi join;
 * the corpus pays nothing at ingest time beyond storing its census —
 * the same asymmetric contract as `EmbeddingStore.writeBanded` and the
 * MinHash band state.
 */
object SubstrStore {

  val Buckets = 64

  // explicit schema: an EMPTY corpus writes no parquet footer to infer
  // from, and a fresh deployment's store IS empty
  private val censusSchema = StructType(Seq(
    StructField("h", LongType),
    StructField("hb", IntegerType))) // partition column, discovered last

  private def census(documents: DataFrame, minLen: Int): DataFrame =
    graft.operators.Dedup.windowCensus(documents, minLen)
      .select(col("h")).distinct()
      .withColumn("hb", pmod(col("h"), lit(Buckets)).cast("int"))

  /** Materialize the corpus's distinct window-hash census. */
  def writeWindowCensus(documents: DataFrame, path: String,
      minLen: Int = 20): Unit =
    census(documents, minLen)
      .write.partitionBy("hb").mode("overwrite").parquet(path)

  /** Append an admitted batch's window hashes — the incremental
    * maintenance step after an ingest admits content. */
  def appendWindowCensus(documents: DataFrame, path: String,
      minLen: Int = 20): Unit =
    census(documents, minLen)
      .write.partitionBy("hb").mode("append").parquet(path)

  def readWindowCensus(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(censusSchema).parquet(path)

  /** COMPACTION — the maintenance pass the append-only census needs:
    * every admitted batch appends its full window set, so h rows
    * duplicate across appends (probe-harmless — semi-join set
    * semantics — but storage and probe scan cost grow with every
    * admit, not with distinct content). Rewrite the census DISTINCT to
    * a NEW path; the live census stays readable until [[swapCompacted]]
    * (the `TradeStore.compact` swap-on-success contract — never an
    * in-place rewrite racing readers). Idempotent: compaction is a pure
    * function of the source, so a crash anywhere before the swap is
    * recovered by simply re-running (mode overwrite). The distinct is
    * one hash shuffle on (h, hb) — and because h determines hb, at
    * 100 TB the same rewrite runs bucket-by-bucket as 64 independent
    * jobs (read one hb partition, distinct, write), bounding any
    * single job at census/64. */
  def compactWindowCensus(spark: SparkSession, path: String,
      outPath: String): Unit =
    readWindowCensus(spark, path).distinct()
      .write.partitionBy("hb").mode("overwrite").parquet(outPath)

  /** Swap a compacted census into place: live → retired, compacted →
    * live, delete retired. The second rename is the commit point.
    * Crash taxonomy (spec-exercised): before the first rename — live
    * untouched; between the renames — the live name is missing but the
    * retired dir holds the complete old census and [[recoverSwap]]
    * restores it (the compacted output can then be re-swapped, or
    * recomputed — pure function); after the second rename — committed,
    * the retired copy is garbage. A probe therefore always reads either
    * the whole old census or the whole new one, never a mix. */
  def swapCompacted(path: String, outPath: String): Unit =
    Swap.commit(path, outPath)

  /** Crash-between-renames recovery: restore the retired census when
    * the live name is missing. No-op in every other state. */
  def recoverSwap(path: String): Unit = Swap.recover(path)
}
