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
    * / `EmbeddingStore.appendBanded` contract; duplicate media_id rows
    * under redelivery duplicate flagged pairs — feed exactly-once or
    * compact with a per-chunk DISTINCT rewrite + `Swap.commit`). */
  def appendPhashIndex(documents: DataFrame, path: String): Unit =
    indexRows(documents)
      .write.partitionBy("chunk").mode("append").parquet(path)

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
