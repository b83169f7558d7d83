package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.TextAnalysis

/**
 * Streaming DSIR scoring — how importance resampling actually deploys:
 * the log-ratio table is TRAINED offline on a corpus snapshot
 * (`TextAnalysis.dsirLogRatios`, persisted once), and incoming documents
 * are WEIGHTED at ingest so downstream admission can sample toward the
 * target domain before anything lands in the corpus.
 *
 * Stateless by the same argument as [[StreamSemanticCheck]]: the model
 * half lives entirely in the persisted `nBuckets`-row table (re-read and
 * broadcast per batch, so a retrained table is picked up on the next
 * batch with no restart), the stream checkpoints nothing but offsets,
 * and per-batch cost is one tokenize + a broadcast join — proportional
 * to the batch, independent of corpus size. The per-batch transform is
 * the batch scorer verbatim (`dsirScore`), so streamed weights equal
 * batch weights bit-for-bit (exact integer micros; spec-asserted).
 */
object StreamDsir {

  val lrSchema: StructType = StructType(Seq(
    StructField("bk", LongType), StructField("lr_micro", LongType)))

  /** Persist a trained log-ratio table (write-time state, like the IVF
    * centroids or the band index). */
  def writeLogRatios(lr: DataFrame, path: String): Unit =
    lr.write.mode("overwrite").parquet(path)

  /** Score incoming documents against the persisted table; deliver
    * (doc_id, n_bigrams, logratio_micro) per batch via `sink`. */
  def start(documents: DataFrame, lrPath: String,
      sink: (DataFrame, Long) => Unit, nBuckets: Int = 4096,
      checkpoint: Option[String] = None): StreamingQuery = {
    val spark = documents.sparkSession
    val writer = documents.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(score(spark, batch, lrPath, nBuckets), batchId)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }

  /** One batch's scoring — the batch code path over the stored table
    * (explicit schema: an empty store must read as zero rows, not fail
    * inference). */
  def score(spark: SparkSession, batch: DataFrame, lrPath: String,
      nBuckets: Int = 4096): DataFrame =
    TextAnalysis.dsirScore(batch,
      spark.read.schema(lrSchema).parquet(lrPath), nBuckets)
}
