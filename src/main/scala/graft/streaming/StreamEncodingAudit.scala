package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming encoding/mojibake monitoring — the continuous form of
 * `TextAnalysis.encodingAudit`: every artifact counter (and the
 * flagged-doc count — the flag is a per-doc decision, independent of
 * other docs) is a per-doc sum, so the per-source census is
 * sum-mergeable and the streaming form needs no special machinery:
 * each micro-batch runs the BATCH operator on its own rows and folds
 * the result into the running census by summing. State is bounded at
 * |sources| rows forever; integer counts mean streamed ≡ batch over
 * the same documents EXACTLY (spec-asserted), under any batch split.
 *
 * The live read an ingest pipeline keeps per feed: a source whose
 * mojibake/replacement counters start climbing mid-crawl is flagged
 * batches — not a full-corpus audit — after the damage starts.
 * Same foreachBatch + driver-held-table shape as [[StreamCms]].
 */
object StreamEncodingAudit {

  private val Counters = Seq("n_docs", "n_non_ascii", "n_mojibake_lead",
    "n_replacement", "n_c1_controls", "n_c0_controls", "n_punct_runs",
    "n_flagged_docs")

  /** Running per-source census, checkpointed per fold. */
  final class CensusTable(spark: SparkSession) {
    import spark.implicits._
    @volatile private var current: DataFrame =
      Seq.empty[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
        .toDF(("source" +: Counters): _*)
    private var liveBlocks: Set[Int] = Set.empty
    def census: DataFrame = current
    def fold(documents: DataFrame): Unit = synchronized {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val aggs = Counters.map(c => sum(col(c)).cast("long").as(c))
      current = current
        .unionByName(TextAnalysis.encodingAudit(documents))
        .groupBy(col("source"))
        .agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(true)
      // release the superseded census blocks — the new (eager)
      // checkpoint no longer references them; state stays one table
      val newBlocks = (sc.getPersistentRDDs.keySet -- before).toSet
      liveBlocks.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      liveBlocks = newBlocks
    }
  }

  /** Stream of documents (text + source columns) → continuously-folded
    * per-source artifact census. */
  def start(documents: DataFrame, table: CensusTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => table.fold(batch))
      .start()
}
