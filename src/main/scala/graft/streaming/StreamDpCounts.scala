package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming differentially-private telemetry — the continuous form of
 * `TextAnalysis.dpCounts`: the standing state is the EXACT per-
 * (source, lang) cell count (sum-foldable per micro-batch, bounded at
 * the attribute-domain cell grid forever — the trusted curator's
 * internal table), and every readout applies the keyed PRF noise via
 * `TextAnalysis.dpCountsFrom` VERBATIM over the standing counts.
 *
 * Two properties fall out of noise-at-readout with PRF noise:
 *  - streamed ≡ batch: a readout after any batch split equals the
 *    batch release over the same documents bit-for-bit (the noise
 *    depends only on the cell key; the folded count is exact);
 *  - budget safety under repeated reads: every readout of a cell adds
 *    the SAME noise draw, so publishing the release twice (or reading
 *    mid-stream and again at the end) reveals nothing beyond one
 *    ln 2-DP release per cell snapshot — the PRF-noise argument of
 *    [[TextAnalysis.dpNoise]] made operational.
 *
 * Same foreachBatch + checkpointed-table shape as [[StreamEncodingAudit]].
 */
object StreamDpCounts {

  /** Running exact cell-count table, checkpointed per fold. */
  final class CellTable(spark: SparkSession) {
    import spark.implicits._
    @volatile private var current: DataFrame =
      Seq.empty[(String, String, Long)].toDF("source", "lang", "n")
    private var liveBlocks: Set[Int] = Set.empty
    def cells: DataFrame = current
    /** The private release off the standing counts — the batch
      * operator's noise-at-readout half. */
    def release(seed: String = "dp1"): DataFrame =
      TextAnalysis.dpCountsFrom(current, seed)
    def fold(documents: DataFrame): Unit = synchronized {
      setCheckpointed(current
        .unionByName(documents.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n")))
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n")).cast("long").as("n")))
    }

    /** Snapshot/resume pair — the [[StreamBoilerplate.CensusTable]]
      * contract: swap-committed parquet out, checkpointed relation back
      * in; fold-after-load ≡ uninterrupted (spec). The snapshot holds
      * EXACT counts — it is curator-internal state and must stay as
      * protected as the raw corpus; only [[release]] output is the
      * private artifact. */
    def save(path: String): Unit = synchronized {
      val tmp = path.stripSuffix("/") + ".next"
      graft.store.Swap.deleteRecursively(new java.io.File(tmp))
      current.write.parquet(tmp)
      // first snapshot has no live dir to retire — plain rename is the
      // commit; thereafter the two-rename swap protects every overwrite
      val live = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(live))
        graft.store.Swap.commit(path, tmp)
      else java.nio.file.Files.move(java.nio.file.Paths.get(tmp), live)
    }

    def load(path: String): Unit = synchronized {
      setCheckpointed(spark.read.parquet(path)
        .select(col("source"), col("lang"), col("n")))
    }

    private def setCheckpointed(next: DataFrame): Unit = {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      current = next.localCheckpoint(true)
      val newBlocks = (sc.getPersistentRDDs.keySet -- before).toSet
      liveBlocks.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      liveBlocks = newBlocks
    }
  }

  /** Stream of documents (source + lang columns) → continuously-folded
    * exact cell counts; read releases via [[CellTable.release]]. */
  def start(documents: DataFrame, table: CellTable): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => table.fold(batch))
      .start()
}
