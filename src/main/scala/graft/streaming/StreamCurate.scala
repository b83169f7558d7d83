package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/**
 * Streaming curation — the continuous form of the batch curation chain
 * (TextAnalysis.curate → Sampling.sourceQuota): score documents as they
 * arrive, drop the ones a training run would drop, and cap each source's
 * admitted volume with keyed state.
 *
 * Two layers, deliberately separable:
 *  - [[qualityFilter]] is STATELESS — a per-row projection + predicate
 *    (the exact expressions the batch path uses, so streamed and batch
 *    decisions agree bit-for-bit). Scan-speed, any output mode, no state.
 *  - [[sourceQuota]] is the stateful layer: per-source admitted-count in
 *    `GroupState[Long]`, admitting in (batch, doc_id) arrival order until
 *    the cap. State is ONE long per source — sources number in the
 *    hundreds (same driver-sized contract as temperatureMix), so state
 *    never grows with the corpus; there is no watermark to manage because
 *    the state is a counter, not a buffer.
 *
 * Exact streaming dedup composes in front via [[StreamDedup]]; the batch
 * `curate` additionally collapses duplicate text before scoring, which a
 * stream expresses as dedup-then-filter rather than a digest aggregate.
 *
 * Scale: the only shuffle is groupByKey(source); a mega-source skews it,
 * and the production mitigation mirrors the batch one — pre-filter
 * map-side once a source's public admitted count has reached its cap
 * (a broadcast of closed sources), so the stateful operator only sees
 * candidates from still-open sources.
 */
object StreamCurate {

  /** Input row for the quota layer (top-level for encoder derivation). */
  case class Scored(doc_id: Long, source: String, quality: Double)
  /** Admitted row: rank_in_source is 1-based admission order. */
  case class Admitted(doc_id: Long, source: String, quality: Double,
      rank_in_source: Long)

  /** Keep documents in `lang` with quality ≥ `minQuality` — per-row, no
    * state, no sort; emits (doc_id, source, quality). */
  def qualityFilter(documents: DataFrame, lang: String = "en",
      minQuality: Double = 0.7): DataFrame =
    TextAnalysis.scoredRows(documents, keep = Seq("source"))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
      .select(col("doc_id"), col("source"), col("quality"))

  /** Admit at most `quota` documents per source over the whole stream.
    * Within one micro-batch a group's rows are admitted in doc_id order
    * (deterministic under Spark's unordered group iterator); across
    * batches, admission order is arrival order. Rows after the cap are
    * dropped forever — the counter never decreases.
    *
    * Per-batch memory is O(room) ≤ O(quota), NOT O(group batch size): an
    * exhausted source short-circuits without draining its iterator, and an
    * open one selects its `room` smallest doc_ids through a bounded
    * max-heap instead of materializing + sorting the whole micro-batch —
    * a hot source's batch volume never buffers. (State itself stays one
    * long per source.) */
  def sourceQuota(scored: Dataset[Scored], quota: Int): Dataset[Admitted] = {
    import scored.sparkSession.implicits._
    scored
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[Scored], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = ((quota - admitted).max(0L)).min(Int.MaxValue).toInt
          if (room == 0) Iterator.empty
          else {
            val heap = scala.collection.mutable.PriorityQueue.empty[Scored](
              Ordering.by(_.doc_id)) // max-heap: evict the largest doc_id
            rows.foreach { r =>
              if (heap.size < room) heap.enqueue(r)
              else if (r.doc_id < heap.head.doc_id) {
                heap.dequeue(); heap.enqueue(r)
              }
            }
            val take = heap.dequeueAll.reverse // ascending doc_id
            if (take.nonEmpty) state.update(admitted + take.size)
            take.iterator.zipWithIndex.map { case (d, i) =>
              Admitted(d.doc_id, source, d.quality, admitted + i + 1)
            }
          }
      }
  }

  /** The composed continuous pipeline: score → filter → per-source cap. */
  def curateStream(documents: DataFrame, lang: String = "en",
      minQuality: Double = 0.7, quota: Int = 50): Dataset[Admitted] = {
    import documents.sparkSession.implicits._
    sourceQuota(qualityFilter(documents, lang, minQuality).as[Scored], quota)
  }
}
