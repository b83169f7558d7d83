package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EventsOps

/**
 * Streaming WINDOWED-funnel maintenance — the continuously-folded form of
 * [[EventsOps.funnelWindow]] (ClickHouse-windowFunnel semantics), EXACTLY
 * convergent to the batch operator under arbitrary arrival order
 * (spec-asserted on reverse-time waves).
 *
 * The pruning argument differs from [[StreamFunnel]]'s pre-conversion
 * prefix: a windowed chain may open at ANY view, so a late view can
 * retro-qualify ANY already-seen click/purchase and nothing inside an
 * unconverged user's history is ever provably dead (no watermark on the
 * store path — the ST3 convention). What IS provably dead is a CONVERGED
 * user: per-user level is MONOTONE (new events only add candidate chains,
 * never remove one), so once a user reaches level 3 the answer is frozen —
 * the fold collapses that user's whole event set to one flag row and
 * drops every later event on arrival. On a converting corpus the state is
 * dominated by flags, not history.
 *
 * Readout unions the unconverged users' levels (the SAME
 * [[EventsOps.funnelWindowLevels]] the batch rollup uses) with the
 * level-3 flags — streamed ≡ batch by construction, not by a parallel
 * reimplementation. Same foreachBatch + driver-held-table shape as
 * [[StreamFunnel]] / [[StreamKmv]].
 *
 * OPT-IN BOUNDED STATE (`latenessUs = Some(L)`): the default table
 * matches the store path's no-watermark ST3 convention, so unconverged
 * history grows with the stream. Under a lateness contract — every
 * arrival's event time ≥ max-seen − L, the same promise a Spark
 * watermark encodes — a horizon bound is EXACT: an event older than
 * cutoff = hwm − L − windowSec can never share a chain with a future
 * arrival (any chain covering both needs an anchor within windowSec of
 * the old event AND a future event time ≥ hwm − L — empty interval), so
 * each fold freezes the per-user level achieved over the full history
 * (level is monotone in the event set) and prunes events below the
 * cutoff. State then tracks the arrival horizon, not stream history:
 * per-user one frozen-level row + events within windowSec + L of the
 * high-water mark. Readout takes max(frozen, live-over-retained) —
 * exactly the full-history level within the contract (spec-asserted
 * streamed ≡ batch under horizon-respecting waves).
 */
object StreamFunnelWindow {

  /** Running (unconverged events, converged flags[, frozen levels])
    * state. */
  final class FunnelWindowTable(spark: SparkSession,
      windowSec: Long = 3600L, latenessUs: Option[Long] = None) {
    import spark.implicits._
    @volatile private var keptT: DataFrame =
      Seq.empty[(Long, String, Long)].toDF("user_id", "event_type", "us")
    @volatile private var doneT: DataFrame =
      Seq.empty[Long].toDF("user_id")
    @volatile private var frozenT: DataFrame =
      Seq.empty[(Long, Int)].toDF("user_id", "lvl")
    @volatile private var hwmUs: Long = Long.MinValue
    @volatile private var lastFoldedBatch: Long = -1L
    def kept: DataFrame = keptT
    def done: DataFrame = doneT
    def frozen: DataFrame = frozenT
    /** Positionless fold — always applies (ad-hoc/batch use). */
    def fold(events: DataFrame): Unit = fold(events, -1L)
    /** Fold one micro-batch, idempotent per batchId (the StandingTable
      * crash-replay guard carried by hand — three coupled relations +
      * a watermark don't fit the single-table base). */
    def fold(events: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId >= 0 && batchId <= lastFoldedBatch) return
      foldOnce(events)
      if (batchId >= 0) lastFoldedBatch = batchId
    }
    private def foldOnce(events: DataFrame): Unit = {
      val incoming = events
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), col("us"))
        // events from already-converged users are dead on arrival
        .join(doneT, Seq("user_id"), "left_anti")
      val all = keptT.unionByName(incoming).distinct()
      val lvls = EventsOps.funnelWindowLevels(all, windowSec)
      val newDone = lvls.filter(col("lvl") === 3).select(col("user_id"))
      doneT = doneT.union(newDone).distinct().localCheckpoint(true)
      val live = all.join(doneT, Seq("user_id"), "left_anti")
      keptT = (latenessUs match {
        case None => live
        case Some(l) =>
          // one driver-sized max per batch advances the high-water mark
          val mx = incoming.agg(max(col("us"))).collect()(0)
          if (!mx.isNullAt(0))
            hwmUs = math.max(hwmUs, mx.getLong(0))
          frozenT = frozenT
            .unionByName(lvls.filter(col("lvl") < 3)
              .select(col("user_id"), col("lvl").cast("int").as("lvl")))
            .groupBy(col("user_id"))
            .agg(max(col("lvl")).as("lvl"))
            .join(doneT, Seq("user_id"), "left_anti")
            .localCheckpoint(true)
          live.filter(
            col("us") >= hwmUs - l - windowSec * 1000000L)
      }).localCheckpoint(true)
    }
    def funnel: DataFrame = {
      val unconverged = latenessUs match {
        case None => EventsOps.funnelWindowLevels(keptT, windowSec)
        case Some(_) => frozenT
          .unionByName(EventsOps.funnelWindowLevels(keptT, windowSec)
            .select(col("user_id"), col("lvl").cast("int").as("lvl")))
          .groupBy(col("user_id")).agg(max(col("lvl")).as("lvl"))
      }
      EventsOps.funnelWindowRollup(
        unconverged
          .union(doneT.select(col("user_id"), lit(3).as("lvl"))),
        windowSec)
    }
  }

  /** Stream of (user_id, event_type, us) rows → continuously-folded
    * windowed funnel. */
  def start(events: DataFrame, table: FunnelWindowTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
