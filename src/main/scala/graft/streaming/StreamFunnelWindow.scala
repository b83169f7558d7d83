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
 */
object StreamFunnelWindow {

  /** Running (unconverged events, converged flags) state pair. */
  final class FunnelWindowTable(spark: SparkSession,
      windowSec: Long = 3600L) {
    import spark.implicits._
    @volatile private var keptT: DataFrame =
      Seq.empty[(Long, String, Long)].toDF("user_id", "event_type", "us")
    @volatile private var doneT: DataFrame =
      Seq.empty[Long].toDF("user_id")
    def kept: DataFrame = keptT
    def done: DataFrame = doneT
    def fold(events: DataFrame): Unit = synchronized {
      val all = keptT
        .unionByName(events
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("us"))
          // events from already-converged users are dead on arrival
          .join(doneT, Seq("user_id"), "left_anti"))
        .distinct()
      val newDone = EventsOps.funnelWindowLevels(all, windowSec)
        .filter(col("lvl") === 3).select(col("user_id"))
      doneT = doneT.union(newDone).distinct().localCheckpoint(true)
      keptT = all.join(doneT, Seq("user_id"), "left_anti")
        .localCheckpoint(true)
    }
    def funnel: DataFrame =
      EventsOps.funnelWindowRollup(
        EventsOps.funnelWindowLevels(keptT, windowSec)
          .union(doneT.select(col("user_id"), lit(3).as("lvl"))),
        windowSec)
  }

  /** Stream of (user_id, event_type, us) rows → continuously-folded
    * windowed funnel. */
  def start(events: DataFrame, table: FunnelWindowTable): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => table.fold(batch))
      .start()
}
