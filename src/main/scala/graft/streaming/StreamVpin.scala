package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming volume-clock bucket assignment — the incremental form of
 * [[graft.operators.MarketStats.vpinBuckets]]: each trade is tick-rule
 * signed (upticks buy, downticks sell, zero-ticks inherit; an
 * instrument's first-ever tick is neutral) and assigned to an
 * equal-volume bucket by its EXCLUSIVE cumulative-volume prefix
 * (bucket = cumPrev div V — the volume clock). The batch operator
 * expresses both recursions as running windows; a live feed can't
 * re-window history, so the carry IS the keyed state:
 * (last price, carried sign, cumulative volume) per instrument — O(1),
 * shard-by-instrument, constant at any feed rate.
 *
 * A bucket closes only when the volume clock passes its edge, so the
 * per-(instrument, bucket) imbalance aggregate downstream is an
 * ordinary streaming sum over these emitted rows (update mode; or
 * compacted at read like the store tables). Streamed assignments ≡ the
 * batch window formulation by construction — same sign recursion, same
 * exclusive prefix — asserted across micro-batch boundaries in
 * `StreamVpinSpec`, including a bucket that STRADDLES two batches.
 *
 * Memory bound: like [[StreamOrderFlow]], each (instrument, batch)
 * group is buffered and sorted to impose the deterministic (ts_us,
 * event_id) order — per-batch cost is the hottest instrument's rows in
 * one trigger interval, never the stream's history. Size triggers so a
 * hot key's per-interval volume fits an executor.
 */
object StreamVpin {

  /** Same tick shape as [[StreamOrderFlow.Tick]]. */
  case class Tick(event_type: String, event_id: Long, ts_us: Long,
      cents: Long, size: Long)

  case class BucketedTick(event_type: String, event_id: Long,
      bucket: Long, sign: Int, size: Long)

  /** Carried per-instrument state: last price + inherited sign +
    * volume-clock position. */
  case class VpinState(lastCents: Long, lastSign: Int, cumVol: Long)

  private def classify(bucketVol: Long)(
      key: String,
      ticks: Iterator[Tick],
      state: GroupState[VpinState]): Iterator[BucketedTick] = {
    var st = state.getOption.orNull
    // deterministic order regardless of shuffle arrival order
    val ordered = ticks.toSeq.sortBy(t => (t.ts_us, t.event_id))
    val out = ordered.map { t =>
      val sign =
        if (st == null) 0
        else if (t.cents > st.lastCents) 1
        else if (t.cents < st.lastCents) -1
        else st.lastSign
      val cumPrev = if (st == null) 0L else st.cumVol
      st = VpinState(t.cents, sign, cumPrev + t.size)
      BucketedTick(t.event_type, t.event_id, cumPrev / bucketVol, sign,
        t.size)
    }
    state.update(st)
    out.iterator
  }

  /** Apply over a (streaming or batch) Dataset of ticks. */
  def apply(ticks: Dataset[Tick],
      bucketVol: Long = 2000L): Dataset[BucketedTick] = {
    val spark: SparkSession = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        classify(bucketVol))
  }
}
