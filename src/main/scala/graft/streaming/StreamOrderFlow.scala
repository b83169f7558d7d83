package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming tick-rule trade classification — the incremental form of
 * [[graft.operators.MarketStats.orderFlowImbalance]]'s sign pass: each
 * trade is signed by the direction of the last price CHANGE (upticks
 * buy, downticks sell, zero-ticks inherit the previous sign; the first
 * tick of an instrument is neutral). The batch operator expresses the
 * carry as `last_value(ignore nulls)` over a window; a live feed can't
 * re-window history, so the carry IS the keyed state: (last price,
 * carried sign) per instrument — O(1), shard-by-instrument, constant at
 * any feed rate, exactly what `flatMapGroupsWithState` is for.
 *
 * Within a micro-batch, ticks are processed in (ts_us, event_id) order —
 * the repo's deterministic tick order — so shuffle arrival order never
 * perturbs the signs. ACROSS batches the recursion consumes ticks in
 * arrival order (the reference's consumer contract, SURVEY §2.4 ST4: no
 * cross-batch reordering); a tick older than the carried state would need
 * the batch re-window to classify exactly. Emitted rows carry the signed
 * size and the tumbling window start, so the hourly imbalance is one
 * ordinary streaming aggregation downstream of this operator.
 *
 * Memory bound: the carried state is O(1) per instrument, but `classify`
 * buffers and sorts each (instrument, micro-batch) group in executor
 * memory to impose deterministic order — per-batch cost is the hottest
 * instrument's rows in ONE trigger interval, not the stream's history.
 * Size triggers so a hot key's per-interval volume fits an executor; for
 * interval-unbounded producers, pre-sort upstream (sortWithinPartitions
 * by (ts, id)) so the group iterator could be consumed streaming.
 */
object StreamOrderFlow {

  /** Price in exact integer cents (the family's surrogate), size from
    * the trade; ts in micros like [[RateLimiter]]. */
  case class Tick(event_type: String, event_id: Long, ts_us: Long,
      cents: Long, size: Long)

  case class SignedTick(event_type: String, event_id: Long, ts_us: Long,
      window_start: Long, sign: Int, signed_size: Long)

  /** Carried per-instrument state: last seen price + inherited sign. */
  case class FlowState(lastCents: Long, lastSign: Int)

  private def classify(windowSec: Long)(
      key: String,
      ticks: Iterator[Tick],
      state: GroupState[FlowState]): Iterator[SignedTick] = {
    var st = state.getOption.orNull
    // deterministic order regardless of shuffle arrival order
    val ordered = ticks.toSeq.sortBy(t => (t.ts_us, t.event_id))
    val out = ordered.map { t =>
      val sign =
        if (st == null) 0
        else if (t.cents > st.lastCents) 1
        else if (t.cents < st.lastCents) -1
        else st.lastSign
      st = FlowState(t.cents, sign)
      SignedTick(t.event_type, t.event_id, t.ts_us,
        t.ts_us / (windowSec * 1000000L) * windowSec, sign,
        sign * t.size)
    }
    state.update(st)
    out.iterator
  }

  /** Apply over a (streaming or batch) Dataset of ticks. */
  def apply(ticks: Dataset[Tick],
      windowSec: Long = 3600L): Dataset[SignedTick] = {
    val spark: SparkSession = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        classify(windowSec))
  }
}
