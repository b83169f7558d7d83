package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming log COMPACTION — keep-newest-per-key over an unbounded event
 * stream, the continuous form of `EventsOps.latestEvents` (upsert/SCD
 * materialization: the table a key-value serving tier reads). Keyed state
 * holds exactly ONE row per (user, type) — the current winner — and a
 * batch emits only keys whose winner changed, so downstream upserts are
 * minimal deltas.
 *
 * Ordering rule is identical to the batch operator: (event_us, event_id)
 * descending — a replayed or out-of-order older event can never displace
 * a newer winner, which makes the fold idempotent under at-least-once
 * delivery and insensitive to arrival order (spec-asserted: any
 * interleaving converges to the batch result).
 *
 * Scale: state is key-cardinality (not history); no watermark is needed
 * because compaction keeps the newest forever (add one only to bound
 * KEYS, i.e. drop keys silent longer than the horizon).
 */
object StreamCompact {

  /** Input event (top-level for encoder derivation). */
  case class Ev(event_id: Long, user_id: Long, event_type: String,
      us: Long, value: Double)
  /** Current winner for a key, emitted when it changes. */
  case class Latest(user_id: Long, event_type: String, latest_id: Long,
      latest_us: Long, value: Double)

  private def newer(a: Ev, b: Ev): Boolean =
    a.us > b.us || (a.us == b.us && a.event_id > b.event_id)

  /** Fold the stream into per-key winners; emits a key's winner whenever
    * it changes (update-style deltas in append mode). */
  def latest(events: Dataset[Ev]): Dataset[Latest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Ev, Latest](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[Ev], state: GroupState[Ev]) =>
          val incoming = rows.reduceOption((a, b) => if (newer(a, b)) a else b)
          val current = state.getOption
          (incoming, current) match {
            case (Some(in), cur) if cur.forall(c => newer(in, c)) =>
              state.update(in)
              Iterator(Latest(key._1, key._2, in.event_id, in.us, in.value))
            case _ => Iterator.empty
          }
      }
  }
}
