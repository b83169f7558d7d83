package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Per-user sliding-window rate limiter as an arbitrary-stateful streaming
 * operator (`flatMapGroupsWithState`) — the Spark-native form of the
 * reference's Redis sorted-set limiter (`consumer/ratelimit/ratelimit.go:38-62`,
 * SURVEY.md §2.4 ST6):
 *
 *   per request: drop window entries older than now-duration (ZREM :44),
 *   admit the request into the window (ZADD :45), count (ZCARD-equiv :47);
 *   over the limit → verdict 429 with retryAfter = oldest + duration
 *   (`ratelimit.go:54-60`).
 *
 * State per user is the timestamp buffer of the last `duration` — bounded
 * by the limit’s own ceiling in steady state. Keyed state shards across
 * executors by group hash; nothing global.
 */
object RateLimiter {

  /** Timestamps in MICROS — the reference tracks its window in UnixMicro
    * (`ratelimit.go:41`). `req_id` is the caller's unique request id: the
    * deterministic tiebreaker for same-microsecond requests (without one,
    * which request draws the 429 could flip across shuffle retries). */
  case class Request(user_id: String, req_id: Long, ts_us: Long)
  case class Verdict(user_id: String, req_id: Long, ts_us: Long,
      allowed: Boolean, in_window: Int, retry_after_us: Long)

  /** State: recent request timestamps (micros), ascending. */
  private def evaluate(
      durationUs: Long, limit: Int)(
      userId: String,
      requests: Iterator[Request],
      state: GroupState[List[Long]]): Iterator[Verdict] = {
    var window = state.getOption.getOrElse(Nil)
    // deterministic order regardless of shuffle arrival order
    val ordered = requests.toSeq.sortBy(r => (r.ts_us, r.req_id))
    val out = ordered.map { r =>
      window = (window :+ r.ts_us).filter(_ > r.ts_us - durationUs)
      val n = window.length
      val allowed = n <= limit
      val retryAfter = if (allowed) 0L else window.head + durationUs
      Verdict(userId, r.req_id, r.ts_us, allowed, n, retryAfter)
    }
    state.update(window)
    out.iterator
  }

  /** Apply over a (streaming or batch) Dataset of requests. */
  def apply(requests: Dataset[Request], durationUs: Long = 1000000L,
      limit: Int = 100): Dataset[Verdict] = {
    val spark: SparkSession = requests.sparkSession
    import spark.implicits._
    requests
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        evaluate(durationUs, limit))
  }
}
