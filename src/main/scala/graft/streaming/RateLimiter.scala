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

  case class Request(user_id: String, ts_ms: Long)
  case class Verdict(user_id: String, ts_ms: Long, allowed: Boolean,
      in_window: Int, retry_after_ms: Long)

  /** State: recent request timestamps (millis), ascending. */
  private def evaluate(
      durationMs: Long, limit: Int)(
      userId: String,
      requests: Iterator[Request],
      state: GroupState[List[Long]]): Iterator[Verdict] = {
    var window = state.getOption.getOrElse(Nil)
    // deterministic order regardless of shuffle arrival order
    val ordered = requests.toSeq.sortBy(r => (r.ts_ms, 0))
    val out = ordered.map { r =>
      window = (window :+ r.ts_ms).filter(_ > r.ts_ms - durationMs)
      val n = window.length
      val allowed = n <= limit
      val retryAfter = if (allowed) 0L else window.head + durationMs
      Verdict(userId, r.ts_ms, allowed, n, retryAfter)
    }
    state.update(window)
    out.iterator
  }

  /** Apply over a (streaming or batch) Dataset of requests. */
  def apply(requests: Dataset[Request], durationMs: Long = 1000L,
      limit: Int = 100): Dataset[Verdict] = {
    val spark: SparkSession = requests.sparkSession
    import spark.implicits._
    requests
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        evaluate(durationMs, limit))
  }
}
