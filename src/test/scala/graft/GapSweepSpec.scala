package graft

import org.apache.spark.sql.functions._

import graft.operators.EventsOps

/** The session-count sweep: boundary rule identical to session_window
  * (gap == g opens a session), curve monotone, and the 1800 s point
  * equal to the real sessionizer on the corpus. */
class GapSweepSpec extends SparkSpec {
  import spark.implicits._

  test("boundary and monotonicity on a constructed timeline") {
    // u1: gaps of exactly 300 s and 3600 s; u2: one event
    val df = Seq(
      (1L, 1L, 0L), (2L, 1L, 300L * 1000000L),
      (3L, 1L, (300L + 3600L) * 1000000L),
      (4L, 2L, 0L))
      .toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"))
    val got = EventsOps.sessionGapSweep(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // gap == g is a session break (the [t, t+gap) window rule):
    // at 300 both gaps break → 2 + 2; at 600 only the 3600 gap; at
    // 3600 the equal gap still breaks
    assert(got == Map(300L -> 4L, 600L -> 3L, 1200L -> 3L,
      1800L -> 3L, 3600L -> 3L))
  }

  test("the 1800 s point equals the real session_window count on the corpus") {
    val ev = Tables.events(spark, sf0001)
    val sweep = EventsOps.sessionGapSweep(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sweep(1800L) == EventsOps.sessionize(ev).count())
    // monotone non-increasing in the gap
    val curve = sweep.toSeq.sortBy(_._1).map(_._2)
    curve.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }
}
