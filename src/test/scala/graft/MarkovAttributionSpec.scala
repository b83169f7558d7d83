package graft

import org.apache.spark.sql.functions._

import graft.operators.EventsOps

/** Removal-effect attribution: hand-computed micro arithmetic on a
  * three-journey fixture, the no-show channel earning zero, and the
  * effect ordering on the corpus. */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"))

  test("hand-computed fixture: every floor lands exactly") {
    // A: view->click->purchase ; B: view (drops) ; C: click->purchase
    val df = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1L), (3L, 1L, "purchase", 2L),
      (4L, 2L, "view", 0L),
      (5L, 3L, "click", 0L), (6L, 3L, "purchase", 1L))
    val got = EventsOps.markovAttribution(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // base: start->view 2/3, start->click 1/3; view->click 1/2,
    // view->drop 1/2; click->conv 1. conv = 333333 + 333333 = 666666.
    // remove view: conv = 333333 -> effect 1e6 - 500000 = 500000
    // remove click: conv = 0 -> effect 1e6
    // shares over 1500000: 333333 / 666666
    assert(got("view") == (666666L, 333333L, 500000L, 333333L))
    assert(got("click") == (666666L, 0L, 1000000L, 666666L))
    assert(got("error") == (666666L, 666666L, 0L, 0L))
    assert(got("signup") == (666666L, 666666L, 0L, 0L))
  }

  test("a user converting on the FIRST event credits no channel") {
    val df = ev((1L, 1L, "purchase", 0L))
    val got = EventsOps.markovAttribution(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // start -> conv directly: base conv = 1e6, every removal effect 0
    assert(got.values.forall(_ == (1000000L, 0L)))
  }

  test("corpus: effects are non-negative and shares sum to ~1e6") {
    val got = EventsOps.markovAttribution(
      Tables.events(spark, sf0001)).collect()
    assert(got.length == 4)
    val base = got.head.getLong(1)
    got.foreach { r =>
      assert(r.getLong(2) <= base) // removal cannot create conversions
      assert(r.getLong(3) >= 0L)
    }
    val shares = got.map(_.getLong(4)).sum
    assert(shares > 999990L && shares <= 1000000L, s"shares sum $shares")
  }
}
