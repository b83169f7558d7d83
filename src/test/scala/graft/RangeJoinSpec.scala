package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bin-bucketed time-range join: exact equivalence with the naive
  * inequality join, zero-count retention, and the plan shape that makes it
  * scale (equi-join, never a nested-loop/cartesian). */
class RangeJoinSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf0001)

  test("range_join_counts matches the naive inequality join exactly") {
    val fast = RangeJoin.purchaseClickCounts(events).collect()

    val ev = events.select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_uid"), col("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("us").as("c_us"))
    val naive = p.join(c,
        col("c_uid") === col("p_uid") &&
        col("c_us") > col("us") - 300000000L && col("c_us") <= col("us"),
        "left")
      .groupBy(col("event_id"), col("p_uid"))
      .agg(count(col("c_us")).as("n_clicks"))
      .select(col("event_id"), col("p_uid").as("user_id"), col("n_clicks"))
      .orderBy(col("event_id"))
      .collect()

    assert(fast.length == naive.length)
    fast.zip(naive).foreach { case (a, b) => assert(a == b) }
  }

  test("keeps purchases with zero in-range clicks") {
    val counts = RangeJoin.purchaseClickCounts(events)
    val nPurchases = events.filter(col("event_type") === "purchase").count()
    assert(counts.count() == nPurchases, "left-outer semantics lost a row")
    assert(counts.filter(col("n_clicks") === 0).count() > 0,
      "sf0.001 should contain at least one zero-click purchase")
  }

  test("plans as an equi-join — no nested loop, no cartesian") {
    val phys = RangeJoin.purchaseClickCounts(events)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"),
      "range join fell back to a nested loop")
    assert(!phys.contains("CartesianProduct"), "range join plans a cartesian")
  }

  test("rangePairs emits each true match exactly once") {
    val l = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("l_id"), col("user_id"),
        unix_micros(col("ts")).as("l_us"))
    val r = events.filter(col("event_type") === "click")
      .select(col("event_id").as("r_id"), col("user_id"),
        unix_micros(col("ts")).as("r_us"))
    val pairs = RangeJoin.rangePairs(l, r, "user_id", "l_us", "r_us", 300000000L)
    assert(pairs.groupBy(col("l_id"), col("r_id")).count()
      .filter(col("count") > 1).count() == 0, "duplicate match emitted")
    // and the range predicate actually holds on every emitted pair
    assert(pairs.filter(col("r_us") <= col("l_us") - 300000000L ||
      col("r_us") > col("l_us")).count() == 0)
  }
}
