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

  test("countInRange keeps duplicate left rows as distinct output rows") {
    import spark.implicits._
    // two identical left rows (same key, same ts) must each get their own
    // count row — a groupBy over the left columns alone would merge them
    val left = Seq(("u1", 100L), ("u1", 100L), ("u2", 50L))
      .toDF("user_id", "us")
    val right = Seq(("u1", 95L), ("u1", 60L)).toDF("user_id", "c_us")
    val got = RangeJoin.countInRange(left, right, "user_id", "us", "c_us",
      windowUs = 10L).collect()
    assert(got.length == 3, s"expected 3 left rows back, got ${got.length}")
    val u1 = got.filter(_.getString(0) == "u1")
    assert(u1.length == 2 && u1.forall(_.getAs[Long]("n_matches") == 1L))
    assert(got.filter(_.getString(0) == "u2")
      .forall(_.getAs[Long]("n_matches") == 0L))
  }

  test("plans as an equi-join — no nested loop, no cartesian") {
    val phys = RangeJoin.purchaseClickCounts(events)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"),
      "range join fell back to a nested loop")
    assert(!phys.contains("CartesianProduct"), "range join plans a cartesian")
  }

  test("property: bin-bucketed ≡ naive on random timestamp batches, incl. window-boundary ties") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val W = 1000L // small window so bin boundaries are exercised densely
    val genRow = for {
      key <- Gen.choose(0L, 3L)
      // cluster timestamps near multiples of W to hit ==, ±1 boundary cases
      base <- Gen.choose(0L, 20L)
      jitter <- Gen.oneOf(-1L, 0L, 1L, 17L, 500L, 999L)
    } yield (key, base * W + jitter)
    (1 to 5).foreach { i =>
      val rows = Gen.listOfN(80, genRow)
        .apply(Gen.Parameters.default, Seed(7L + i)).get
        .zipWithIndex.map { case ((k, us), id) => (id.toLong, k, us) }
      val l = rows.toDF("l_id", "k", "l_us")
      val r = rows.map { case (id, k, us) => (id + 1000L, k, us) }
        .toDF("r_id", "k", "r_us")
      val fast = RangeJoin.rangePairs(l, r, "k", "l_us", "r_us", W)
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      val naive = l.join(r,
          l("k") === r("k") &&
          col("r_us") > col("l_us") - W && col("r_us") <= col("l_us"))
        .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      assert(fast == naive, s"seed batch $i diverged from the naive join")
    }
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

  test("intervalOverlapPairs: multi-bin spans dedupe; touching counts; disjoint doesn't") {
    import spark.implicits._
    // bin width 100: interval A spans bins 0-25 (long), B overlaps it in
    // the middle (candidate pair appears in MANY shared bins → must
    // surface once); C touches A exactly at its end point; D is disjoint
    val a = Seq(("A", 0L, 2500L), ("C2", 4000L, 5000L))
      .toDF("id_a", "a_s", "a_e")
    val b = Seq(("B", 1000L, 1200L), ("C", 2500L, 2600L), ("D", 3000L, 3500L))
      .toDF("id_b", "b_s", "b_e")
    val got = RangeJoin.intervalOverlapPairs(a, b, "a_s", "a_e", "b_s", "b_e",
      binUs = 100L, pred = org.apache.spark.sql.functions.lit(true))
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("A", "C")))
  }

  test("sessionOverlapCounts matches the naive inequality join at sf0.001") {
    val ev = Tables.events(spark, sf0001)
    val sess = graft.operators.MarketStats.sessionOhlc(ev)
      .select(col("event_type"), col("session_start_us").as("s_us"),
        (col("session_start_us") + col("duration_us")).as("e_us"))
    val naive = sess.as("a").join(sess.as("b"),
        col("a.event_type") < col("b.event_type") &&
        col("a.s_us") <= col("b.e_us") && col("b.s_us") <= col("a.e_us"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("type_a"), col("type_b")).collect().toSeq
    val got = RangeJoin.sessionOverlapCounts(ev).collect().toSeq
    assert(got == naive)
  }
}
