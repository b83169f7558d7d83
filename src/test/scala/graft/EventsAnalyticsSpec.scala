package graft

import org.apache.spark.sql.functions._

import graft.operators.EventsOps

/** Funnel + retention semantics on crafted data (the synthetic corpus is
  * dense — every user completes every step — so ordering edge cases are
  * proven here, correctness-at-volume by the driver oracle). */
class EventsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"),
        col("t").cast("timestamp").as("ts"))

  test("funnel counts only in-order steps") {
    val e = ev(
      // u1: full ordered funnel
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (1L, "purchase", "2024-01-01 10:02:00"),
      // u2: click BEFORE first view — click must not count, nor purchase
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"),
      // u3: view and click, purchase before click — purchase must not count
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 10:30:00"),
      (3L, "click", "2024-01-01 11:00:00"),
      // u4: never views
      (4L, "click", "2024-01-01 10:00:00"))
    val r = EventsOps.funnelSteps(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == (3L, 2L, 1L, 4L)) // views: u1,u2,u3; ordered clicks: u1,u3; full: u1
  }

  test("funnel step uses the FIRST qualifying occurrence, not any") {
    // u5 views twice; a click between the two views counts (it follows
    // the first view)
    val e = ev(
      (5L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-01 10:30:00"),
      (5L, "view", "2024-01-01 11:00:00"))
    val r = EventsOps.funnelSteps(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 1L, 0L))
  }

  test("retention: offsets are whole epoch-weeks from the first-activity week") {
    // epoch weeks roll on Thursdays (epoch day 0 was one): 2024-01-01 UTC
    // is week 2817; week 2818 spans Jan 4–Jan 10, week 2819 starts Jan 11
    val e = ev(
      (1L, "view", "2024-01-01 00:00:00"),  // cohort week 2817
      (1L, "view", "2024-01-10 00:00:00"),  // 2818 → offset 1
      (1L, "view", "2024-01-10 12:00:00"),  // 2818 dup week — one count
      (2L, "view", "2024-01-10 00:00:00"))  // cohort 2818
    val got = EventsOps.retentionCohorts(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(1704067200L / 604800 == 2817L)
    assert(got == Set((2817L, 0L, 1L), (2817L, 1L, 1L), (2818L, 0L, 1L)))
  }

  test("survivalRetention: censored users stay at risk; micro-log KM steps") {
    val d = 86400000000000L // one day in ns
    // t_end = day 100 (u5's last event). Deaths: u1,u2 at lifetime-day 1,
    // u3 at day 2. Censored: u4 (last event 99.5d ≥ 99d horizon) at day
    // 49, u5 at day 1. KM: S(1)=3/5·... via floored micro-lns:
    // ⌊ln(0.6)·1e6⌋=−510826, ⌊ln(0.5)·1e6⌋=−693148.
    val e = Seq(
      (1L, 0L), (1L, d), (2L, 0L), (2L, d), (3L, 0L), (3L, 2 * d),
      (4L, 50 * d), (4L, 99 * d + d / 2), (5L, 99 * d), (5L, 100 * d))
      .toDF("user_id", "ts_ns")
    val got = EventsOps.survivalRetention(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got(1L) == ((5L, 2L, 1L, -510826L, 0.6)))
    assert(got(2L) == ((2L, 1L, 0L, -1203974L, 0.3)))
    assert(got(49L) == ((1L, 0L, 1L, -1203974L, 0.3)))
  }

  test("survivalRetention: a day where everyone at risk dies absorbs S at exactly 0") {
    val d = 86400000000000L
    // u1 dies at lifetime-day 5 with no one censored at or past it →
    // d = n_risk there; u2 (single event, sets t_end) is censored at 0.
    val e = Seq((1L, 0L), (1L, 5 * d), (2L, 10 * d))
      .toDF("user_id", "ts_ns")
    val rows = EventsOps.survivalRetention(e).collect()
    val day0 = rows.find(_.getLong(0) == 0L).get
    assert((day0.getLong(1), day0.getLong(2), day0.getLong(3),
      day0.getLong(4), day0.getDouble(5)) == ((2L, 0L, 1L, 0L, 1.0)))
    val day5 = rows.find(_.getLong(0) == 5L).get
    assert((day5.getLong(1), day5.getLong(2)) == ((1L, 1L)))
    assert(day5.isNullAt(4) && day5.getDouble(5) == 0.0)
  }

  test("sliding windows cover every event exactly twice; log2 bins conserve counts") {
    val ev = Tables.events(spark, sf0001)
    val total = ev.count()
    val sliding = EventsOps.slidingActiveUsers(ev)
    assert(sliding.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0) == 2 * total)
    // n_users never exceeds n_events, and is positive
    assert(sliding.filter(col("n_users") > col("n_events") ||
      col("n_users") < 1).count() == 0)
    val hist = EventsOps.log2Histogram(ev)
    assert(hist.agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0) == total)
    // exact bin check: 1.00 → cents 100 → floor(log2 100) = 6
    import spark.implicits._
    val one = EventsOps.log2Histogram(
      Seq((1L, "x", 1.00)).toDF("event_id", "event_type", "value")).collect()
    assert(one.head.getInt(1) == 6)
  }

  test("conversion rate: horizon-bounded, micro-floored, NULL on no clicks") {
    def row(id: Long, u: Long, t: String, sec: Long) =
      (id, u, t, sec * 1000000000L)
    val df = Seq(
      row(1, 1, "click", 0), row(2, 1, "purchase", 3600), // exactly 1h → in
      row(3, 2, "click", 0), row(4, 2, "purchase", 3601), // 1h+1s → out
      row(5, 3, "click", 0)) // never converts
      .toDF("event_id", "user_id", "event_type", "ts_ns")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(ts_ns DIV 1000)").as("ts"))
    val r = EventsOps.clickConversionRate(df).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (3L, 1L))
    assert(r.getLong(2) == 333333L) // floor(1e6/3)
  }

  test("trimmed mean drops the tails the winsorizer would clamp") {
    // 1..99 plus one huge outlier: cume_dist(v) = v-ish/100, so the
    // exact-discrete bounds are p_lo = 5 (cd .05) and p_hi = 95 (cd .95)
    val vals = (1 to 99).map(_.toDouble) :+ 1000000.0
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    val r = EventsOps.trimmedMeanByType(df).collect()(0)
    // survivors 5..95: n 91, sum 4550 → mean exactly 50
    assert((r.getLong(1), r.getLong(2)) == (50000000L, 91L))
  }

  test("type-pair lift is N·c_ab/(c_a·c_b) over distinct user-type pairs") {
    // u1{a,b,c} u2{a,b,c} u3{a} u4{b}; duplicates must not inflate counts
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "b"), (2L, "c"),
      (3L, "a"), (4L, "b"))
      .toDF("user_id", "event_type")
    val got = EventsOps.typePairLift(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // N=4: (a,b) 4·2/(3·3) → floor 888888; (a,c),(b,c) 4·2/(3·2) → 1333333
    assert(got == Map(("a", "b") -> (2L, 888888L),
      ("a", "c") -> (2L, 1333333L), ("b", "c") -> (2L, 1333333L)))
  }

  test("temporal copresence: same-window pairs only, per-cell distinct") {
    val wNs = 600L * 1000000000L
    val df = Seq(
      // u1 window 0: a+b; u1 window 1: a+c
      (1L, "a", 0L), (1L, "b", 10L * 1000000000L),
      (1L, "a", wNs + 1000L), (1L, "c", wNs + 2000L),
      // u2 window 0: a + b twice (distinct must collapse the dup)
      (2L, "a", 0L), (2L, "b", 5L * 1000000000L), (2L, "b", 8L * 1000000000L))
      .toDF("user_id", "event_type", "ts_ns")
    val got = EventsOps.temporalCopresence(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L))
  }

  test("user communities: transitive closure over cells, hot cells dropped") {
    val wNs = 600L * 1000000000L
    val df = Seq(
      // window 0 cell "a": users 1,2 linked; window 1 cell "a": users 2,3
      // → {1,2,3} one community labeled by min id 1
      (1L, "a", 0L), (2L, "a", 1000L),
      (2L, "a", wNs + 1L), (3L, "a", wNs + 2L),
      // users 10,11 share a cell → their own community
      (10L, "b", 0L), (11L, "b", 5L),
      // a HOT cell (3 users > maxCell=2) must link nobody
      (20L, "c", 0L), (21L, "c", 1L), (22L, "c", 2L))
      .toDF("user_id", "event_type", "ts_ns")
    val got = EventsOps.userCommunities(df, maxCell = 2L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("sessionStats: entry election, bounce and depth per entry type") {
    val us = 1000000L
    val df = Seq(
      // u1 session 1: view → click (depth 2, entry view)
      (1L, 1L, "view", 0L), (2L, 1L, "click", 60L * us),
      // u1 session 2 after a 31-min gap: single view → bounce
      (3L, 1L, "view", (60L + 31L * 60L) * us),
      // u2: single click session → bounce, entry click
      (4L, 2L, "click", 0L))
      .toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val got = EventsOps.sessionStats(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("view") == ((2L, 1L, 500000L, 1500000L)))
    assert(got("click") == ((1L, 1L, 1000000L, 1000000L)))
  }

  test("volumeHhi: one dominant account vs an even split") {
    val df = Seq(
      // type a: one user trades everything → HHI = 1e6, top share 1e6
      (1L, 1L, "a", """{"k": 10}"""), (2L, 1L, "a", """{"k": 30}"""),
      // type b: 2 users at 20/20 → HHI = 0.5, top share 0.5
      (3L, 2L, "b", """{"k": 20}"""), (4L, 3L, "b", """{"k": 20}"""))
      .toDF("event_id", "user_id", "event_type", "props")
    val got = EventsOps.volumeHhi(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((1L, 40L, 1000000L, 1000000L)))
    assert(got("b") == ((2L, 40L, 500000L, 500000L)))
  }

  test("user type gini: 0 single-type, 0.5 even split, exact micro floors") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"), // one type → 0
      (2L, "a"), (2L, "a"), (2L, "b"), (2L, "b"), // 2+2 → 0.5
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "c")) // 1+1+2 → 0.625
      .toDF("user_id", "event_type")
    val got = EventsOps.userTypeGini(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(1L -> (4L, 1L, 0L), 2L -> (4L, 2L, 500000L),
      3L -> (4L, 3L, 625000L)))
  }

  test("first-touch attribution: session-scoped earliest click, NULL without one") {
    def row(id: Long, u: Long, t: String, sec: Long) =
      (id, u, t, sec * 1000000L)
    val df = Seq(
      // user 1, session A: click@10, view@20, purchase@30 → credited 1
      row(1, 1, "click", 10), row(2, 1, "view", 20), row(3, 1, "purchase", 30),
      // 31-min gap → session B: purchase first, click after it → NULL
      // (first-touch only looks at clicks AT OR BEFORE the purchase)
      row(4, 1, "purchase", 30 + 1900), row(5, 1, "click", 30 + 1910),
      // another purchase later in B: now click 5 is the first touch
      row(6, 1, "purchase", 30 + 1920),
      // user 2: clicks straddle; earliest in-session click wins
      row(7, 2, "click", 100), row(8, 2, "click", 200),
      row(9, 2, "purchase", 300))
      .map { case (id, u, t, us) => (id, u, t, us * 1000L) }
      .toDF("event_id", "user_id", "event_type", "ts_ns")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(ts_ns DIV 1000)").as("ts"))
    val got = EventsOps.sessionAttribution(df).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map(3L -> Some(1L), 4L -> None, 6L -> Some(5L),
      9L -> Some(7L)))
  }

  test("anomalyMad: integer Hampel gate — outlier iff 2·dev2 > 3·mad4") {
    // cents [100,102,104,106,10000]: med2=208, dev2=[8,4,0,4,19792],
    // mad4=8 → gate dev2 > 12 flags only the 10000-cent point
    val df = Seq(1.00, 1.02, 1.04, 1.06, 100.00).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    val r = EventsOps.anomalyMad(df).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) == (5L, 1L, 208L, 8L))
  }

  test("anomalyMad: even count interpolates the median to an exact half") {
    // cents [100, 101]: median 100.5 → med2=201 (exact), dev2=[1,1],
    // mad4=2; gate 2·1 > 3·2 is false → no outliers
    val df = Seq((1L, "a", 1.00), (2L, "a", 1.01))
      .toDF("event_id", "event_type", "value")
    val r = EventsOps.anomalyMad(df).collect()
    assert((r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
      == (0L, 201L, 2L))
  }

  test("rfmSegments scores each axis independently on its own order") {
    // 4 purchase users, each a distinct quartile on every axis; the
    // non-purchase row must not contribute
    val rows = (1 to 4).map { i =>
      (i.toLong, i.toLong, "purchase", i * 1.00, i * 1000000L * 1000L)
    } :+ (9L, 9L, "view", 99.0, 1L)
    val df = rows.toDF("event_id", "user_id", "event_type", "value", "ts_ns")
    val got = EventsOps.rfmSegments(df).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got == (1 to 4).map(i =>
      ((i, i, i), (1L, i * 100L))).toMap)
  }

  test("userPathTopK counts trigrams over the per-user (ts_ns, event_id) order") {
    // u1: a b c d → a>b>c, b>c>d; u2: a b c → a>b>c (count 2)
    val df = Seq(
      (1L, 1L, "a", 1000L), (2L, 1L, "b", 2000L),
      (3L, 1L, "c", 3000L), (4L, 1L, "d", 4000L),
      (5L, 2L, "a", 1000L), (6L, 2L, "b", 2000L), (7L, 2L, "c", 3000L))
      .toDF("event_id", "user_id", "event_type", "ts_ns")
    val got = EventsOps.userPathTopK(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>c", 2L), ("b>c>d", 1L)))
  }

  test("funnelWindow: a chain may open at any view; every step within the window of ITS opening view") {
    val e = ev(
      // u1: the first view's chain dies (click 2h later), but a LATER
      // view converts fully inside the hour — level 3 (the case
      // funnelSteps' first-view-only chain misses)
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 12:30:00"),
      (1L, "click", "2024-01-01 12:40:00"),
      (1L, "purchase", "2024-01-01 13:00:00"),
      // u2: click inside the window, purchase at +90min — outside the
      // opening view's window even though it follows the click → level 2
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:30:00"),
      (2L, "purchase", "2024-01-01 11:30:00"),
      // u3: view only → level 1
      (3L, "view", "2024-01-01 10:00:00"),
      // u4: click with no view — no level at all
      (4L, "click", "2024-01-01 10:00:00"))
    val r = EventsOps.funnelWindow(e, windowSec = 3600L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == (3600L, 3L, 2L, 1L))
  }

  test("funnelWindow: same-instant steps do not chain (strictly after)") {
    val e = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"), // same μs as the view
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:00:01"))
    val r = EventsOps.funnelWindow(e).collect()(0)
    assert((r.getLong(1), r.getLong(2)) == (2L, 1L)) // only u2 chains
  }

  private def evId(rows: (Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"),
        col("t").cast("timestamp").as("ts"))

  test("maxConcurrency: sweep counts inclusive session overlaps; argmax ties to the first instant") {
    val e = evId(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:10:00"),
      (3L, 2L, "2024-01-01 10:05:00"),
      (4L, 3L, "2024-01-01 10:10:00"),
      (5L, 4L, "2024-01-01 09:00:00"), (6L, 4L, "2024-01-01 11:00:00"))
    // sessions: u1 [10:00,10:10], u2 [10:05,10:05], u3 [10:10,10:10],
    // u4 [09:00,09:00] and [11:00,11:00] (30-min gap splits them).
    // concurrency hits 2 at 10:05 (u1+u2) and again at 10:10 (u1+u3) —
    // the argmax must report the FIRST instant
    val r = EventsOps.maxConcurrency(e).collect()(0)
    val exp = Seq(Tuple1("2024-01-01 10:05:00")).toDF("t")
      .select(unix_micros(col("t").cast("timestamp"))).head.getLong(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == exp)
  }

  test("orderBacklog: open through the last-shipped day inclusive; curve drains to zero") {
    import graft.operators.Relational
    // o1 opens day 0, last line ships day 2; o2 opens and ships day 1
    val orders = Seq((1L, "1992-01-01 00:00:00"), (2L, "1992-01-02 00:00:00"))
      .toDF("o_orderkey", "t")
      .select(col("o_orderkey"), col("t").cast("timestamp").as("o_orderdate"))
    val lines = Seq((1L, "1992-01-01 00:00:00"), (1L, "1992-01-03 00:00:00"),
      (2L, "1992-01-02 00:00:00"))
      .toDF("l_orderkey", "t")
      .select(col("l_orderkey"), col("t").cast("timestamp").as("l_shipdate"))
    val got = Relational.orderBacklog(orders, lines).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 1L), (1L, 1L, 2L),
      (0L, 1L, 1L), (0L, 0L, 0L)))
  }

  test("orderBacklog day bucketing is session-TZ independent on NTZ dates") {
    import graft.operators.Relational
    val orders = Seq((1L, "1992-01-01 00:00:00")).toDF("o_orderkey", "t")
      .select(col("o_orderkey"),
        expr("CAST(t AS TIMESTAMP_NTZ)").as("o_orderdate"))
    val lines = Seq((1L, "1992-01-02 00:00:00")).toDF("l_orderkey", "t")
      .select(col("l_orderkey"),
        expr("CAST(t AS TIMESTAMP_NTZ)").as("l_shipdate"))
    val tz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val a = Relational.orderBacklog(orders, lines).collect().map(_.toSeq)
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val b = Relational.orderBacklog(orders, lines).collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq, "day buckets moved with the session TZ")
      assert(a.head.head ==
        java.time.LocalDate.of(1992, 1, 1).toEpochDay)
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
  }

  test("basketPairs: order-local distinct pairs, duplicate lines don't inflate, exact integer lift") {
    import graft.operators.Relational
    // o1 {p1, p2, p2-again}, o2 {p1, p2}, o3 {p1, p3}, o4 {p2}:
    // pair (1,2) support 2 (the duplicate line must not make it 3),
    // lift = 2·4·10⁶ div (3·3) = 888888 (floored)
    val lines = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val got = Relational.basketPairs(lines, minSupport = 2L, k = 50)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (1L, 2L, 2L, 3L, 3L, 888888L))
  }

  test("fkOrphans: dangling and NULL child keys counted per edge, clean edges zero") {
    import graft.operators.Relational
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val region = Seq(Tuple1(1L)).toDF("r_regionkey")
    val nation = Seq((1L, 1L), (2L, 99L)).toDF("n_nationkey", "n_regionkey")
    val custSchema = StructType(Seq(StructField("c_custkey", LongType),
      StructField("c_nationkey", LongType)))
    val customer = spark.createDataFrame(
      java.util.Arrays.asList(Row(10L, 1L), Row(11L, 5L), Row(12L, null)),
      custSchema)
    val supplier = Seq((20L, 1L)).toDF("s_suppkey", "s_nationkey")
    val part = Seq(Tuple1(30L)).toDF("p_partkey")
    val orders = Seq((40L, 10L), (41L, 99L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((40L, 30L, 20L), (99L, 30L, 20L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    val got = Relational.fkOrphans(lineitem, orders, customer, supplier,
      part, nation, region).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "customer.nation" -> ((3L, 2L)), // dangling 5 + NULL
      "lineitem.order" -> ((2L, 1L)),
      "lineitem.part" -> ((2L, 0L)),
      "lineitem.supplier" -> ((2L, 0L)),
      "nation.region" -> ((2L, 1L)),
      "orders.customer" -> ((2L, 1L)),
      "supplier.nation" -> ((1L, 0L))))
  }

  test("giniFrom: uniform mass scores 0, full concentration scores (n-1)/n, decile exact") {
    import graft.operators.Profiling
    import spark.implicits._
    def gini(rows: Seq[(String, Long)]): (Long, Long, Long, Long) = {
      val r = Profiling.giniFrom(rows.toDF("k", "cnt")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // perfectly uniform: gini 0; top decile of 10 keys = 1 key = 10%
    val u = gini((1 to 10).map(i => (s"k$i", 100L)))
    assert(u == ((10L, 1000L, 0L, 100000L)), s"uniform: $u")
    // all mass on one key: gini = (n-1)/n = 0.9; top decile holds it all
    val c = gini(("hot", 1000L) +: (1 to 9).map(i => (s"k$i", 0L)))
    assert(c == ((10L, 1000L, 900000L, 1000000L)), s"concentrated: $c")
    // 80/20 hand case, n=5: counts (5,5,5,5,80) → G = 0.6 exactly
    val p = gini(Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L),
      ("e", 80L)))
    assert(p._3 == 600000L && p._4 == 800000L, s"pareto: $p")
    // user_gini rides the same core over per-user event counts
    val ev = Tables.events(spark, sf0001)
    val got = graft.operators.EventsOps.userGini(ev).collect()(0)
    assert(got.getLong(0) > 0 && got.getLong(2) >= 0 &&
      got.getLong(2) < 1000000L)
  }

  test("gini plans: no unpartitioned window over a data-sized input") {
    // the r13 weak item: giniFrom used to row_number() the whole
    // key-count relation through ONE task; the histogram closed form
    // leaves unpartitioned windows only over the count-histogram
    // AGGREGATE (bounded domain) — the RanksSpec plan contract
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (name <- Seq("user_gini", "source_gini")) {
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name: unpartitioned Window whose input is not aggregate-bounded")
      assert(plan.collectFirst { case w: LWindow => w }.nonEmpty,
        s"$name: the histogram cumulative window should exist")
    }
  }

  test("benfordValues: cents-string digit extraction, restored grid, micro reference") {
    // digits: 1.00→100→1, 0.19→19→1, 2.50→250→2, 0.05→5→5; the 0.0
    // row is excluded. log10 masses: d1 301029, d2 176091, d5 79181,
    // d9 45757 (floor micro).
    val e = Seq((1L, "t", 1.00), (2L, "t", 0.19), (3L, "t", 2.50),
      (4L, "t", 0.05), (5L, "t", 0.0))
      .toDF("event_id", "event_type", "value")
    val got = EventsOps.benfordValues(e).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L) == ((2L, 500000L, 301029L, 198971L)))
    assert(got(2L) == ((1L, 250000L, 176091L, 73909L)))
    assert(got(5L) == ((1L, 250000L, 79181L, 170819L)))
    assert(got(9L) == ((0L, 0L, 45757L, 45757L)))
  }
}
