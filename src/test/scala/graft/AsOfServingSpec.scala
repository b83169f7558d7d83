package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import graft.serving.{TrendsCache, TrendsPage}

class AsOfServingSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right at-or-before each left ts, per key") {
    val left = Seq(
      ("k1", 10L, "L1"), ("k1", 20L, "L2"), ("k1", 5L, "L0"),
      ("k2", 100L, "L3")).toDF("k", "ts", "tag")
    val right = Seq(
      ("k1", 10L, "R@10"), ("k1", 15L, "R@15"),
      ("k2", 999L, "R@999")).toDF("k", "ts", "quote")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "ts", "quote", "asof_quote")
      .select("tag", "asof_quote").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "L0" -> None,          // nothing at or before 5
      "L1" -> Some("R@10"),  // inclusive <= at equal ts
      "L2" -> Some("R@15"),
      "L3" -> None))         // right exists only after
  }

  test("forward as-of join: earliest right at-or-after each left ts, per key") {
    val left = Seq(
      ("k1", 10L, "L1"), ("k1", 20L, "L2"), ("k1", 5L, "L0"),
      ("k2", 100L, "L3")).toDF("k", "ts", "tag")
    val right = Seq(
      ("k1", 10L, "R@10"), ("k1", 15L, "R@15"),
      ("k2", 50L, "R@50")).toDF("k", "ts", "quote")
    val got = AsOfJoin.asOfForward(left, right, "k", "ts", "ts", "quote",
        "next_quote")
      .select("tag", "next_quote").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "L0" -> Some("R@10"),  // earliest following
      "L1" -> Some("R@10"),  // inclusive >= at equal ts
      "L2" -> None,          // nothing at or after 20
      "L3" -> None))         // right exists only before
  }

  test("tolerance as-of: stale matches null out, fresh ones carry staleness") {
    import org.apache.spark.sql.functions._
    // purchases at t=0 and t=5000s; events probe at 0s, 3599s after the
    // first (fresh), 3601s after (stale), and between purchases
    def ev(id: Long, sec: Long, t: String) =
      (id, sec * 1000000000L, 1L, t, 1.0, "{}")
    val df = Seq(
      ev(1, 0, "purchase"),
      ev(2, 3599, "view"),   // 3599s stale → fresh (≤ 3600)
      ev(3, 3601, "view"),   // 3601s stale → nulled
      ev(4, 5000, "purchase"),
      ev(5, 5100, "view"))   // 100s after the second purchase
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
    val got = AsOfJoin.lastPurchaseWithin(df, toleranceSec = 3600L)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    assert(got(1L) == Some((1L, 0L)))            // self-match, zero stale
    assert(got(2L) == Some((1L, 3599000000L)))
    assert(got(3L) == None)                      // beyond tolerance
    assert(got(5L) == Some((4L, 100000000L)))
  }

  test("interpolated as-of: exact integer lerp between the straddling ticks") {
    // user 1: clicks at t=1000μs (v 1.00) and t=2000μs (v 3.00);
    // purchases at t=1500 (midpoint → 2.00), t=1000 (exact hit → 1.00),
    // t=500 (before first click → NULL), t=3000 (after last → NULL)
    def ev(id: Long, us: Long, t: String, v: Double) =
      (id, us * 1000L, 1L, t, v, "{}")
    val df = Seq(
      ev(1, 1000, "click", 1.00), ev(2, 2000, "click", 3.00),
      ev(3, 1500, "purchase", 9.99), ev(4, 1000, "purchase", 9.99),
      ev(5, 500, "purchase", 9.99), ev(6, 3000, "purchase", 9.99))
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
    val got = AsOfJoin.asOfInterpolated(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got == Map(
      3L -> Some(2000000L), // (1.00 + 3.00)/2 in micro
      4L -> Some(1000000L), // exact hit: the click's own value
      5L -> None, 6L -> None))
    // non-midpoint: 1/4 of the way, floor semantics
    val df2 = Seq(
      ev(1, 1000, "click", 1.00), ev(2, 2000, "click", 2.00),
      ev(3, 1250, "purchase", 0.0)).toDF(
      "event_id", "ts_ns", "user_id", "event_type", "value", "props")
    val g2 = AsOfJoin.asOfInterpolated(df2).collect()
    assert(g2(0).getLong(2) == 1250000L)
  }

  test("trends result cache: hit within TTL, recompute after expiry (S7/D5)") {
    var now = 0L
    var computes = 0
    val cache = new TrendsCache(ttlMillis = 60000L, clock = () => now)
    val from = Timestamp.valueOf("2024-08-12 00:00:00")
    val to = Timestamp.valueOf("2024-08-12 23:59:59")
    def compute(): Array[model.Statistic] = {
      computes += 1
      Array(model.Statistic(from, 1, 2, 1.5, 1.4))
    }
    cache.get(from, to, "EUR", "USD")(compute())
    cache.get(from, to, "EUR", "USD")(compute())
    assert(computes == 1) // second call served from cache
    cache.get(from, to, "EUR", "GBP")(compute())
    assert(computes == 2) // different composite key
    now = 60001L
    cache.get(from, to, "EUR", "USD")(compute())
    assert(computes == 3) // TTL expired -> recompute
    assert(cache.key(from, to, "EUR", "USD") ==
      s"${from.getTime}-${to.getTime}-EUR-USD") // service.go:83 shape
    cache.sweep()
    assert(cache.size == 1) // only the fresh entry survives
  }

  test("cache trouble falls through to the engine (service.go:86-89,102-105)") {
    var computes = 0
    val broken = new TrendsCache(ttlMillis = 60000L, clock = () => 0L) {
      override protected def load(k: String): Option[Entry] =
        throw new RuntimeException("cache read down")
      override protected def store(k: String, e: Entry): Unit =
        throw new RuntimeException("cache write down")
    }
    val from = Timestamp.valueOf("2024-08-12 00:00:00")
    val to = Timestamp.valueOf("2024-08-12 23:59:59")
    def compute(): Array[model.Statistic] = {
      computes += 1
      Array(model.Statistic(from, 1, 2, 1.5, 1.4))
    }
    // every call computes (nothing cached, nothing thrown to the caller)
    assert(broken.get(from, to, "EUR", "USD")(compute()).length == 1)
    assert(broken.get(from, to, "EUR", "USD")(compute()).length == 1)
    assert(computes == 2)
  }

  test("trends JSON page has the reference response shape (api.go:14-28)") {
    val s = model.Statistic(Timestamp.valueOf("2024-08-12 11:20:00"), 1.0, 2.0, 1.5, 1.4)
    val json = TrendsPage.toJson("2024-08-12T00:00:00Z", "2024-08-13T00:00:00Z",
      "EUR", "USD", Seq(s))
    assert(json.contains(""""currencyFrom":"EUR""""))
    assert(json.contains(""""statistics":[{"window":"2024-08-12 11:20:00.0","min":1.0"""))
    // zero values are NOT dropped (omitempty quirk deliberately not copied)
    val z = TrendsPage.toJson("a", "b", "EUR", "USD",
      Seq(model.Statistic(s.window, 0.0, 0.0, 0.0, 0.0)))
    assert(z.contains(""""min":0.0"""))
  }

  test("asOfNearest: closer side wins, ties break backward, one-sided edges, keys isolate") {
    import org.apache.spark.sql.functions.{col, struct, unix_micros}
    def ts(t: String) = col(t).cast("timestamp")
    val right = Seq((1L, "2024-01-01 00:01:40", 100L),
      (1L, "2024-01-01 00:03:20", 200L))
      .toDF("user_id", "t", "pid")
      .select(col("user_id"), ts("t").as("ts"),
        struct(unix_micros(ts("t")).as("pus"), col("pid")).as("p"))
    val left = Seq(
      (1L, 1L, "2024-01-01 00:01:50"), // 10s to 100, 90s to 200 → backward
      (2L, 1L, "2024-01-01 00:02:40"), // 60s back, 40s fwd → forward
      (3L, 1L, "2024-01-01 00:02:30"), // 50s both → tie → backward
      (4L, 1L, "2024-01-01 00:01:30"), // nothing behind → forward
      (5L, 2L, "2024-01-01 00:01:40")) // no rights on key 2 → null
      .toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), ts("t").as("ts"))
    val got = AsOfJoin.asOfNearest(left, right, "user_id", "ts", "ts",
      "p", "pus", "m")
      .select(col("event_id"), col("m.pid").as("pid"),
        (col("m.pus") - unix_micros(col("ts"))).as("delta_us"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(got(1L) == Some((100L, -10000000L)))
    assert(got(2L) == Some((200L, 40000000L)))
    assert(got(3L) == Some((100L, -50000000L)))
    assert(got(4L) == Some((100L, 10000000L)))
    assert(got(5L) == None)
  }
}
