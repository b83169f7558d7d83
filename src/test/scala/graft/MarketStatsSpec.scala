package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.MarketStats

/** Hand-built tick paths with known OHLC/TWAP/drawdown answers, plus the
  * plan shape that keeps the family one-shuffle at scale. */
class MarketStatsSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, ts_ns, event_type, value, props) ticks. */
  private def ticks(rows: (Long, Long, String, Double, String)*) =
    rows.toDF("event_id", "ts_ns", "event_type", "value", "props")

  test("ohlcBars picks first/last by (ts_ns, event_id) and exact extremes") {
    // one 600 s window; same-nanos tie on the open decided by event_id
    val df = ticks(
      (2L, 1000L, "eurusd", 1.10, "{}"),
      (1L, 1000L, "eurusd", 1.20, "{}"), // wins the open tie (lower id)
      (3L, 2000L, "eurusd", 0.90, "{}"),
      (4L, 3000L, "eurusd", 1.15, "{}"))
    val r = MarketStats.ohlcBars(df).collect()
    assert(r.length == 1)
    val Row(_, _, open, high, low, close, n) = r(0)
    assert((open, high, low, close, n) == (1.20, 1.20, 0.90, 1.15, 4L))
  }

  test("ohlcBars splits windows on the tumbling boundary") {
    val ns = 600L * 1000000000L
    val df = ticks(
      (1L, ns - 1, "a", 1.0, "{}"),
      (2L, ns, "a", 2.0, "{}"))
    val r = MarketStats.ohlcBars(df).orderBy("window_start").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 600L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0))
  }

  test("vwap weights by props.k, floors to micro-units, NULLs zero volume") {
    val df = ticks(
      (1L, 1000L, "a", 2.00, """{"k": 1}"""),
      (2L, 2000L, "a", 4.00, """{"k": 3}"""),
      // all-zero-size window for instrument b
      (3L, 1000L, "b", 9.99, """{"k": 0}"""))
    val r = MarketStats.vwap(df).orderBy("event_type").collect()
    // (2*1 + 4*3) / 4 = 3.5 → 3_500_000 micro
    assert(r(0).getLong(2) == 3500000L && r(0).getLong(3) == 4L)
    assert(r(1).isNullAt(2) && r(1).getLong(3) == 0L)
  }

  test("twap weights each tick by its residence time; last tick drops") {
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"), // held 100 ns
      (2L, 100L, "a", 3.00, "{}"), // held 300 ns
      (3L, 400L, "a", 9.99, "{}")) // no successor → excluded
    val r = MarketStats.twap(df).collect()
    // (1*100 + 3*300) / 400 = 2.5 → 2_500_000 micro, 2 weighted ticks
    assert(r.length == 1 && r(0).getLong(2) == 2500000L && r(0).getLong(3) == 2L)
  }

  test("realizedVariation is sqrt of exact sum of squared tick moves") {
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"),
      (2L, 100L, "a", 4.00, "{}"), // Δ = 3
      (3L, 200L, "a", 0.00, "{}")) // Δ = -4
    val r = MarketStats.realizedVariation(df).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(2) == 5.0 && r(0).getLong(3) == 2L)
  }

  test("maxDrawdown finds the worst peak-to-trough drop along the path") {
    // path 4 → 2 (dd .5) → 5 → 1 (dd .8) → 10
    val df = ticks(
      (1L, 0L, "a", 4.0, "{}"), (2L, 1L, "a", 2.0, "{}"),
      (3L, 2L, "a", 5.0, "{}"), (4L, 3L, "a", 1.0, "{}"),
      (5L, 4L, "a", 10.0, "{}"))
    val r = MarketStats.maxDrawdown(df).collect()
    assert(r(0).getDouble(1) == 0.8 && r(0).getLong(2) == 5L)
  }

  test("pairCorrelation is ±1 on exactly co-/anti-moving pairs") {
    val ns = 600L * 1000000000L
    // three windows; b = 2·a (corr +1), c = −a + 10 (corr −1)
    val rows = Seq(1.0, 2.0, 4.0).zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 3 + 1L, i * ns, "a", v, "{}"),
        (i * 3 + 2L, i * ns, "b", 2 * v, "{}"),
        (i * 3 + 3L, i * ns, "c", 10 - v, "{}"))
    }
    val r = MarketStats.pairCorrelation(ticks(rows: _*))
      .orderBy("type_a", "type_b").collect()
    val byPair = r.map(x => ((x.getString(0), x.getString(1)), x.getDouble(2))).toMap
    assert(byPair(("a", "b")) == 1.0)
    assert(byPair(("a", "c")) == -1.0)
    assert(byPair(("b", "c")) == -1.0)
    assert(r.forall(_.getLong(3) == 3L))
  }

  test("obvDaily signs each day's volume by the close direction, first day 0") {
    val dayNs = 86400L * 1000000000L
    // closes 1.00 → 2.00 (up) → 1.50 (down); volumes 10, 5, 7
    val df = ticks(
      (1L, 0L, "a", 1.00, """{"k": 10}"""),
      (2L, dayNs, "a", 2.00, """{"k": 5}"""),
      (3L, 2 * dayNs, "a", 1.50, """{"k": 7}"""))
    val r = MarketStats.obvDaily(df).collect()
    assert(r.map(_.getLong(3)).toSeq == Seq(0L, 5L, -2L))
    assert(r.map(_.getLong(2)).toSeq == Seq(10L, 5L, 7L))
  }

  test("stochasticK places the close inside the trailing band; flat band NULL") {
    val dayNs = 86400L * 1000000000L
    // a: daily closes 1.00, 3.00, 2.00, then a 1.00→4.00 day closing 4.00
    val rows = Seq(
      (1L, 0L, "a", 1.00, "{}"), (2L, dayNs, "a", 3.00, "{}"),
      (3L, 2 * dayNs, "a", 2.00, "{}"),
      (4L, 3 * dayNs, "a", 1.00, "{}"), (5L, 3 * dayNs + 1000L, "a", 4.00, "{}")) ++
      // b: constant price → degenerate band
      (0 to 3).map(i => (10L + i, i * dayNs, "b", 5.00, "{}"))
    val r = MarketStats.stochasticK(ticks(rows: _*), n = 3).collect()
    val byKey = r.map(x => (x.getString(0), x.getLong(1)) ->
      (if (x.isNullAt(4)) None else Some(x.getLong(4)))).toMap
    // day2: band [100,300], close 200 → 500000; day3: band [100,400], close 400
    assert(byKey(("a", 2L)) == Some(500000L))
    assert(byKey(("a", 3L)) == Some(1000000L))
    assert(byKey(("b", 2L)).isEmpty && byKey(("b", 3L)).isEmpty)
  }

  test("kyleLambda recovers an exact dp = 0.2·flow slope") {
    val hNs = 3600L * 1000000000L
    // hour 0: open 1.00 (first tick, sign 0), uptick to 1.02 on size 10
    //   → flow +10, dp +2; hour 1: two downticks on size 5 → flow −10, dp −2
    val df = ticks(
      (1L, 0L, "a", 1.00, """{"k": 10}"""),
      (2L, 1000L, "a", 1.02, """{"k": 10}"""),
      (3L, hNs, "a", 1.01, """{"k": 5}"""),
      (4L, hNs + 1000L, "a", 0.99, """{"k": 5}"""))
    val r = MarketStats.kyleLambda(df).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == 0.2 && r(0).getLong(2) == 2L)
  }

  test("retAutocorr is −1 on a perfectly alternating return series") {
    val dayNs = 86400L * 1000000000L
    // closes 1.00, 2.00, 1.00, 2.00, 1.00 → returns alternate ±, lag-1 ρ −1
    val df = ticks(Seq(1.00, 2.00, 1.00, 2.00, 1.00).zipWithIndex.map {
      case (v, i) => (i + 1L, i * dayNs, "a", v, "{}")
    }: _*)
    val r = MarketStats.retAutocorr(df).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(1) == -1.0 && r(0).getLong(2) == 3L)
  }

  test("moneyFlowIndex splits ×3-typical-price flows by direction") {
    val dayNs = 86400L * 1000000000L
    // one tick per day: closes 1.00, 2.00, 1.00; volumes 10, 5, 7
    val df = ticks(
      (1L, 0L, "a", 1.00, """{"k": 10}"""),
      (2L, dayNs, "a", 2.00, """{"k": 5}"""),
      (3L, 2 * dayNs, "a", 1.00, """{"k": 7}"""))
    val r = MarketStats.moneyFlowIndex(df, n = 2).collect()
    // only day 2 has a full 2-diff window: pf = 600·5, nf = 300·7
    assert(r.length == 1 && r(0).getLong(1) == 2L)
    assert(r(0).getLong(2) == 300000000000L / 5100L) // 58823529
  }

  test("chaikinAd: close-at-high day +vol, flat day 0, close-at-low −vol") {
    val dayNs = 86400L * 1000000000L
    val df = ticks(
      // day 0: 1.00 → 2.00, sizes 4+6 → close at high, mfv = +10·10⁶
      (1L, 0L, "a", 1.00, """{"k": 4}"""),
      (2L, 1000L, "a", 2.00, """{"k": 6}"""),
      // day 1: single tick → high = low → 0
      (3L, dayNs, "a", 1.50, """{"k": 5}"""),
      // day 2: 3.00 → 2.00, sizes 1+2 → close at low, mfv = −3·10⁶
      (4L, 2 * dayNs, "a", 3.00, """{"k": 1}"""),
      (5L, 2 * dayNs + 1000L, "a", 2.00, """{"k": 2}"""))
    val r = MarketStats.chaikinAd(df).collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(10000000L, 0L, -3000000L))
    assert(r.map(_.getLong(3)).toSeq == Seq(10000000L, 10000000L, 7000000L))
  }

  test("ulcerIndex: RMS of ×10⁸ drawdowns off the running peak, floored") {
    val dayNs = 86400L * 1000000000L
    // closes 2.00, 1.00, 1.00 → dd 0, 5·10⁷, 5·10⁷
    val df = ticks(
      (1L, 0L, "a", 2.00, "{}"),
      (2L, dayNs, "a", 1.00, "{}"),
      (3L, 2 * dayNs, "a", 1.00, "{}"))
    val r = MarketStats.ulcerIndex(df, n = 2).collect()
    // day1: floor(sqrt((0 + 25e14) div 2)) = 35355339; day2: exactly 5e7
    assert(r.map(x => (x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 35355339L), (2L, 50000000L)))
  }

  test("tickBurstiness: Fano 0 for even flow, 0.5 for a 3-vs-1 split") {
    val wNs = 600L * 1000000000L
    val df = ticks(
      // a: 3 ticks then 1 → var/mean = 0.5
      (1L, 0L, "a", 1.0, "{}"), (2L, 1000L, "a", 1.0, "{}"),
      (3L, 2000L, "a", 1.0, "{}"), (4L, wNs, "a", 1.0, "{}"),
      // b: 2 and 2 → 0
      (5L, 0L, "b", 1.0, "{}"), (6L, 1000L, "b", 1.0, "{}"),
      (7L, wNs, "b", 1.0, "{}"), (8L, wNs + 1000L, "b", 1.0, "{}"))
    val r = MarketStats.tickBurstiness(df).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getLong(2))).toMap
    assert(r("a") == (0.5, 2L) && r("b") == (0.0, 2L))
  }

  test("retMoments equals a scalar moment computation; constant series NULL") {
    val dayNs = 86400L * 1000000000L
    val closes = Seq(1.00, 2.00, 1.00, 2.00, 1.00, 3.00)
    val df = ticks(closes.zipWithIndex.map { case (v, i) =>
      (i + 1L, i * dayNs, "a", v, "{}")
    } ++ (0 to 2).map(i => (10L + i, i * dayNs, "b", 5.00, "{}")): _*)
    val r = MarketStats.retMoments(df).collect()
      .map(x => x.getString(0) -> x).toMap
    // scalar reference over the known micro-returns
    val cents = closes.map(v => math.round(v * 100))
    val xs = cents.sliding(2).map { case Seq(p, c) =>
      math.floor((c - p) * 1000000.0 / p) }.toSeq
    val n = xs.length.toDouble
    val (s1, s2, s3, s4) = (xs.sum, xs.map(x => x * x).sum,
      xs.map(x => x * x * x).sum, xs.map(x => x * x * x * x).sum)
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
    val m4 = s4 / n - 4.0 * mean * (s3 / n) +
      6.0 * mean * mean * (s2 / n) - 3.0 * mean * mean * mean * mean
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("a").getDouble(1) == r6(m3 / (m2 * math.sqrt(m2))))
    assert(r("a").getDouble(2) == r6(m4 / (m2 * m2) - 3.0))
    assert(r("a").getLong(3) == 5L)
    assert(r("b").isNullAt(1) && r("b").isNullAt(2)) // zero variance
  }

  test("leadLagCorr sees b leading a at one window lag, asymmetrically") {
    val wNs = 600L * 1000000000L
    // b posts 1,2,4,8 in windows 0..3; a = 10 − previous b in 1..3
    val rows =
      Seq(1.0, 2.0, 4.0, 8.0).zipWithIndex.map { case (v, i) =>
        (10L + i, i * wNs, "b", v, "{}")
      } ++ Seq(9.0, 8.0, 6.0).zipWithIndex.map { case (v, i) =>
        (20L + i, (i + 1) * wNs, "a", v, "{}")
      }
    val r = MarketStats.leadLagCorr(ticks(rows: _*)).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getDouble(2), x.getLong(3))).toMap
    assert(r(("a", "b")) == (-1.0, 3L)) // a_t = 10 − b_{t−1}, 3 pairs
    assert(r(("b", "a")) == (-1.0, 2L)) // two points are collinear
  }

  test("pairCorrelationDaily keys the same moments by day; a sign flip shows") {
    val wNs = 600L * 1000000000L
    val dayNs = 86400L * 1000000000L
    // day 0: b = 2·a across 3 windows (ρ +1); day 1: b = 10 − a (ρ −1)
    val rows = Seq(1.0, 2.0, 4.0).zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 4 + 1L, i * wNs, "a", v, "{}"),
        (i * 4 + 2L, i * wNs, "b", 2 * v, "{}"),
        (i * 4 + 3L, dayNs + i * wNs, "a", v, "{}"),
        (i * 4 + 4L, dayNs + i * wNs, "b", 10 - v, "{}"))
    }
    val r = MarketStats.pairCorrelationDaily(ticks(rows: _*)).collect()
    val byDay = r.map(x => x.getLong(2) -> x.getDouble(3)).toMap
    assert(byDay == Map(0L -> 1.0, 1L -> -1.0))
    assert(r.forall(x => (x.getString(0), x.getString(1), x.getLong(4))
      == ("a", "b", 3L)))
  }

  test("bollingerBands: constant series has sd 0 and no breakouts; a spike flags") {
    val flat = (1L to 25L).map(i => (i, i * 1000L, "a", 5.00, "{}"))
    val r = MarketStats.bollingerBands(ticks(flat: _*)).collect()
    assert(r.forall(x => x.getDouble(3) == 0.0))
    // mean stays 5.0 → micro 5_000_000 everywhere
    assert(r.forall(_.getLong(2) == 5000000L))
    // a breakout tick far above the band
    val spike = flat :+ ((26L, 26000L, "a", 50.0, "{}"))
    val r2 = MarketStats.bollingerBands(ticks(spike: _*)).collect()
    assert(r2.last.getBoolean(4) && !r2.last.getBoolean(5))
    assert(r2.init.forall(x => !x.getBoolean(4)))
  }

  test("candlePatterns flags doji and engulfing bars") {
    val ns = 600L * 1000000000L
    val df = ticks(
      // bar 0: red body 2.0 → 1.0
      (1L, 0L, "a", 2.00, "{}"), (2L, 1L, "a", 1.00, "{}"),
      // bar 1: green body 0.90 → 2.10 engulfs bar 0's body
      (3L, ns, "a", 0.90, "{}"), (4L, ns + 1, "a", 2.10, "{}"),
      // bar 2: doji — open == close, nonzero range
      (5L, 2 * ns, "a", 1.50, "{}"), (6L, 2 * ns + 1, "a", 3.00, "{}"),
      (7L, 2 * ns + 2, "a", 1.50, "{}"))
    val r = MarketStats.candlePatterns(df).orderBy("window_start").collect()
    assert(r.length == 3)
    assert(r(1).getBoolean(3) && !r(1).getBoolean(4)) // bullish engulfing
    assert(r(2).getBoolean(2)) // doji
    // first bar: no previous → Kleene AND: NULL∧false=false (bullish,
    // since this bar is red), NULL∧true=NULL (bearish)
    assert(!r(0).getBoolean(3) && r(0).isNullAt(4))
  }

  test("sessionOhlc splits on gaps >= the threshold, merges below it") {
    val m = 60L * 1000000000L // one minute in nanos
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"),
      (2L, 29 * m, "a", 2.00, "{}"), // 29 min gap < 30 → same session
      (3L, 60 * m, "a", 3.00, "{}"), // 31 min gap > 30 → new session
      (4L, 90 * m, "a", 4.00, "{}")) // exactly 30 min → NEW (>= boundary)
    val r = MarketStats.sessionOhlc(df).collect()
    assert(r.map(x => (x.getDouble(2), x.getDouble(5), x.getLong(6))).toSeq ==
      Seq((1.00, 2.00, 2L), (3.00, 3.00, 1L), (4.00, 4.00, 1L)))
    // duration is μs of (last − first) within the session
    assert(r(0).getLong(7) == 29 * m / 1000)
  }

  test("hourlySeasonality buckets by UTC hour with exact micro means") {
    val h = 3600L * 1000000000L
    val df = ticks(
      (1L, 0L, "a", 1.00, """{"k": 2}"""),
      (2L, 1000L, "a", 2.00, """{"k": 3}"""),
      (3L, 25 * h, "a", 9.00, """{"k": 1}""")) // next day, hour 1
    val r = MarketStats.hourlySeasonality(df).orderBy("hour_utc").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSeq == Seq((0L, 2L, 5L, 1500000L), (1L, 1L, 1L, 9000000L)))
  }

  test("dailyCloseReturns floors negative returns like the oracle's //") {
    val d = 86400L * 1000000000L
    val df = ticks(
      (1L, 0L, "a", 3.00, "{}"), // day 0 close 3.00
      (2L, d, "a", 1.00, "{}"), // day 1 close 1.00: −2/3 → floor −666667
      (3L, 2 * d, "a", 2.00, "{}")) // day 2: +100% → 1000000
    val r = MarketStats.dailyCloseReturns(df).collect()
    assert(r(0).isNullAt(3)) // no previous close
    assert(r(1).getLong(3) == -666667L) // floor, NOT truncation (-666666)
    assert(r(2).getLong(3) == 1000000L)
  }

  test("ewmaDaily replays the integer α=1/2 recurrence, floors included") {
    val d = 86400L * 1000000000L
    // day 0 closes on the LAST tick (0.02 beats the earlier 9.99 pick);
    // days 1..7 all close 0.01 — the recurrence halves toward 1e6 and
    // first floors at day 7: (1015625 + 1000000) / 2 = 1007812.5 → 1007812
    val rows = Seq((1L, 0L, "a", 9.99, "{}"), (2L, 10L, "a", 0.02, "{}")) ++
      (1 to 7).map(i => ((i + 2).toLong, i * d, "a", 0.01, "{}"))
    val r = MarketStats.ewmaDaily(ticks(rows: _*)).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (0L, 2L, 2000000L), (1L, 1L, 1500000L), (2L, 1L, 1250000L),
      (3L, 1L, 1125000L), (4L, 1L, 1062500L), (5L, 1L, 1031250L),
      (6L, 1L, 1015625L), (7L, 1L, 1007812L)))
    // negative closes: the fold must TRUNCATE toward zero like the
    // oracle's `//` (DuckDB: (-7)//2 = -3) — halving -1e6 toward zero
    // seven times ends at -7812; flooring would end at -7813
    val neg = Seq((1L, 0L, "n", -0.01, "{}")) ++
      (1 to 7).map(i => ((i + 1).toLong, i * d, "n", 0.00, "{}"))
    val rn = MarketStats.ewmaDaily(ticks(neg: _*)).collect()
    assert(rn.last.getLong(3) == -7812L)
  }

  test("macdDaily replays three floor-division EMA chains, hand-verified path") {
    val d = 86400L * 1000000000L
    // closes 100 / 200 / 150 cents; constants verified by scalar replay:
    // day 2: mf=115384615, ms=107407407 → macd 7977208, sg=⌊2·7977208/10⌋
    val rows = Seq((1L, 0L, "a", 1.00, "{}"), (2L, d, "a", 2.00, "{}"),
      (3L, 2 * d, "a", 1.50, "{}"))
    val r = MarketStats.macdDaily(ticks(rows: _*)).collect()
      .map(x => (x.getLong(1), x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (0L, 0L, 0L, 0L),
      (1L, 7977208L, 1595441L, 6381767L),
      (2L, 10147645L, 3305881L, 6841764L)))
    // histogram identity holds on every row by construction
    r.foreach { case (_, macd, sg, hist) => assert(hist == macd - sg) }
  }

  test("cusumDrift's telescoped windows equal the textbook recursion") {
    val path = Seq(5.00, 5.10, 5.05, 9.00, 12.00, 11.90, 15.00, 2.00, 1.00)
    val df = ticks(path.zipWithIndex.map { case (v, i) =>
      (i.toLong, i * 1000L, "a", v, "{}") }: _*)
    val k = 50L; val h = 300L
    val got = MarketStats.cusumDrift(df, kCents = k, hCents = h).collect()(0)
    // scalar recursion S_i = max(0, S_{i-1} + d_i - (+/-)k) on cents
    val cents = path.map(v => math.round(v * 100))
    def run(sign: Long) = {
      var s = 0L; var mx = 0L; var alarms = 0L
      cents.zip(cents.head +: cents.init).foreach { case (c, p) =>
        s = math.max(0L, s + sign * (c - p) - k)
        mx = math.max(mx, s); if (s > h) alarms += 1
      }
      (mx, alarms)
    }
    // NOTE the telescoped form measures vs the day's FIRST tick baseline
    // (S_1 uses d_1 = 0 in the recursion above — same convention)
    assert((got.getLong(2), got.getLong(4)) == run(1L))
    assert((got.getLong(3), got.getLong(5)) == run(-1L))
  }

  test("rsi: SMA form on cent diffs, full-window rows only, flat → NULL") {
    // 15 daily closes for one instrument: alternating +1/−2 cents →
    // after day 15 the trailing-14 window holds 7 gains (+100 total? no:
    // +1 cent = +0.01) — use explicit integers: closes in cents
    val day = 86400L * 1000000000L
    val cents = Seq(10000L, 10100L, 10050L, 10150L, 10100L, 10200L, 10150L,
      10250L, 10200L, 10300L, 10250L, 10350L, 10300L, 10400L, 10350L)
    val df = ticks(cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, i * day, "a", c / 100.0, "{}")
    }: _*)
    val r = MarketStats.rsi(df, n = 14).collect()
    // day idx 14 is the first with 14 diffs: 7 gains ×100, 7 losses ×50
    assert(r.length == 1)
    assert(r(0).getLong(1) == 14L)
    // g=700, l=350 → 700e8 div 1050 = 66666666
    assert(r(0).getLong(2) == 66666666L)
  }

  test("donchian: channel is the PRECEDING frame; breakout flags exact") {
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"),
      (2L, 2000L, "a", 2.00, "{}"),
      (3L, 3000L, "a", 3.00, "{}")) // channel of previous 2 = [1,2] → up
    val r = MarketStats.donchianChannels(df, n = 2).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L)
    assert(r(0).getBoolean(5) && !r(0).getBoolean(6))
  }

  test("atr: first bar seeds TR=high−low; later bars use prev close") {
    val ns = 600L * 1000000000L
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"), (2L, 1L, "a", 2.00, "{}"), // bar0 h2 l1 c2
      (3L, ns, "a", 5.00, "{}"), (4L, ns + 1, "a", 4.00, "{}")) // bar1 h5 l4 c4
    val r = MarketStats.atr(df, n = 14).orderBy("window_start").collect()
    // bar0 TR=1.00; bar1 TR=max(1, |5−2|, |4−2|)=3 → ATR=(1+3)/2=2
    assert(r.map(_.getLong(2)).toSeq == Seq(1000000L, 2000000L))
    assert(r.map(_.getLong(3)).toSeq == Seq(1L, 2L))
  }

  test("order flow: tick rule with zero-tick inheritance; first tick neutral") {
    val df = ticks(
      (1L, 1000L, "a", 1.00, """{"k": 10}"""), // no prior change → 0
      (2L, 2000L, "a", 2.00, """{"k": 3}"""), // uptick → +3
      (3L, 3000L, "a", 2.00, """{"k": 5}"""), // zero-tick inherits + → +5
      (4L, 4000L, "a", 1.50, """{"k": 2}""")) // downtick → −2
    val r = MarketStats.orderFlowImbalance(df).collect()
    assert(r.length == 1)
    val Row(_, _, imb, buy, sell, n) = r(0)
    assert((imb, buy, sell, n) == (6L, 8L, 2L, 4L))
  }

  test("amihud: |ret|·1000 div volume; first day and zero volume NULL") {
    val day = 86400L * 1000000000L
    val df = ticks(
      (1L, 0L, "a", 100.00, """{"k": 4}"""),
      (2L, day, "a", 101.00, """{"k": 5}""")) // ret=+10000 μ, vol=5
    val r = MarketStats.amihudIlliquidity(df).orderBy("day").collect()
    assert(r(0).isNullAt(4)) // first day: no return
    assert(r(1).getLong(4) == 10000L * 1000L / 5L)
  }

  test("markout: first tick ≥ t+30s, integer cents, NULL past series end") {
    val s = 1000000000L // 1s in ns
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"),
      (2L, 29L * s, "a", 2.00, "{}"), // 29s: not yet the 30s future of t=0
      (3L, 31L * s, "a", 1.50, "{}"), // first ≥ 30s for tick 1
      (4L, 70L * s, "a", 9.00, "{}"))
    val r = MarketStats.markout(df).orderBy("event_id").collect()
    // tick1 → tick3 (+50c); tick2 → tick4 (59s≥... 29+30=59 ≤ 70 → tick4)
    assert(r(0).getLong(4) == 50L)
    assert(r(1).getLong(4) == 700L)
    assert(r(2).getLong(4) == 750L) // 31+30=61 ≤ 70 → tick4
    assert(r(3).isNullAt(4)) // nothing ≥ 100s
  }

  test("loader truncates ts_ns to μs; μs timestamps are collision-free") {
    // The DuckDB oracle can only observe μs (its parquet reader truncates
    // TIMESTAMP(NANOS)); the corpus DOES carry sub-μs nanos. Tables.events
    // therefore serves ts_ns μs-ALIGNED so every ordering, bucket edge,
    // gap threshold, and duration sum agrees with the oracle exactly —
    // assert both the truncation and the collision-freedom that makes the
    // truncated order equal to the raw order (so the loader change could
    // not have perturbed any previously-verified pick).
    val ev = Tables.events(spark, sf0001)
    assert(ev.where(expr("ts_ns % 1000 != 0")).isEmpty,
      "ts_ns must be μs-aligned (oracle-observable resolution)")
    val dupUs = ev.groupBy(expr("ts_ns div 1000")).count()
      .where(col("count") > 1).count()
    assert(dupUs == 0L,
      s"$dupUs μs instants hold >1 event — truncated order would need " +
        "tiebreaks the raw order didn't")
  }

  test("ohlcBars is ONE hash aggregate: single exchange, no window sorts") {
    val p = MarketStats.ohlcBars(Tables.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"OHLC must be one partial→final aggregate shuffle:\n$p")
    assert(!p.contains("Window"),
      s"min_by/max_by replaced the window sorts — none may remain:\n$p")
  }

  test("market stats agree with the sf0.001 brute force") {
    val ev = Tables.events(spark, sf0001)
    // drawdown cross-check: driver-side scalar fold over the sorted path
    val path = ev.select("event_type", "ts_ns", "event_id", "value")
      .orderBy("event_type", "ts_ns", "event_id")
      .collect().groupBy(_.getString(0))
    val expect = path.map { case (t, rows) =>
      var peak = Double.MinValue; var dd = 0.0
      rows.foreach { r =>
        val v = r.getDouble(3); peak = math.max(peak, v)
        dd = math.max(dd, (peak - v) / peak)
      }
      t -> BigDecimal(dd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = MarketStats.maxDrawdown(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("rangeVolatility: hand-evaluated Parkinson and Garman–Klass") {
    // one day: O=100, H=121, L=100, C=110 cents
    // ln(121/100)·1e6 → 190620, ln(110/100)·1e6 → 95310
    // P = ⌊190620²/(4·ln2)/1e6⌋ = 13105; GK = ⌊(0.5·190620² −
    //   (2·ln2−1)·95310²)/1e6⌋ = 14658 — all safely off grid lines
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"),
      (2L, 2000L, "a", 1.21, "{}"),
      (3L, 3000L, "a", 1.10, "{}"))
    val r = MarketStats.rangeVolatility(df).collect()
    assert(r.length == 1)
    val Row(_, _, n, lhl, lco, park, gk) = r(0)
    assert((n, lhl, lco, park, gk) == (3L, 190620L, 95310L, 13105L, 14658L))
  }

  test("rangeVolatility: flat day scores zero, not NULL") {
    val df = ticks((1L, 1000L, "a", 1.00, "{}"), (2L, 2000L, "a", 1.00, "{}"))
    val r = MarketStats.rangeVolatility(df).collect()
    assert(r(0).getLong(3) == 0L && r(0).getLong(5) == 0L &&
      r(0).getLong(6) == 0L)
  }

  test("varianceRatio: constant returns give VR = q exactly") {
    // closes double daily → ret_micro = 1_000_000 every day; the
    // uncentered VR of a constant series is exactly q (= 5 → 5e6 micro)
    val day = 86400L * 1000000000L
    val df = ticks((0L to 6L).map(d =>
      (d + 1, d * day + 1000L, "a", 100.0 * (1L << d.toInt), "{}")): _*)
    val r = MarketStats.varianceRatio(df).collect()
    assert(r.length == 1 && r(0).getLong(1) == 6L &&
      r(0).getLong(2) == 5000000L)
  }

  test("varianceRatio: series shorter than q emits NULL") {
    val day = 86400L * 1000000000L
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"),
      (2L, day + 1000L, "a", 1.10, "{}"))
    val r = MarketStats.varianceRatio(df).collect()
    assert(r.length == 1 && r(0).isNullAt(2))
  }

  test("marketBeta: a 2× levered instrument shows beta 2× the other") {
    // r_a = {0.1, 0.3}, r_b = {0.2, 0.6} → mkt = {0.15, 0.45};
    // β_a = 2/3 (truncated 666666 micro), β_b = 4/3; both ρ = 1
    val day = 86400L * 1000000000L
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"),
      (2L, day + 1000L, "a", 1.10, "{}"),
      (3L, 2 * day + 1000L, "a", 1.43, "{}"),
      (4L, 1000L, "b", 1.00, "{}"),
      (5L, day + 1000L, "b", 1.20, "{}"),
      (6L, 2 * day + 1000L, "b", 1.92, "{}"))
    val r = MarketStats.marketBeta(df).orderBy("event_type").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(666666L, 1333333L))
    assert(r.map(_.getDouble(3)).toSeq == Seq(1.0, 1.0))
  }

  test("retAcf at lag 1 equals retAutocorr exactly") {
    val ev = Tables.events(spark, sf0001)
    val acf1 = MarketStats.retAcf(ev).collect()
      .filter(_.getLong(1) == 1L)
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val auto = MarketStats.retAutocorr(ev).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(acf1 == auto)
  }

  test("hurstRs matches a scalar fold over the daily return series") {
    val ev = Tables.events(spark, sf0001)
    val rets = MarketStats.dailyCloseReturns(ev).collect()
      .filter(!_.isNullAt(3)).groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq }
    val expect = (for {
      (t, rs) <- rets.toSeq; n <- Seq(8, 16, 32)
      blocks = rs.grouped(n).filter(_.length == n).toSeq
      rsm = blocks.flatMap { b =>
        val s = b.map(BigInt(_)).sum
        val cums = b.scanLeft(BigInt(0))((a, r) => a + BigInt(r)).tail
        val xs = cums.zipWithIndex.map { case (c, i0) =>
          BigInt(n) * c - BigInt(i0 + 1) * s }
        val den = BigInt(n) * b.map(r => BigInt(r) * BigInt(r)).sum - s * s
        if (den > 0)
          Some(math.floor((xs.max - xs.min).toDouble /
            math.sqrt(den.toDouble) * 1e6).toLong)
        else None
      }
      if rsm.nonEmpty
    } yield (t, n.toLong) -> (rsm.length.toLong, rsm.sum / rsm.length)).toMap
    val got = MarketStats.hurstRs(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
  }

  test("markoutCurve: signed markouts per horizon, toward-zero mean") {
    val s = 1000000000L
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"),       // sign 0
      (2L, 2L * s, "a", 1.10, "{}"),   // up-tick +1
      (3L, 10L * s, "a", 1.05, "{}"))  // down-tick −1, no future
    val r = MarketStats.markoutCurve(df, horizons = Seq(1L, 5L))
      .orderBy("horizon_sec").collect()
    // h=1: tick1→110 (sign 0 ⇒ 0), tick2→105 (+1·−5), tick3 unmarked
    //   → n 2, sum −5, mean trunc(−2.5e6) = −2500000
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) == (1L, 2L, -5L, -2500000L))
    // h=5: tick1→105 (0), tick2→105 (−5) → same aggregate
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3),
      r(1).getLong(4)) == (5L, 2L, -5L, -2500000L))
  }

  test("theilSenTrend: discrete lower median of pairwise slopes") {
    // closes 100, 200, 150 cents → slopes {1e8, 25e6, −50e6};
    // sorted median (rn 2 of 3) = 25e6 — a value that exists
    val day = 86400L * 1000000000L
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"),
      (2L, day + 1000L, "a", 2.00, "{}"),
      (3L, 2 * day + 1000L, "a", 1.50, "{}"))
    val r = MarketStats.theilSenTrend(df).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L &&
      r(0).getLong(2) == 25000000L)
  }

  test("drawdownDurations: gaps-and-islands spells below the prior peak") {
    val day = 86400L * 1000000000L
    val closes = Seq(1.00, 0.90, 0.95, 1.20, 1.10, 1.05, 1.30)
    val df = ticks(closes.zipWithIndex.map { case (v, i) =>
      (i + 1L, i * day + 1000L, "a", v, "{}")
    } :+ (100L, 1000L, "b", 1.00, "{}") :+ (101L, day + 1000L, "b", 1.10, "{}"): _*)
    val r = MarketStats.drawdownDurations(df).orderBy("event_type").collect()
    // a: underwater days {90,95},{110,105} → 4 days, 2 spells, longest 2
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == (4L, 2L, 2L))
    // b never dips → zeros
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == (0L, 0L, 0L))
  }

  test("rollSpread: pure bid-ask bounce recovers a positive spread") {
    // cents 100,102,100,102,100 → Δ = +2,−2,+2,−2; serial pairs n=3,
    // num = 3·(−12) − (−2)(+2) = −32 < 0 → 2·√(32/9) = 3.771236
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"), (2L, 2000L, "a", 1.02, "{}"),
      (3L, 3000L, "a", 1.00, "{}"), (4L, 4000L, "a", 1.02, "{}"),
      (5L, 5000L, "a", 1.00, "{}"))
    val r = MarketStats.rollSpread(df).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L &&
      r(0).getDouble(2) == 3.771236)
  }

  test("rollSpread: trending prices (nonnegative cov) emit NULL") {
    val df = ticks(
      (1L, 1000L, "a", 1.00, "{}"), (2L, 2000L, "a", 1.02, "{}"),
      (3L, 3000L, "a", 1.04, "{}"), (4L, 4000L, "a", 1.06, "{}"))
    val r = MarketStats.rollSpread(df).collect()
    assert(r.length == 1 && r(0).isNullAt(2))
  }

  test("volSignature: per-frequency bar returns square-sum exactly") {
    val s = 1000000000L
    val df = ticks(
      (1L, 0L, "a", 1.00, "{}"),
      (2L, 61L * s, "a", 1.10, "{}"),
      (3L, 121L * s, "a", 1.05, "{}"))
    val r = MarketStats.volSignature(df, freqs = Seq(60L, 120L))
      .orderBy("freq_sec").collect()
    // 60 s bars: closes 100,110,105 → r = +10,−5 → rv 125 over 2 bars
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      (60L, 2L, 125L))
    // 120 s bars: closes 110,105 → r = −5 → rv 25 over 1 bar
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) ==
      (120L, 1L, 25L))
  }

  test("vpinBuckets: tick-rule signs inherit and buckets cut on volume") {
    val df = ticks(
      (1L, 1000L, "a", 1.00, """{"k": 4}"""), // no prior price → sign 0
      (2L, 2000L, "a", 1.10, """{"k": 4}"""), // up-tick → +1
      (3L, 3000L, "a", 1.05, """{"k": 4}"""), // down-tick → −1
      (4L, 4000L, "a", 1.05, """{"k": 5}"""), // unchanged → inherits −1
      (5L, 5000L, "a", 1.20, """{"k": 7}""")) // up-tick → +1
    val r = MarketStats.vpinBuckets(df, bucketVol = 10L)
      .orderBy("bucket").collect()
    assert(r.length == 2)
    // bucket 0 (cumPrev 0,4,8): buy 4, sell 4, imb 0
    val Row(_, b0, buy0, sell0, vol0, n0, imb0) = r(0)
    assert((b0, buy0, sell0, vol0, n0, imb0) == (0L, 4L, 4L, 12L, 3L, 0L))
    // bucket 1 (cumPrev 12, 17): buy 7, sell 5, imb ⌊2e6/12⌋
    val Row(_, b1, buy1, sell1, vol1, n1, imb1) = r(1)
    assert((b1, buy1, sell1, vol1, n1, imb1) ==
      (1L, 7L, 5L, 12L, 2L, 166666L))
  }
}
