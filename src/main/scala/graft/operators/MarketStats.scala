package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Market-analytics operators over the tick stream (`events` as trades:
 * `event_type` = instrument, `value` = rate, `props.$.k` = size). The
 * reference serves one windowed min/max/avg/median trend query
 * (`trends/listing/service.go:49-63`); this family is the rest of the
 * standard market-data surface a currency-pulse engine is expected to
 * answer — OHLC candles, volume/time-weighted prices, realized
 * variation, drawdown, and cross-pair co-movement.
 *
 * Determinism contract (the driver hash-compares against DuckDB): every
 * aggregate rides exact DECIMAL sums (ticks are 2-decimal doubles, sizes
 * integers, weights integer nanos — all exactly representable), then a
 * single cast-to-double followed by IEEE-deterministic ops (÷, sqrt)
 * produces the float answer. No double is ever SUMMED, so partition
 * order can never perturb a result bit. Tick order is (ts_ns, event_id);
 * the oracle can only observe μs (DuckDB truncates TIMESTAMP(NANOS)), so
 * Tables.events serves ts_ns μs-ALIGNED — orderings, bucket edges, gap
 * thresholds, and duration sums (twap's hold_ns) all see exactly the
 * resolution the oracle sees (asserted in MarketStatsSpec).
 *
 * Scale notes (100 TB): each operator is one shuffle on
 * (instrument[, window]) — uniform keys by construction (windows bound
 * group size; instruments are the natural clustering key the store
 * already sorts by, see graft.store). OHLC's two window orderings share
 * one Exchange (same partition key). Nothing collects to the driver.
 */
object MarketStats {

  private val NanosPerSec = 1000000000L

  /** value is generated with 2 decimals — DECIMAL(8,2) holds it exactly. */
  private def vDec = col("value").cast(DecimalType(8, 2))

  /** Integer `div` (the repo's convention for epoch bucketing — a double
    * `/` would round-trip >2^53 nano-epochs through FP). */
  private def winStart(windowSec: Long) =
    expr(s"ts_ns div ${windowSec * NanosPerSec}") * windowSec

  private def dayIdx = expr(s"ts_ns div ${86400L * NanosPerSec}")

  /** OHLC candlestick bars: per instrument × tumbling window, the first
    * (open) / max (high) / min (low) / last (close) tick and tick count.
    * Open/close are min_by/max_by over the (ts_ns, event_id) struct —
    * the repo's deterministic tick order (same-nanosecond ties broken by
    * id, so the answer is stable across engines, retries, and
    * partitionings) — as O(1)-state declarative aggregates: the whole
    * operator is ONE partial→final hash aggregate with map-side combine
    * and ZERO sorts (a row_number formulation needs two full window
    * sorts; the oracle keeps that form and the hash match proves them
    * equivalent). Same shape as the streaming variant, so batch and
    * stream share semantics by construction. */
  def ohlcBars(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val wstart = winStart(windowSec)
    val ord = struct(col("ts_ns"), col("event_id"))
    events
      .select(col("event_type"), wstart.as("window_start"), col("value"),
        ord.as("ord"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(
        min_by(col("value"), col("ord")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ord")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Volume-weighted average price per instrument × window: Σ(rate·size)
    * ÷ Σ size, sizes pulled from the JSON props (`$.k`, the trade size).
    * rate·size is DECIMAL(8,2)×BIGINT — exact; the price is reported in
    * integer MICRO-units via floor division of the exact totals (the
    * repo's tf·10⁶ div df convention): a float quotient rounded to 6
    * places can land exactly on a .5 boundary — pv/vol is a small-
    * denominator rational, so it DOES in practice — and engines disagree
    * there. Floor on exact integers cannot. One shuffle. */
  def vwap(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val wstart = winStart(windowSec)
    events
      .select(col("event_type"), wstart.as("window_start"), vDec.as("v"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(
        sum(col("v") * col("size")).as("pv"),
        sum(col("size")).as("volume"),
        count(lit(1)).as("n_ticks"))
      // a window can trade zero total size (all ticks k=0) — VWAP is
      // undefined there; NULL, not a 0/0 (ANSI divide would throw)
      .select(col("event_type"), col("window_start"),
        when(col("volume") =!= 0,
          expr("(pv * 1000000) div volume")).as("vwap_micro"),
        col("volume"), col("n_ticks"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Time-weighted average price per instrument × day: each tick is
    * weighted by how long its rate was current (nanos until the next
    * tick in the same day; the day's last tick has no residence interval
    * and drops out — both sides of the oracle agree on that convention).
    * Weights are integer nanos, so Σ(rate·w) is exact DECIMAL; one
    * shuffle on (instrument, day), the lead() rides the same sort. */
  def twap(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    events
      .select(col("event_type"), day, vDec.as("v"), col("ts_ns"),
        col("event_id"))
      .withColumn("hold_ns", lead(col("ts_ns"), 1).over(w) - col("ts_ns"))
      .where(col("hold_ns").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(
        sum(col("v") * col("hold_ns")).as("vw"),
        sum(col("hold_ns")).as("w_ns"),
        count(lit(1)).as("n_ticks"))
      // micro-unit floor price, same rationale as [[vwap]]; w_ns > 0 by
      // construction (a surviving tick has a successor)
      .select(col("event_type"), col("day"),
        expr("(vw * 1000000) div w_ns").as("twap_micro"),
        col("n_ticks"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Realized variation per instrument × day: √Σ(Δrate²) over the day's
    * tick-to-tick moves (absolute, not log, returns — Δ is an exact
    * DECIMAL difference of 2-decimal ticks, so the sum of squares is
    * exact and the single sqrt is IEEE-correctly-rounded: bit-identical
    * across engines, which log returns could not promise since libm log
    * is not required to be correctly rounded). */
  def realizedVariation(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    events
      .select(col("event_type"), day, vDec.as("v"), col("ts_ns"),
        col("event_id"))
      .withColumn("d", col("v") - lag(col("v"), 1).over(w))
      .where(col("d").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(
        round(sqrt(sum(col("d") * col("d")).cast("double")), 6).as("rvar"),
        count(lit(1)).as("n_returns"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Maximum drawdown per instrument: the worst peak-to-trough relative
    * drop along the full tick path. The running max is an exact window
    * aggregate; each per-row (peak − rate) ÷ peak is one IEEE division
    * of exact doubles; max() then picks one exactly — deterministic with
    * no decimal machinery at all. One shuffle on instrument. */
  def maxDrawdown(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_type"), col("value"), col("ts_ns"), col("event_id"))
      .withColumn("peak", max(col("value")).over(w))
      .groupBy(col("event_type"))
      .agg(
        round(max((col("peak") - col("value")) / col("peak")), 6)
          .as("max_drawdown"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"))
  }

  /** OHLC over TRADING SESSIONS instead of fixed windows: maximal tick
    * runs with inter-tick gaps < `gap` (the liquidity-aware bar a
    * 24h-but-bursty currency feed wants — fixed windows straddle dead
    * air). Sessions are the lag/cumsum formulation (boundary flag →
    * running sum) shared with events_sessionize, so the oracle agrees on
    * every boundary; open/close are the usual deterministic rn picks.
    * Two shuffles: the per-instrument session numbering, then the
    * (instrument, session) aggregate. */
  def sessionOhlc(events: DataFrame, gapNs: Long = 1800L * NanosPerSec): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col("event_type"), col("ts_ns"), col("event_id"), col("value"))
      .withColumn("new_s",
        when(lag(col("ts_ns"), 1).over(wOrd).isNull ||
          col("ts_ns") - lag(col("ts_ns"), 1).over(wOrd) >= gapNs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
    val part = Window.partitionBy(col("event_type"), col("sid"))
    val asc = part.orderBy(col("ts_ns").asc, col("event_id").asc)
    val desc = part.orderBy(col("ts_ns").desc, col("event_id").desc)
    sess
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("event_type"), col("sid"))
      .agg(
        expr("min(ts_ns) div 1000").as("session_start_us"),
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_ticks"),
        // micros, not nanos: μs is the repo's portable time resolution
        // (DuckDB's parquet reader truncates TIMESTAMP(NANOS) to μs, so
        // a nano-precision duration is unverifiable — see eventGaps)
        (expr("max(ts_ns) div 1000") - expr("min(ts_ns) div 1000"))
          .as("duration_us"))
      .drop("sid")
      .orderBy(col("event_type"), col("session_start_us"))
  }

  /** Day-over-day close-to-close returns per instrument, in integer
    * micro-fractions. The close is the deterministic last-tick pick; the
    * return is floor((close − prev)·10⁶ / prev) on exact integer CENTS —
    * floor (not div) because returns go negative and `div` truncates
    * toward zero while DuckDB's `//` floors: they disagree on every
    * losing day. The floor of the double quotient is provably the exact
    * floor here (|numerator·denominator| < 4.5e15 keeps the correctly-
    * rounded quotient on the right side of every integer). */
  def dailyCloseReturns(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val wDesc = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
    events
      .select(col("event_type"), day, col("value"), col("ts_ns"),
        col("event_id"))
      .withColumn("rn", row_number().over(wDesc))
      .where(col("rn") === 1)
      .select(col("event_type"), col("day"), col("value").as("close"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("p_cents", lag(col("cents"), 1).over(wLag))
      .select(col("event_type"), col("day"), col("close"),
        expr("CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)")
          .as("ret_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Two-sided CUSUM drift detector per instrument × day — the
    * changepoint alarm a market-surveillance tier runs on the rate
    * series. The textbook recursion S_i = max(0, S_{i-1} + d_i − k)
    * TELESCOPES: with X_i = cents_i − i·k, S_i = X_i − min_{j≤i} X_j —
    * so both sides are prefix-min windows over exact integer cents, not
    * a sequential fold: one shuffle, whole-stage codegen, and
    * bit-portable to the oracle (k in cents per tick absorbs drift; an
    * alarm fires when S crosses h cents). */
  def cusumDrift(events: DataFrame, kCents: Long = 50L,
      hCents: Long = 5000L): DataFrame = {
    val day = dayIdx.as("day")
    val wOrd = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_type"), day, col("ts_ns"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("x_up", col("cents") - col("rn") * kCents)
      .withColumn("x_dn", -col("cents") - col("rn") * kCents)
      .withColumn("s_up", col("x_up") - min(col("x_up")).over(wRun))
      .withColumn("s_dn", col("x_dn") - min(col("x_dn")).over(wRun))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(col("s_up")).as("max_s_up"),
        max(col("s_dn")).as("max_s_dn"),
        sum(when(col("s_up") > hCents, 1L).otherwise(0L)).as("n_alarms_up"),
        sum(when(col("s_dn") > hCents, 1L).otherwise(0L)).as("n_alarms_dn"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Hour-of-day activity profile per instrument — the "pulse" view the
    * reference's product name promises: tick count, traded size, and
    * mean rate (micro-int surrogate) for each UTC hour. Integer bucket
    * arithmetic on raw nanos (no timezone/calendar functions — engines
    * disagree on those), one shuffle onto 24×instruments keys. */
  def hourlySeasonality(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr(s"(ts_ns div ${3600L * NanosPerSec}) % 24").as("hour_utc"),
        vDec.as("v"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("hour_utc"))
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(col("size")).as("volume"),
        sum(col("v")).as("sv"))
      .select(col("event_type"), col("hour_utc"), col("n_ticks"),
        col("volume"), expr("(sv * 1000000) div n_ticks").as("mean_micro"))
      .orderBy(col("event_type"), col("hour_utc"))

  /** Volume profile: traded size per price bin per instrument — where
    * the liquidity sits on the price axis (the market-depth histogram).
    * Map-side bin projection + one aggregate on bounded keys. */
  def volumeProfile(events: DataFrame, binWidth: Double = 10.0): DataFrame =
    events
      .select(col("event_type"),
        expr(s"CAST(floor(value / $binWidth) AS BIGINT)").as("bin"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("size")).as("volume"), count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("bin"))

  /** Bollinger bands over a rolling N-tick window per instrument: rolling
    * mean ± 2σ, with per-tick breakout flags. The window sums (n, Σv,
    * Σv²) are exact DECIMALs over a ROWS frame; mean/σ/band edges are
    * then identical literal double arithmetic on both engines, so the
    * BOOLEAN flags — double comparisons — are bit-deterministic even
    * though the mean itself may not round cleanly (it is reported as the
    * micro-int floor surrogate; σ is irrational, so its 6-dp round is
    * safe). One shuffle on instrument; the rolling frame is O(1) state
    * per tick in the window executor. */
  def bollingerBands(events: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    val cnt = "CAST(cnt AS DOUBLE)"
    val s = "CAST(s AS DOUBLE)"
    val ss = "CAST(ss AS DOUBLE)"
    events
      .select(col("event_type"), col("event_id"), col("value"), vDec.as("v"),
        col("ts_ns"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", sum(col("v")).over(w))
      .withColumn("ss", sum(col("v") * col("v")).over(w))
      // greatest(…, 0): n·Σv² − (Σv)² can land an ulp below zero in
      // double on a near-constant window; both engines clamp the SAME
      // double, so determinism holds
      .withColumn("sd",
        expr(s"sqrt(greatest($cnt * $ss - $s * $s, 0.0)) / $cnt"))
      .select(col("event_type"), col("event_id"),
        expr("(s * 1000000) div cnt").as("mean_micro"),
        round(col("sd"), 6).as("sd"),
        (col("value") > expr(s"$s / $cnt") + lit(2.0) * col("sd"))
          .as("above"),
        (col("value") < expr(s"$s / $cnt") - lit(2.0) * col("sd"))
          .as("below"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Candlestick pattern flags over the OHLC bar series: doji (body ≤
    * 1/10 of the range) and bullish/bearish engulfing (the previous
    * bar's body contained in an opposite-direction body). All flags are
    * comparisons of exact tick values (one multiply for the doji ratio —
    * no division, no rounding), lag() rides the bars' existing
    * (instrument, window) order. The bar series is already ~10⁶× smaller
    * than the ticks, so this stage is free at any scale. */
  def candlePatterns(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("window_start"))
    ohlcBars(events, windowSec)
      .withColumn("p_open", lag(col("open"), 1).over(w))
      .withColumn("p_close", lag(col("close"), 1).over(w))
      .select(col("event_type"), col("window_start"),
        (abs(col("close") - col("open")) * 10.0 <=
          col("high") - col("low")).as("doji"),
        (col("p_close") < col("p_open") && col("close") > col("open") &&
          col("open") <= col("p_close") && col("close") >= col("p_open"))
          .as("bullish_engulfing"),
        (col("p_close") > col("p_open") && col("close") < col("open") &&
          col("open") >= col("p_close") && col("close") <= col("p_open"))
          .as("bearish_engulfing"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** RSI (relative strength index) over daily closes per instrument —
    * the SMA (Cutler) form, not Wilder's exponential smoothing: the
    * recursion doesn't telescope, SMA does, and the two only differ by a
    * smoothing constant. Gains/losses are exact integer cent diffs of
    * the deterministic daily closes; RSI = 100·G/(G+L) is emitted as the
    * micro-percent floor surrogate ((G·1e8) div (G+L)) — exact integer
    * division, no float path at all. Rows appear once a full N-day
    * window exists; flat windows (G+L=0) are NULL. The close series is
    * ~10⁶× smaller than ticks, so the rolling window is free. */
  def rsi(events: DataFrame, n: Int = 14): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wRoll = wLag.rowsBetween(-(n - 1), Window.currentRow)
    dailyCloses(events)
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(wLag))
      .withColumn("gain", when(col("d") > 0, col("d")).otherwise(0L))
      .withColumn("loss", when(col("d") < 0, -col("d")).otherwise(0L))
      .withColumn("g", sum(col("gain")).over(wRoll))
      .withColumn("l", sum(col("loss")).over(wRoll))
      .withColumn("n_win", count(col("d")).over(wRoll))
      .where(col("n_win") === n)
      .select(col("event_type"), col("day"),
        when(col("g") + col("l") =!= 0,
          expr("(g * 100000000) div (g + l)")).as("rsi_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Daily-close EWMA (α = 1/2) per instrument, in exact integer
    * micro-cents — the classic trend line next to [[rsi]]'s oscillator.
    * Recurrence: m_1 = cents_1·10⁶; m_n = (m_{n-1} + cents_n·10⁶) div 2
    * — α = ½ keeps every intermediate an integer division by 2, so the
    * whole series is exact BIGINT and bit-portable (an arbitrary-α EWMA
    * is a cross-row float sum, the shape the determinism ladder
    * forbids).
    *
    * The per-step floor makes the recurrence genuinely sequential:
    * unlike [[cusumDrift]]'s max-recursion (which telescopes to prefix
    * windows), compounding floors admit no closed form, so this is the
    * repo's one justified typed-API fold (`KeyValueGroupedDataset
    * .flatMapGroups`, SURVEY §7 preference (d)) — justified because the
    * fold input is the DAILY-BAR relation (calendar-bounded: years ×
    * 365 rows per instrument, already aggregated by [[dailyCloses]]'s
    * one tick shuffle), never the tick stream; the in-memory per-group
    * sort is bounded by the same calendar. The oracle replays the
    * identical recurrence as a recursive CTE. */
  def ewmaDaily(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    dailyCloses(events)
      .select(col("event_type"), col("day"), col("cents"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (typ: String, it: Iterator[(String, Long, Long)]) =>
        val bars = it.toSeq.sortBy(_._2)
        var m = 0L
        bars.iterator.zipWithIndex.map { case ((_, day, cents), i) =>
          // toward-zero /, matching DuckDB's `//` (verified: (-7)//2 =
          // -3 there — TRUNCATION, not floor; same as market_beta's
          // mixed-sign division convention). floorDiv would diverge on
          // every odd negative intermediate.
          m = if (i == 0) cents * 1000000L
              else (m + cents * 1000000L) / 2L
          (typ, day, cents, m)
        }
      }
      .toDF("event_type", "day", "cents", "ewma_microcents")
      .orderBy(col("event_type"), col("day"))
  }

  /** MACD (moving-average convergence/divergence) on the daily closes —
    * the classic three-EMA momentum indicator: macd = EMA(fast) −
    * EMA(slow) of the close, signal = EMA(signal) of the macd line,
    * histogram = macd − signal. All three recurrences run on exact
    * micro-cent BIGINTs with the increment form
    * m ← m + trunc(2·(x − m) / (n+1)) — TOWARD-ZERO division on either
    * sign (Scala Long `/` ≡ DuckDB `//`, the market_beta mixed-sign
    * convention — DuckDB's `//` truncates: (-7)//2 = -3), so the oracle
    * replays the identical chain in one recursive CTE. Seeding: first
    * close seeds both price EMAs (macd 0), signal seeds at the first
    * macd — the standard first-value convention, documented rather than
    * the SMA-warmup variant. Same shape and scale story as
    * [[ewmaDaily]]: the sequential fold runs per instrument over the
    * day-cardinality bar relation (tick-sized work is the shared
    * dailyCloses aggregate), state is three longs. */
  def macdDaily(events: DataFrame, fast: Int = 12, slow: Int = 26,
      signal: Int = 9): DataFrame =
    macdFromCloses(dailyCloses(events), fast, slow, signal)

  /** The MACD recurrence over an already-elected (event_type, day,
    * cents) close relation — shared with
    * [[graft.streaming.StreamDaily]] so the streaming fold's readout is
    * the identical computation by construction. */
  private[graft] def macdFromCloses(closes: DataFrame, fast: Int = 12,
      slow: Int = 26, signal: Int = 9): DataFrame = {
    val spark = closes.sparkSession
    import spark.implicits._
    closes
      .select(col("event_type"), col("day"), col("cents"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (typ: String, it: Iterator[(String, Long, Long)]) =>
        val bars = it.toSeq.sortBy(_._2)
        var mf = 0L; var ms = 0L; var sg = 0L
        bars.iterator.zipWithIndex.map { case ((_, day, cents), i) =>
          val x = cents * 1000000L
          if (i == 0) { mf = x; ms = x; sg = 0L }
          else {
            mf += 2L * (x - mf) / (fast + 1L)
            ms += 2L * (x - ms) / (slow + 1L)
            val macd = mf - ms
            sg += 2L * (macd - sg) / (signal + 1L)
          }
          (typ, day, cents, mf - ms, sg, mf - ms - sg)
        }
      }
      .toDF("event_type", "day", "cents", "macd_microcents",
        "signal_microcents", "hist_microcents")
      .orderBy(col("event_type"), col("day"))
  }

  /** Donchian channel over a rolling N-tick window per instrument: the
    * highest high / lowest low of the PRECEDING n ticks plus breakout
    * flags for the current tick — pure exact-double max/min comparisons,
    * no arithmetic at all, so bit-portable by construction. Emitted from
    * the (n+1)-th tick of each instrument (a breakout needs a full prior
    * channel). One shuffle on instrument; O(1) state per row. */
  def donchianChannels(events: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
      .rowsBetween(-n, -1)
    events
      .select(col("event_type"), col("event_id"), col("value"),
        col("ts_ns"))
      .withColumn("ch_high", max(col("value")).over(w))
      .withColumn("ch_low", min(col("value")).over(w))
      .withColumn("n_win", count(col("value")).over(w))
      .where(col("n_win") === n)
      .select(col("event_type"), col("event_id"), col("value"),
        col("ch_high"), col("ch_low"),
        (col("value") > col("ch_high")).as("breakout_up"),
        (col("value") < col("ch_low")).as("breakout_dn"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** ATR (average true range) over the 10-min OHLC bar series: true
    * range = greatest(high−low, |high−prevClose|, |low−prevClose|) on
    * exact DECIMAL ticks, averaged over the trailing N full bars as the
    * micro-int floor ((ΣTR·1e6) div n). Rides [[ohlcBars]], so the tick
    * shuffle is shared and this stage runs on the ~10⁶×-smaller bar
    * relation. First bar of each instrument has no prevClose and seeds
    * TR = high−low (the textbook convention). */
  def atr(events: DataFrame, windowSec: Long = 600L, n: Int = 14): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("window_start"))
    val wRoll = wLag.rowsBetween(-(n - 1), Window.currentRow)
    val d = (c: String) => col(c).cast(DecimalType(8, 2))
    ohlcBars(events, windowSec)
      .withColumn("prev_close", lag(d("close"), 1).over(wLag))
      .withColumn("tr",
        when(col("prev_close").isNull, d("high") - d("low"))
          .otherwise(greatest(d("high") - d("low"),
            abs(d("high") - col("prev_close")),
            abs(d("low") - col("prev_close")))))
      .withColumn("s_tr", sum(col("tr")).over(wRoll))
      .withColumn("n_bars", count(col("tr")).over(wRoll))
      .select(col("event_type"), col("window_start"),
        expr("(s_tr * 1000000) div n_bars").as("atr_micro"),
        col("n_bars"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Order-flow imbalance per instrument × hour via the TICK RULE: each
    * trade is signed by the direction of the last price CHANGE (upticks
    * buy, downticks sell, zero-ticks inherit the previous sign — the
    * standard Lee–Ready-without-quotes classification). The carry-
    * forward is last_value(ignore nulls) over the tick order — a window
    * O(1)-state pass, not a recursion. Imbalance = Σ sign·size on exact
    * integers. First ticks (no prior change) stay sign 0 and count as
    * neither side — both engines agree on that convention. */
  def orderFlowImbalance(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val wCarry = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wstart = winStart(windowSec)
    events
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        wstart.as("window_start"), vDec.as("v"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .withColumn("d", col("v") - lag(col("v"), 1).over(wOrd))
      .withColumn("chg_sign",
        when(col("d") > 0, 1L).when(col("d") < 0, -1L)) // 0/null → null
      .withColumn("sign",
        coalesce(last(col("chg_sign"), ignoreNulls = true).over(wCarry),
          lit(0L)))
      .groupBy(col("event_type"), col("window_start"))
      .agg(
        sum(col("sign") * col("size")).cast("long").as("imbalance"),
        sum(when(col("sign") === 1, col("size")).otherwise(0L))
          .cast("long").as("buy_vol"),
        sum(when(col("sign") === -1, col("size")).otherwise(0L))
          .cast("long").as("sell_vol"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Amihud illiquidity per instrument × day: |daily return| per unit of
    * traded size — the price-impact proxy. Both inputs are this family's
    * exact integer surrogates (ret_micro from [[dailyCloseReturns]],
    * volume = Σ props.k), so the ratio is one integer floor division,
    * scaled ×10³ (nano-fractions per unit) to keep resolution. Days with
    * no return (first day) or zero volume are NULL, matching the
    * oracle's CASE. Two group-cardinality relations join on (type, day)
    * — broadcast-sized at any corpus scale. */
  def amihudIlliquidity(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val vol = events
      .select(col("event_type"), day,
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("size")).cast("long").as("volume"))
    dailyCloseReturns(events)
      .join(vol, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("ret_micro"), col("volume"),
        when(col("ret_micro").isNotNull && col("volume") =!= 0,
          expr("(abs(ret_micro) * 1000) div volume")).as("amihud_nano"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Post-trade MARKOUT: each tick's price drift `horizonSec` later —
    * the realized price-impact measure (a systematically negative
    * markout on one's own trades is the adverse-selection red flag).
    * future price = the first tick of the same instrument at or after
    * t + horizon (the forward as-of direction, shifted), so the whole
    * operator is one AsOfJoin.asOfForward pass: one shuffle on the
    * instrument, no per-row range probe. Exact integer cents in and
    * out; NULL markout past the end of the series. Precondition: μs
    * instants are collision-free (loader-asserted), so the forward pick
    * is unique. */
  def markout(events: DataFrame, horizonSec: Long = 30L): DataFrame = {
    val ticks = events.select(col("event_type"),
      expr("ts_ns div 1000").as("tus"),
      expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("fcents"))
    val left = events.select(col("event_id"), col("event_type"),
      expr("ts_ns div 1000 + " + (horizonSec * 1000000L)).as("qus"),
      expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
    AsOfJoin.asOfForward(
      left = left, right = ticks, keyCol = "event_type",
      leftTs = "qus", rightTs = "tus", payloadCol = "fcents",
      as = "future_cents")
      .select(col("event_id"), col("event_type"), col("cents"),
        col("future_cents"),
        (col("future_cents") - col("cents")).as("markout_cents"))
      .orderBy(col("event_id"))
  }

  /** Price-impact DECAY curve per instrument — the tick-rule-signed
    * mean markout at several horizons from one scan: E[sign·(p_{t+h} −
    * p_t)] as h grows is the standard informed-flow read (a curve that
    * starts positive and decays to zero = transient impact / bounce; a
    * curve that grows = flow keeps predicting price, the adverse-
    * selection signature [[markout]]'s single horizon can't show).
    *
    * One signed pass (the [[vpinBuckets]] tick-rule inheritance), the
    * horizon list EXPLODED into the probe side (the [[volSignature]]
    * one-scan lesson), and ONE forward as-of pass serves every
    * (tick, horizon) probe — |horizons| separate joins would rescan
    * the tape. Sums are exact signed cents; the mean is an integral
    * division truncated TOWARD ZERO on both engines (negative means
    * possible — verified Spark `div` ≡ DuckDB `//`). Ticks with no
    * future at the horizon drop out of n_marked.
    *
    * Shape: one shuffle on instrument for the sign pass, one for the
    * union-window as-of (both data-sized but linear); the rollup is
    * instruments × horizons. */
  def markoutCurve(events: DataFrame,
      horizons: Seq[Long] = Seq(1L, 5L, 30L, 120L)): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(col("event_type"), col("event_id"),
      expr("ts_ns div 1000").as("tus"),
      expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
    val signed = base
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(wOrd))
      .withColumn("sign", coalesce(
        last(when(col("d") > 0, 1L).when(col("d") < 0, -1L),
          ignoreNulls = true).over(wRun), lit(0L)))
      .drop("d")
    val left = signed
      .withColumn("horizon_sec", explode(array(horizons.map(lit(_)): _*)))
      .withColumn("qus", col("tus") + col("horizon_sec") * 1000000L)
    val ticks = base.select(col("event_type"), col("tus").as("ftus"),
      col("cents").as("fcents"))
    AsOfJoin.asOfForward(left, ticks, "event_type", "qus", "ftus",
      "fcents", "future_cents")
      .withColumn("m", col("future_cents") - col("cents"))
      .groupBy(col("event_type"), col("horizon_sec"))
      // sum in DECIMAL like rollSpread/volSignature — a plain Long sum
      // wraps silently at corpus scale while the oracle's HUGEINT stays
      // exact
      .agg(count(col("m")).as("n_marked"),
        sum(when(col("m").isNotNull,
          (col("sign") * col("m")).cast(DecimalType(19, 0))))
          .cast(DecimalType(38, 0)).as("ssd"))
      .select(col("event_type"), col("horizon_sec"), col("n_marked"),
        coalesce(col("ssd").cast("long"), lit(0L)).as("signed_sum_cents"),
        when(col("n_marked") > 0,
          expr("CAST((ssd * 1000000) div n_marked AS BIGINT)"))
          .as("mean_signed_micro"))
      .orderBy(col("event_type"), col("horizon_sec"))
  }

  /** Deterministic (event_type, day, close-in-cents) daily close series —
    * the shared prefix of [[dailyCloseReturns]], [[rsi]], and
    * [[amihudIlliquidity]]: last tick of each day by (ts_ns, event_id). */
  private[graft] def dailyCloses(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val wDesc = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    events
      .select(col("event_type"), day, col("value"), col("ts_ns"),
        col("event_id"))
      .withColumn("rn", row_number().over(wDesc))
      .where(col("rn") === 1)
      .select(col("event_type"), col("day"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
  }

  /** Cross-pair co-movement: Pearson correlation of the per-window value
    * totals of every instrument pair, over windows where both traded.
    * The five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact DECIMALs;
    * the textbook formula then runs once in double — identical literal
    * arithmetic on both engines, so no Welford-vs-naive divergence.
    * Buckets-per-pair is a SMALL relation (instruments² × windows), so
    * the pair join broadcasts at any corpus scale; the one data-sized
    * shuffle is the windowed pre-aggregate. */
  def pairCorrelation(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val wstart = winStart(windowSec)
    val buckets = events
      .select(col("event_type"), wstart.as("window_start"),
        vDec.as("v"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(sum(col("v")).cast(DecimalType(19, 2)).as("sv"))
    val a = buckets.select(col("event_type").as("type_a"),
      col("window_start"), col("sv").as("x"))
    val b = buckets.select(col("event_type").as("type_b"),
      col("window_start"), col("sv").as("y"))
    val joined = a.join(b, Seq("window_start"))
      .where(col("type_a") < col("type_b"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    val syy = sum(col("y") * col("y")).cast("double")
    joined
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        // per-factor degenerate guard (see pairCorrelationDaily)
        round(when(
          (n * sxx - sx * sx) > 0.0 && (n * syy - sy * sy) > 0.0,
          (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))), 6)
          .as("corr"),
        count(lit(1)).as("n_windows"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Shared daily bar relation: (event_type, day, high_c, low_c,
    * close_c, volume) — ONE sort-free hash aggregate (close = max_by
    * over the (ts_ns, event_id) tick order) + the daily volume sum,
    * reused by [[moneyFlowIndex]] and [[chaikinAd]]. */
  private def dailyBars(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val ord = struct(col("ts_ns"), col("event_id"))
    val cents = expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)")
    events
      .select(col("event_type"), day, cents.as("cents"), ord.as("ord"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
        max_by(col("cents"), col("ord")).as("close_c"),
        sum(col("size")).cast("long").as("volume"))
  }

  /** Money flow index per instrument × day: the volume-weighted RSI.
    * Typical price rides ×3 (high+low+close — exact cents, no ÷3);
    * each day's scaled flow 3tp·volume joins the positive or negative
    * side by the typical-price direction (unchanged days join neither,
    * the textbook rule), and MFI = posFlow·10⁸ div (posFlow+negFlow)
    * over the trailing 14 full days — the [[rsi]] micro-percent
    * convention. Flow products ride DECIMAL/HUGEINT (day-volume ×
    * cents overflows int64 at exchange scale); everything after
    * [[dailyBars]] runs on the tiny daily relation. */
  def moneyFlowIndex(events: DataFrame, n: Int = 14): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wRoll = wLag.rowsBetween(-(n - 1), Window.currentRow)
    dailyBars(events)
      .withColumn("tp3", col("high_c") + col("low_c") + col("close_c"))
      .withColumn("d", col("tp3") - lag(col("tp3"), 1).over(wLag))
      .withColumn("flow",
        col("tp3").cast(DecimalType(38, 0)) * col("volume"))
      .withColumn("pos",
        when(col("d") > 0, col("flow")).otherwise(lit(0L)))
      .withColumn("neg",
        when(col("d") < 0, col("flow")).otherwise(lit(0L)))
      .withColumn("pf", sum(col("pos")).over(wRoll))
      .withColumn("nf", sum(col("neg")).over(wRoll))
      .withColumn("n_win", count(col("d")).over(wRoll))
      .where(col("n_win") === n)
      .select(col("event_type"), col("day"),
        when(col("pf") + col("nf") =!= 0,
          expr("CAST((pf * 100000000) div (pf + nf) AS BIGINT)"))
          .as("mfi_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Chaikin accumulation/distribution per instrument × day, as an
    * exact-integer surrogate: the close-location value is kept
    * NONNEGATIVE by the +1 shift — mfv' = (2·(close−low)·vol·10⁶) div
    * (high−low) — so the floor division is portable (Spark truncation
    * == oracle floor on nonnegative numerators), then the true signed
    * flow is recovered by subtracting vol·10⁶ AFTER the floor — an
    * identical expression on both engines, so identical bits. Flat days
    * (high = low) contribute 0, the standard convention. The A/D line
    * is the running sum on the tiny daily relation. */
  def chaikinAd(events: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBars(events)
      .withColumn("mfv",
        when(col("high_c") =!= col("low_c"),
          expr("CAST((2 * (close_c - low_c) * CAST(volume AS DECIMAL(38,0))" +
            " * 1000000) div (high_c - low_c)" +
            " - CAST(volume AS DECIMAL(38,0)) * 1000000 AS BIGINT)"))
          .otherwise(lit(0L)))
      .select(col("event_type"), col("day"), col("mfv").as("mfv_micro"),
        sum(col("mfv")).over(wCum).as("ad_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Ulcer index per instrument × day: RMS of the running-peak drawdown
    * over the trailing 14 days — the downside-only volatility measure.
    * Per-day drawdown is the micro-int floor (peak−close)·10⁸ div peak
    * (nonnegative numerator, portable floor) off the prefix-max of the
    * exact cent closes; the trailing mean of squared drawdowns is one
    * more floor on exact integers, and the final sqrt is the single
    * IEEE op (same literal both engines), FLOORED onto the x10^8
    * integer scale the drawdowns already carry — a 6-dp round here
    * would sit a decimal-rounding boundary on an ~10^8-magnitude
    * double, where Spark's BigDecimal-of-shortest-string and the
    * oracle's float rounding disagree by one step (observed); floor of
    * the identical IEEE sqrt cannot. */
  def ulcerIndex(events: DataFrame, n: Int = 14): DataFrame = {
    val wPeak = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRoll = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(n - 1), Window.currentRow)
    dailyCloses(events)
      .withColumn("peak", max(col("cents")).over(wPeak))
      .withColumn("dd",
        expr("((peak - cents) * 100000000) div peak"))
      .withColumn("sq", col("dd").cast(DecimalType(38, 0)) * col("dd"))
      .withColumn("ssq", sum(col("sq")).over(wRoll))
      .withColumn("n_win", count(col("dd")).over(wRoll))
      .where(col("n_win") === n)
      .select(col("event_type"), col("day"),
        expr("CAST(floor(sqrt(CAST(CAST(ssq div n_win AS BIGINT) " +
          "AS DOUBLE))) AS BIGINT)").as("ulcer_x8"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Tick burstiness per instrument: the Fano factor (variance-to-mean
    * ratio) of the per-10-min tick counts over OBSERVED windows — 1 for
    * a Poisson flow, ≫1 for clustered (bursty) arrivals, the cheap
    * Hawkes-clustering diagnostic. Conditional on observed windows by
    * design (the gap-filled variant would hide the regime the statistic
    * measures at sparse instruments). Exact integer moment sums, one
    * literal double evaluation, 6-dp round — the [[pairCorrelation]]
    * determinism pattern; the only data-sized work is the windowed
    * count. */
  def tickBurstiness(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val wstart = winStart(windowSec)
    val counts = events
      .select(col("event_type"), wstart.as("window_start"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("c").cast(DecimalType(19, 0)).as("x"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    counts
      .groupBy(col("event_type"))
      .agg(
        round(when(sx > 0.0, (n * sxx - sx * sx) / (n * sx)), 6)
          .as("fano6"),
        count(lit(1)).as("n_windows"))
      .orderBy(col("event_type"))
  }

  /** On-balance volume per instrument × day: the running sum of each
    * day's traded size signed by that day's close-to-close direction —
    * the classic volume-confirms-price indicator (divergence between
    * OBV and price flags unsustained moves). Rides [[dailyCloses]] plus
    * the same daily volume aggregate as [[amihudIlliquidity]]; the
    * cumulative sum runs on the tiny (instrument × day) relation, so
    * the only data-sized work is the two pre-aggregates. Exact integers
    * end to end; first day (no prior close) and unchanged closes
    * contribute 0, the textbook convention. */
  def obvDaily(events: DataFrame): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wCum = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val day = dayIdx.as("day")
    val vol = events
      .select(col("event_type"), day,
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("size")).cast("long").as("volume"))
    dailyCloses(events)
      .join(vol, Seq("event_type", "day"))
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(wLag))
      .withColumn("step",
        when(col("d") > 0, col("volume"))
          .when(col("d") < 0, -col("volume"))
          .otherwise(lit(0L)))
      .select(col("event_type"), col("day"), col("volume"),
        sum(col("step")).over(wCum).as("obv"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Stochastic oscillator %K per instrument × day: where today's close
    * sits inside the trailing-N-day [lowest low, highest high] band,
    * as the micro-int floor ((close−ll)·10⁶ div (hh−ll)) on exact
    * integer cents — the numerator is nonnegative by construction, so
    * Spark's truncating div and the oracle's floor agree. The daily
    * high/low/close pre-aggregate is ONE sort-free hash aggregate
    * (close = max_by over the (ts_ns, event_id) tick order, the
    * [[ohlcBars]] pattern); the rolling band then runs on the tiny
    * daily relation. Emitted only for full N-day windows, like [[rsi]];
    * NULL when the band is degenerate (hh = ll). */
  def stochasticK(events: DataFrame, n: Int = 14): DataFrame = {
    val day = dayIdx.as("day")
    val ord = struct(col("ts_ns"), col("event_id"))
    val cents = expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)")
    val daily = events
      .select(col("event_type"), day, cents.as("cents"), ord.as("ord"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
        max_by(col("cents"), col("ord")).as("close_c"))
    val wRoll = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(n - 1), Window.currentRow)
    daily
      .withColumn("hh", max(col("high_c")).over(wRoll))
      .withColumn("ll", min(col("low_c")).over(wRoll))
      .withColumn("n_win", count(col("close_c")).over(wRoll))
      .where(col("n_win") === n)
      .select(col("event_type"), col("day"), col("hh"), col("ll"),
        when(col("hh") =!= col("ll"),
          expr("((close_c - ll) * 1000000) div (hh - ll)")).as("k_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Kyle's lambda per instrument: the price-impact slope of the
    * regression Δp ~ λ·(signed volume) over hourly windows — how many
    * cents one unit of net order flow moves the price. x = the tick-rule
    * imbalance from [[orderFlowImbalance]], y = close−open in exact
    * cents from [[ohlcBars]]; the OLS slope (nΣxy−ΣxΣy)/(nΣxx−(Σx)²)
    * rides exact DECIMAL moment sums with ONE literal double evaluation
    * at the end (the [[pairCorrelation]] determinism pattern). Both
    * inputs are hour-cardinality relations, so the join and the final
    * aggregate are broadcast-sized at any corpus scale; NULL when the
    * flow series has zero variance. */
  def kyleLambda(events: DataFrame): DataFrame = {
    val bars = ohlcBars(events, 3600L)
      .select(col("event_type"), col("window_start"),
        expr("CAST(CAST(close AS DECIMAL(8,2)) * 100 AS BIGINT) - " +
          "CAST(CAST(open AS DECIMAL(8,2)) * 100 AS BIGINT)").as("dp"))
    val flow = orderFlowImbalance(events, 3600L)
      .select(col("event_type"), col("window_start"), col("imbalance"))
    val joined = bars.join(flow, Seq("event_type", "window_start"))
      .select(col("event_type"),
        col("imbalance").cast(DecimalType(19, 0)).as("x"),
        col("dp").cast(DecimalType(19, 0)).as("y"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    joined
      .groupBy(col("event_type"))
      .agg(
        round(when(n * sxx - sx * sx > 0.0,
          (n * sxy - sx * sy) / (n * sxx - sx * sx)), 6)
          .as("lambda_cents"),
        count(lit(1)).as("n_windows"))
      .orderBy(col("event_type"))
  }

  /** Lag-1 autocorrelation of daily returns per instrument — the
    * momentum-vs-mean-reversion diagnostic (positive: trends persist;
    * negative: moves revert). Pairs (rₜ, rₜ₋₁) come from ONE lag over
    * [[dailyCloseReturns]]'s integer micro-returns; the Pearson closed
    * form rides exact DECIMAL moment sums with a single literal double
    * evaluation, the [[pairCorrelation]] pattern. Day-cardinality
    * input, so everything after the daily-close pre-aggregate is
    * broadcast-sized. NULL when either margin is constant. */
  def retAutocorr(events: DataFrame): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pairs = dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .select(col("event_type"), col("day"),
        col("ret_micro").cast(DecimalType(19, 0)).as("x"))
      .withColumn("y", lag(col("x"), 1).over(wLag))
      .where(col("y").isNotNull)
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    val syy = sum(col("y") * col("y")).cast("double")
    pairs
      .groupBy(col("event_type"))
      .agg(
        // EACH factor guarded (not their product): float cancellation
        // can land both moments epsilon-negative, where the product test
        // passes and sqrt(neg) is NaN here but an ERROR in DuckDB —
        // degenerate legs are NULL on both engines instead
        round(when(
          (n * sxx - sx * sx) > 0.0 && (n * syy - sy * sy) > 0.0,
          (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))), 6)
          .as("autocorr_lag1"),
        count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"))
  }

  /** Higher return moments per instrument: skewness (crash asymmetry)
    * and excess kurtosis (tail weight) of the daily micro-returns — the
    * two numbers a risk desk reads after variance. Raw power sums
    * Σx..Σx⁴ are exact DECIMAL (micro-return⁴ ≈ 10²⁴ rides 38-digit
    * arithmetic; the oracle's HUGEINT holds the same), then the central-
    * moment closed forms run ONCE in double with the IDENTICAL literal
    * expression on both engines — m2^1.5 spelled m2·sqrt(m2), never
    * pow() (libm pow is not correctly-rounded; sqrt is). NULL when the
    * return series is constant. Day-cardinality input. */
  def retMoments(events: DataFrame): DataFrame = {
    val rets = dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .select(col("event_type"),
        col("ret_micro").cast(DecimalType(19, 0)).as("x"))
    val n = count(lit(1)).cast("double")
    val s1 = sum(col("x")).cast("double")
    val s2 = sum(col("x") * col("x")).cast("double")
    val s3 = sum(col("x") * col("x") * col("x")).cast("double")
    val s4 = sum(col("x") * col("x") * col("x") * col("x")).cast("double")
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - lit(3.0) * mean * (s2 / n) +
      lit(2.0) * mean * mean * mean
    val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) -
      lit(3.0) * mean * mean * mean * mean
    rets
      .groupBy(col("event_type"))
      .agg(
        round(when(m2 > 0.0, m3 / (m2 * sqrt(m2))), 6).as("skew6"),
        round(when(m2 > 0.0, m4 / (m2 * m2) - lit(3.0)), 6).as("kurt6"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"))
  }

  /** Lead–lag cross-correlation: Pearson of instrument a's window total
    * against instrument b's PREVIOUS window total — nonzero at positive
    * lag means b's flow anticipates a's (the price-discovery direction
    * [[pairCorrelation]]'s symmetric ρ cannot see; the matrix is
    * deliberately asymmetric, both (a,b) and (b,a) emitted). Identical
    * exact-moment + one-literal-double-evaluation machinery; the lag
    * join is window-cardinality, broadcast-sized at any corpus scale. */
  def leadLagCorr(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val wstart = winStart(windowSec)
    val buckets = events
      .select(col("event_type"), wstart.as("window_start"), vDec.as("v"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(sum(col("v")).cast(DecimalType(19, 2)).as("sv"))
    val a = buckets.select(col("event_type").as("type_a"),
      col("window_start"), col("sv").as("x"))
    val b = buckets.select(col("event_type").as("type_b"),
      (col("window_start") + windowSec).as("window_start"),
      col("sv").as("y"))
    val joined = a.join(b, Seq("window_start"))
      .where(col("type_a") =!= col("type_b"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    val syy = sum(col("y") * col("y")).cast("double")
    joined
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        // EACH factor guarded (not their product): float cancellation
        // can land both moments epsilon-negative, where the product test
        // passes and sqrt(neg) is NaN here but an ERROR in DuckDB —
        // degenerate legs are NULL on both engines instead
        round(when(
          (n * sxx - sx * sx) > 0.0 && (n * syy - sy * sy) > 0.0,
          (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))), 6)
          .as("corr_lag1"),
        count(lit(1)).as("n_windows"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** ROLLING co-movement: [[pairCorrelation]] keyed additionally by day
    * — the correlation-regime time series risk monitoring actually
    * watches (a stable global ρ can hide a sign flip mid-sample). Same
    * exact-DECIMAL moment sums and one literal closed form per
    * (pair, day); windows-per-day bounds the join input, so the pair
    * join stays broadcast-sized at any corpus scale. Degenerate days
    * (either leg constant across the day's windows) emit NULL — a ÷0
    * each engine would render differently. */
  def pairCorrelationDaily(events: DataFrame,
      windowSec: Long = 600L): DataFrame = {
    val wstart = winStart(windowSec)
    // 86400 % windowSec == 0 for the supported windows, so a window
    // never straddles days and the tick's day IS the window's day
    val buckets = events
      .select(col("event_type"), wstart.as("window_start"),
        dayIdx.as("day"), vDec.as("v"))
      .groupBy(col("event_type"), col("day"), col("window_start"))
      .agg(sum(col("v")).cast(DecimalType(19, 2)).as("sv"))
    val a = buckets.select(col("event_type").as("type_a"), col("day"),
      col("window_start"), col("sv").as("x"))
    val b = buckets.select(col("event_type").as("type_b"), col("day"),
      col("window_start"), col("sv").as("y"))
    val joined = a.join(b, Seq("day", "window_start"))
      .where(col("type_a") < col("type_b"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    val syy = sum(col("y") * col("y")).cast("double")
    joined
      .groupBy(col("type_a"), col("type_b"), col("day"))
      .agg(
        // EACH factor guarded (not their product): float cancellation
        // can land both moments epsilon-negative, where the product test
        // passes and sqrt(neg) is NaN here but an ERROR in DuckDB —
        // degenerate legs are NULL on both engines instead
        round(when(
          (n * sxx - sx * sx) > 0.0 && (n * syy - sy * sy) > 0.0,
          (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))), 6)
          .as("corr"),
        count(lit(1)).as("n_windows"))
      .orderBy(col("type_a"), col("type_b"), col("day"))
  }

  /** Range-based daily volatility estimators per instrument × day —
    * Parkinson (high/low range) and Garman–Klass (range + open/close),
    * the close-to-close-variance alternatives a risk desk prefers when
    * intraday extremes are observable (5–7× more efficient per day of
    * data than squared close returns):
    *
    *   σ²_P  = ln(H/L)² / (4·ln 2)
    *   σ²_GK = 0.5·ln(H/L)² − (2·ln 2 − 1)·ln(C/O)²
    *
    * Determinism: H/L/O/C are exact integer cents (the [[ohlcBars]]
    * min_by/max_by election, so same-nanosecond ties are id-broken
    * identically on both engines); each log term is floored onto the
    * integer micro grid FIRST (the one ln() evaluation carries the
    * repo-wide 1-ulp libm budget), then the estimator combines the
    * EXACT squared integers in one literal double expression and floors
    * once more — no double is summed, no pow() (ln(2) is evaluated from
    * the same literal on both engines). GK can go negative on
    * close-dominated days; floor (not div) keeps the two engines on the
    * same side of zero. Degenerate days (H = L with C = O) emit zeros,
    * not NULLs — a zero range is a zero-volatility observation.
    *
    * Shape at 100 TB: ONE sort-free partial→final hash aggregate to day
    * bars (the [[ohlcBars]] shape), then per-row arithmetic on the tiny
    * (instrument × day) relation. */
  def rangeVolatility(events: DataFrame): DataFrame = {
    val day = dayIdx.as("day")
    val ord = struct(col("ts_ns"), col("event_id"))
    val cents = expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)")
    events
      .select(col("event_type"), day, cents.as("cents"), ord.as("ord"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("cents"), col("ord")).as("open_c"),
        max(col("cents")).as("high_c"),
        min(col("cents")).as("low_c"),
        max_by(col("cents"), col("ord")).as("close_c"),
        count(lit(1)).as("n_ticks"))
      // a zero-priced day (low_c or open_c = 0 — present at sf0.1) makes
      // the log-range undefined: guard to NULL on BOTH engines. Without
      // the guard ANSI Spark THROWS on ln(0) while DuckDB returns -inf —
      // an engine divergence, not just a bad row.
      .withColumn("lhl_micro", expr(
        """CASE WHEN low_c > 0 THEN
          |CAST(floor(ln(CAST(high_c AS DOUBLE) / CAST(low_c AS DOUBLE))
          | * 1000000.0) AS BIGINT) END""".stripMargin))
      .withColumn("lco_micro", expr(
        """CASE WHEN open_c > 0 AND close_c > 0 THEN
          |CAST(floor(ln(CAST(close_c AS DOUBLE) / CAST(open_c AS DOUBLE))
          | * 1000000.0) AS BIGINT) END""".stripMargin))
      .select(col("event_type"), col("day"), col("n_ticks"),
        col("lhl_micro"), col("lco_micro"),
        expr(
          """CAST(floor(CAST(lhl_micro * lhl_micro AS DOUBLE)
            | / (4.0 * ln(2.0)) / 1000000.0) AS BIGINT)""".stripMargin)
          .as("parkinson_micro"),
        expr(
          """CAST(floor((0.5 * CAST(lhl_micro * lhl_micro AS DOUBLE)
            | - (2.0 * ln(2.0) - 1.0) * CAST(lco_micro * lco_micro AS DOUBLE))
            | / 1000000.0) AS BIGINT)""".stripMargin)
          .as("gk_micro"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Lo–MacKinlay variance ratio VR(q) per instrument over the daily
    * micro-return series — the classic random-walk test: VR ≈ 1 under
    * i.i.d. returns, > 1 under momentum (q-day variance grows faster
    * than q·daily), < 1 under mean reversion. The UNCENTERED variant
    * (raw second moments, no mean subtraction) — daily-return means are
    * ~0 and centering would put a rational mean inside every square,
    * breaking integer exactness; the convention is documented and
    * mirrored in the oracle.
    *
    *   VR(q)·10⁶ = (Σ_t S_t² · n · 10⁶) div (q · Σ_t r_t² · m)
    *
    * where S_t is the q-day rolling return sum (full windows only),
    * n = #days with a return, m = n − q + 1 windows. Every term is an
    * exact integer (returns are [[dailyCloseReturns]] micros; squares
    * and products ride DECIMAL(38,0) / HUGEINT), all nonnegative, so
    * the single integral division is floor on both engines. NULL when
    * the return series is all-zero or shorter than q days.
    *
    * Shape: everything after the daily-close pre-aggregate runs on the
    * (instrument × day) relation — the rolling sum is a bounded window
    * over it, the moments one tiny hash aggregate. */
  def varianceRatio(events: DataFrame, q: Int = 5): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wRoll = wOrd.rowsBetween(-(q - 1), 0)
    dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .select(col("event_type"), col("day"),
        col("ret_micro").cast(DecimalType(19, 0)).as("r"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("s_q",
        when(col("rn") >= q, sum(col("r")).over(wRoll)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("r") * col("r")).cast(DecimalType(38, 0)).as("s1"),
        sum(col("s_q") * col("s_q")).cast(DecimalType(38, 0)).as("sq"),
        count(col("s_q")).as("m"))
      .select(col("event_type"), col("n_days"),
        when(col("m") >= 1 && col("s1") > 0, expr(
          s"""CAST((sq * n_days * 1000000) div ($q * s1 * m) AS BIGINT)"""))
          .as("vr_micro"))
      .orderBy(col("event_type"))
  }

  /** Full-sample market beta and correlation per instrument vs the
    * equal-weighted market return — the index-model decomposition
    * (systematic vs idiosyncratic risk) every cross-sectional desk
    * runs. The market day-return is the equal-weighted mean of that
    * day's instrument returns (the instrument itself INCLUDED, the
    * index-beta convention), floored onto the integer NANO grid so it
    * shuffles as an exact integer:
    *
    *   mkt_nano(d) = floor(Σ_i r_i(d) · 1000 / k(d)),  r in micros
    *
    * β rides the OLS closed form on exact DECIMAL(38,0) moment sums
    * with ONE integral division at the end — num·10⁶ div den, both
    * engines truncating toward zero (verified: Spark's `div` and
    * DuckDB's HUGEINT `//` agree on negatives — the numerator CAN be
    * negative for an anti-cyclical instrument, so the toward-zero
    * convention is documented rather than floor). ρ reuses the same
    * sums through the [[pairCorrelation]] literal-double closed form.
    *
    * Shape: day-cardinality everything — the market aggregate and the
    * per-instrument join both run on the (instrument × day) relation;
    * the only data-sized work is the shared daily-close prefix. */
  def marketBeta(events: DataFrame): DataFrame = {
    val rets = dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .select(col("event_type"), col("day"), col("ret_micro"))
    val mkt = rets.groupBy(col("day"))
      .agg(sum(col("ret_micro")).cast("long").as("msum"),
        count(lit(1)).as("k"))
      .select(col("day"), expr(
        "CAST(floor(CAST(msum AS DOUBLE) * 1000.0 / k) AS BIGINT)")
        .as("mkt_nano"))
    val joined = rets.join(broadcast(mkt), "day")
      .select(col("event_type"),
        col("mkt_nano").cast(DecimalType(19, 0)).as("x"),
        (col("ret_micro") * 1000).cast(DecimalType(19, 0)).as("y"))
    val n = count(lit(1)).cast(DecimalType(38, 0))
    val sx = sum(col("x")).cast(DecimalType(38, 0))
    val sy = sum(col("y")).cast(DecimalType(38, 0))
    val sxy = sum(col("x") * col("y")).cast(DecimalType(38, 0))
    val sxx = sum(col("x") * col("x")).cast(DecimalType(38, 0))
    val syy = sum(col("y") * col("y")).cast(DecimalType(38, 0))
    joined
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        (n * sxy - sx * sy).as("num"),
        (n * sxx - sx * sx).as("den"),
        round(when(
          // the positivity check multiplies in DOUBLE — the product of
          // two ~1e21 DECIMAL(38,0) variances overflows 38 digits
          (n * sxx - sx * sx).cast("double") *
            (n * syy - sy * sy).cast("double") > 0.0,
          (n * sxy - sx * sy).cast("double") /
            (sqrt((n * sxx - sx * sx).cast("double")) *
              sqrt((n * syy - sy * sy).cast("double")))), 6)
          .as("corr6"))
      .select(col("event_type"), col("n_days"),
        when(col("den") > 0,
          expr("CAST((num * 1000000) div den AS BIGINT)")).as("beta_micro"),
        col("corr6"))
      .orderBy(col("event_type"))
  }

  /** Multi-lag autocorrelation function of daily returns per instrument
    * — the generalization of [[retAutocorr]] a desk actually plots: ACF
    * at lags 1..maxLag, the momentum-decay profile (how many days a
    * move keeps predicting). Lags are OBSERVATION lags (previous trading
    * day in the series, the [[retAutocorr]] convention), realized by a
    * row_number self-join rather than `lag()` so ONE exploded relation
    * serves every lag — the volSignature one-scan lesson on the
    * day-cardinality frame. Same exact-DECIMAL moment sums + one
    * literal-double Pearson evaluation per (instrument, lag); NULL on
    * degenerate margins. Output is instruments × maxLag rows. */
  def retAcf(events: DataFrame, maxLag: Int = 5): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val rets = dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .withColumn("rn", row_number().over(wOrd))
      .select(col("event_type"), col("rn"),
        col("ret_micro").cast(DecimalType(19, 0)).as("r"))
    val pairs = rets
      .withColumn("lag", explode(array((1 to maxLag).map(lit(_)): _*)))
      .select(col("event_type"), col("lag").cast("long").as("lag"),
        (col("rn") - col("lag")).as("rn_prev"), col("r").as("x"))
      .join(rets.select(col("event_type"), col("rn").as("rn_prev"),
        col("r").as("y")), Seq("event_type", "rn_prev"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("x")).cast("double")
    val sy = sum(col("y")).cast("double")
    val sxy = sum(col("x") * col("y")).cast("double")
    val sxx = sum(col("x") * col("x")).cast("double")
    val syy = sum(col("y") * col("y")).cast("double")
    pairs
      .groupBy(col("event_type"), col("lag"))
      .agg(
        // EACH factor guarded (not their product): float cancellation
        // can land both moments epsilon-negative, where the product test
        // passes and sqrt(neg) is NaN here but an ERROR in DuckDB —
        // degenerate legs are NULL on both engines instead
        round(when(
          (n * sxx - sx * sx) > 0.0 && (n * syy - sy * sy) > 0.0,
          (n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))), 6)
          .as("acf6"),
        count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Hurst rescaled-range table per instrument — mean R/S over
    * consecutive FULL blocks of the daily return series at several
    * block sizes; the long-memory diagnostic (R/S grows ~ n^H: slope
    * ≈ 0.5 random walk, > 0.5 persistent, < 0.5 mean-reverting — the
    * slope is read off this table). Scaled-integer formulation keeps
    * the block mean OUT of the arithmetic: with block sum S and
    * running sums C_i, the cumulative deviation ×n is
    * X_i = n·C_i − i·S (exact BIGINT; X_n = 0 so the 0 anchor is
    * included by construction), R·n = max X − min X, and
    * σ·n = √(n·Σr² − S²) — so R/σ = (max X − min X)/√(n·Σr² − S²)
    * with ONE sqrt + divide per block, micro-floored BEFORE the
    * cross-block mean (which then runs in exact integers — no float
    * sum). Degenerate blocks (constant returns) are skipped; block
    * counts are reported so a thin tail is visible.
    *
    * Shape: everything after the daily-close prefix is day-cardinality;
    * the sizes list explodes inside it (volSignature pattern) and both
    * windows ride the per-(instrument, size, block) sort. */
  def hurstRs(events: DataFrame,
      sizes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val rets = dailyCloseReturns(events)
      .where(col("ret_micro").isNotNull)
      .withColumn("rn", row_number().over(wOrd))
      .select(col("event_type"), col("rn"), col("ret_micro").as("r"))
      .withColumn("block_n", explode(array(sizes.map(s => lit(s.toLong)): _*)))
      .withColumn("blk", expr("(rn - 1) div block_n"))
      .withColumn("i", expr("(rn - 1) % block_n + 1"))
    val wBlk = Window.partitionBy(col("event_type"), col("block_n"),
      col("blk"))
    val wRun = wBlk.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = rets
      .withColumn("c", sum(col("r")).over(wRun))
      .withColumn("s_blk", sum(col("r")).over(wBlk))
      .withColumn("cnt", count(lit(1)).over(wBlk))
      .where(col("cnt") === col("block_n")) // full blocks only
      .withColumn("x", col("block_n") * col("c") - col("i") * col("s_blk"))
      .groupBy(col("event_type"), col("block_n"), col("blk"))
      .agg((max(col("x")) - min(col("x"))).as("r_scaled"),
        (max(col("block_n")).cast(DecimalType(19, 0)) *
          sum(col("r").cast(DecimalType(19, 0)) * col("r")) -
          sum(col("r").cast(DecimalType(19, 0))) *
            sum(col("r").cast(DecimalType(19, 0)))).as("den"))
      .where(col("den") > 0)
      .select(col("event_type"), col("block_n"),
        expr("""CAST(floor(CAST(r_scaled AS DOUBLE)
          | / sqrt(CAST(den AS DOUBLE)) * 1000000.0) AS BIGINT)"""
          .stripMargin).as("rs_micro"))
    blocks
      .groupBy(col("event_type"), col("block_n"))
      .agg(count(lit(1)).as("n_blocks"),
        expr("sum(rs_micro) div count(1)").as("mean_rs_micro"))
      .orderBy(col("event_type"), col("block_n"))
  }

  /** Theil–Sen robust trend per instrument — the median of all pairwise
    * day-close slopes: the estimator a surveillance tier uses when a
    * handful of fat-finger closes would drag OLS (breakdown point 29%
    * vs OLS's zero). Slopes are exact micro floors
    * ⌊(c_j − c_i)·10⁶ / (day_j − day_i)⌋ (double-floor exact at these
    * magnitudes, negative-safe on both engines); the median is the
    * DISCRETE lower median (element ⌈n/2⌉ in slope order — no
    * interpolation, so the pick is a value that exists and the gate is
    * integer-exact; documented convention, mirrored in the oracle).
    *
    * Shape: the O(days²) pair join runs on the day-cardinality close
    * relation — 300 days → 45k pairs per instrument, bounded by the
    * CALENDAR at any corpus size (ticks never pair). */
  def theilSenTrend(events: DataFrame): DataFrame = {
    val daily = dailyCloses(events)
    val slopes = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("""CAST(floor((b.cents - a.cents) * 1000000.0 /
          |  (b.day - a.day)) AS BIGINT)""".stripMargin).as("slope_micro"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope_micro"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .where(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("n").as("n_pairs"),
        col("slope_micro").as("ts_slope_micro"))
      .orderBy(col("event_type"))
  }

  /** Drawdown DURATION statistics per instrument — how LONG the
    * instrument stays underwater, the dimension [[maxDrawdown]]'s depth
    * number misses (a shallow two-year drawdown and a deep two-day one
    * read very differently on a risk desk). A day is underwater when
    * its close sits strictly below the running peak of all prior
    * closes (observation days, the daily-series convention). Runs of
    * consecutive underwater OBSERVATIONS are islands via the
    * rn − rn_underwater gaps-and-islands identity — pure integer
    * window arithmetic, no fold. Reports the number of drawdown
    * spells, the longest spell, and total underwater days; instruments
    * that never dip emit zeros.
    *
    * Shape: everything after the daily-close prefix is
    * day-cardinality; both windows ride the per-instrument day sort. */
  def drawdownDurations(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wPeak = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = dailyCloses(events)
      .withColumn("peak", max(col("cents")).over(wPeak))
      .withColumn("uw",
        when(col("peak").isNotNull && col("cents") < col("peak"), 1L)
          .otherwise(0L))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("ru", sum(col("uw")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spells = flagged
      .where(col("uw") === 1L)
      .withColumn("island", col("rn") - col("ru"))
      .groupBy(col("event_type"), col("island"))
      .agg(count(lit(1)).as("len"))
    flagged.groupBy(col("event_type"))
      .agg(sum(col("uw")).cast("long").as("underwater_days"))
      .join(spells.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_spells"), max(col("len")).as("longest_spell")),
        Seq("event_type"), "left")
      .select(col("event_type"), col("underwater_days"),
        coalesce(col("n_spells"), lit(0L)).as("n_spells"),
        coalesce(col("longest_spell"), lit(0L)).as("longest_spell"))
      .orderBy(col("event_type"))
  }

  /** Roll's implied bid–ask spread per instrument — the classic
    * trades-only microstructure estimator: bid–ask bounce makes
    * consecutive price CHANGES negatively serially correlated, and
    * Roll (1984) inverts that into spread = 2·√(−cov(Δp_t, Δp_{t−1})).
    * The one spread number you can extract with no quote data at all —
    * read next to [[kyleLambda]] (impact) and [[amihudIlliquidity]]
    * (depth). NULL when the serial covariance is nonnegative (the
    * estimator is undefined there — the textbook convention, reported
    * rather than clamped, since a nonnegative cov is itself the signal
    * that trending dominates bounce).
    *
    * Determinism: Δp pairs are exact integer cents off one
    * (ts_ns, event_id)-ordered window pass; the covariance numerator
    * n·Σxy − Σx·Σy rides exact DECIMAL sums and the sign test runs ON
    * the exact integer; only then does ONE literal double expression
    * (divide, sqrt, ×2) produce the 6-dp answer — the
    * [[pairCorrelation]] pattern. Both lags ride the same sort.
    *
    * Shape at 100 TB: one shuffle on instrument, windows in-sort, then
    * a group-cardinality moment aggregate. */
  def rollSpread(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val pairs = events
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(wOrd))
      .withColumn("pd", lag(col("d"), 1).over(wOrd))
      .where(col("d").isNotNull && col("pd").isNotNull)
      .select(col("event_type"),
        col("d").cast(DecimalType(19, 0)).as("x"),
        col("pd").cast(DecimalType(19, 0)).as("y"))
    val n = count(lit(1)).cast(DecimalType(38, 0))
    val num = n * sum(col("x") * col("y")) - sum(col("x")) * sum(col("y"))
    pairs
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(when(num < 0,
          lit(2.0) * sqrt((-num).cast("double") /
            (n * n).cast("double"))), 6).as("roll_spread6"))
      .orderBy(col("event_type"))
  }

  /** Volatility signature plot per instrument — realized variance of
    * bar-close returns at SEVERAL sampling frequencies from one tick
    * scan. The microstructure-noise diagnostic: for a semimartingale
    * price, RV is flat in the sampling frequency; bid–ask bounce makes
    * RV blow up as the interval shrinks, and the frequency where the
    * curve flattens is the highest safe sampling rate for
    * [[realizedVariation]]-style estimators (Andersen et al.'s
    * signature plot).
    *
    * Exact integers end to end: closes are the deterministic max_by
    * tick election in cents, bar returns are integer diffs, RV = Σr²
    * rides DECIMAL then lands in BIGINT cents². Per frequency, bars
    * with no predecessor drop out (n_bars counts the differenced
    * series) — both engines agree via the same lag-over-window shape.
    *
    * Shape at 100 TB: the frequency list EXPLODES inside the one scan
    * (|freqs|× row fan-out into the bar aggregate — one scan, one
    * shuffle keyed (instrument, freq, window)) rather than |freqs|
    * separate scans: at corpus scale the scan dominates, so one pass
    * over the ticks wins even carrying the fan-out. Bar relations and
    * everything after are window-cardinality. */
  def volSignature(events: DataFrame,
      freqs: Seq[Long] = Seq(60L, 300L, 600L, 1800L)): DataFrame = {
    val ord = struct(col("ts_ns"), col("event_id"))
    val wLag = Window.partitionBy(col("event_type"), col("freq_sec"))
      .orderBy(col("window_start"))
    events
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("freq_sec", explode(array(freqs.map(lit(_)): _*)))
      .withColumn("window_start",
        expr("ts_ns div (freq_sec * 1000000000) * freq_sec"))
      .groupBy(col("event_type"), col("freq_sec"), col("window_start"))
      .agg(max_by(col("cents"), ord).as("close_c"))
      .withColumn("r", col("close_c") - lag(col("close_c"), 1).over(wLag))
      .where(col("r").isNotNull)
      .groupBy(col("event_type"), col("freq_sec"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("r").cast(DecimalType(19, 0)) * col("r"))
          .cast("long").as("rv_cents2"))
      .orderBy(col("event_type"), col("freq_sec"))
  }

  /** VPIN-style volume-synchronized flow toxicity per instrument —
    * ticks are signed by the tick rule (up-tick = buy, down-tick =
    * sell, unchanged inherits the last signed direction; leading ticks
    * before any price change carry sign 0), assigned to EQUAL-VOLUME
    * buckets by their exclusive cumulative-volume prefix
    * (bucket = cumPrev div V — volume clock, not wall clock: toxicity
    * concentrates where volume does, Easley/López de Prado/O'Hara),
    * and each bucket reports its absolute buy/sell imbalance as the
    * micro floor |buy − sell|·10⁶ div vol. The bucket series IS the
    * VPIN input (VPIN = rolling mean of imb over buckets); emitting the
    * buckets keeps every downstream window choice open.
    *
    * Exact integers end to end — cents for the tick rule, sizes from
    * the trade-size JSON key, nonnegative micro division. The sign
    * inheritance is last(…, ignoreNulls) over the running tick order
    * ((ts_ns, event_id), the repo's deterministic order), which both
    * engines express natively — no sequential fold.
    *
    * Shape at 100 TB: one shuffle on instrument; the two running
    * windows (sign inheritance, volume clock) ride the SAME
    * per-instrument sort, and the bucket aggregate is a hash agg over
    * bounded groups (V caps bucket volume; tick count per bucket is
    * V / min-size bounded). A per-(instrument, day) key would shard the
    * sort further if a single instrument's history outgrew a partition. */
  def vpinBuckets(events: DataFrame, bucketVol: Long = 2000L): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(wOrd))
      .withColumn("tick_sign",
        when(col("d") > 0, 1L).when(col("d") < 0, -1L))
      .withColumn("sign",
        coalesce(last(col("tick_sign"), ignoreNulls = true).over(wRun),
          lit(0L)))
      .withColumn("cum_prev",
        coalesce(sum(col("size")).over(wPrev), lit(0L)))
      .withColumn("bucket", expr(s"cum_prev div $bucketVol"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        sum(when(col("sign") === 1L, col("size")).otherwise(0L))
          .cast("long").as("buy_vol"),
        sum(when(col("sign") === -1L, col("size")).otherwise(0L))
          .cast("long").as("sell_vol"),
        sum(col("size")).cast("long").as("bucket_vol"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), col("bucket"), col("buy_vol"),
        col("sell_vol"), col("bucket_vol"), col("n_ticks"),
        when(col("bucket_vol") > 0,
          expr("abs(buy_vol - sell_vol) * 1000000 div bucket_vol"))
          .as("imb_micro"))
      .orderBy(col("event_type"), col("bucket"))
  }
}
