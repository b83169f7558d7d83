package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Market family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object MarketAReg {
  // ── Market-analytics family (MarketStats): the standard market-data
  // surface over the tick stream — OHLC candles, volume/time-weighted
  // prices, realized variation, drawdown, cross-pair correlation. All
  // float answers come from exact DECIMAL sums + one IEEE op. ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ohlc_bars" -> ((s, dir) => MarketStats.ohlcBars(Tables.events(s, dir))),
    "vwap_hourly" -> ((s, dir) => MarketStats.vwap(Tables.events(s, dir))),
    "twap_daily" -> ((s, dir) => MarketStats.twap(Tables.events(s, dir))),
    "realized_variation" -> ((s, dir) =>
      MarketStats.realizedVariation(Tables.events(s, dir))),
    "max_drawdown" -> ((s, dir) => MarketStats.maxDrawdown(Tables.events(s, dir))),
    "pair_correlation" -> ((s, dir) =>
      MarketStats.pairCorrelation(Tables.events(s, dir))),
    "pair_correlation_daily" -> ((s, dir) =>
      MarketStats.pairCorrelationDaily(Tables.events(s, dir))),
    "obv_daily" -> ((s, dir) => MarketStats.obvDaily(Tables.events(s, dir))),
    "stochastic_k" -> ((s, dir) =>
      MarketStats.stochasticK(Tables.events(s, dir))),
    "kyle_lambda" -> ((s, dir) =>
      MarketStats.kyleLambda(Tables.events(s, dir))),
    "ret_autocorr" -> ((s, dir) =>
      MarketStats.retAutocorr(Tables.events(s, dir))),
    "money_flow_index" -> ((s, dir) =>
      MarketStats.moneyFlowIndex(Tables.events(s, dir))),
    "chaikin_ad" -> ((s, dir) =>
      MarketStats.chaikinAd(Tables.events(s, dir))),
    "ulcer_index" -> ((s, dir) =>
      MarketStats.ulcerIndex(Tables.events(s, dir))),
    "tick_burstiness" -> ((s, dir) =>
      MarketStats.tickBurstiness(Tables.events(s, dir))),
    "ret_moments" -> ((s, dir) =>
      MarketStats.retMoments(Tables.events(s, dir))),
    "range_volatility" -> ((s, dir) =>
      MarketStats.rangeVolatility(Tables.events(s, dir))),
    "variance_ratio" -> ((s, dir) =>
      MarketStats.varianceRatio(Tables.events(s, dir))),
    "market_beta" -> ((s, dir) =>
      MarketStats.marketBeta(Tables.events(s, dir))),
    "vpin_buckets" -> ((s, dir) =>
      MarketStats.vpinBuckets(Tables.events(s, dir))),
    "roll_spread" -> ((s, dir) =>
      MarketStats.rollSpread(Tables.events(s, dir))),
    "vol_signature" -> ((s, dir) =>
      MarketStats.volSignature(Tables.events(s, dir))),
    "bigram_pmi" -> ((s, dir) => TextAnalysis.bigramPmi(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)),
      tokenTf = Some(tokenTfFor(s, dir)))),
    "ret_acf" -> ((s, dir) =>
      MarketStats.retAcf(Tables.events(s, dir))),
    "hurst_rs" -> ((s, dir) =>
      MarketStats.hurstRs(Tables.events(s, dir))),
    "theil_sen_trend" -> ((s, dir) =>
      MarketStats.theilSenTrend(Tables.events(s, dir))),
    "drawdown_durations" -> ((s, dir) =>
      MarketStats.drawdownDurations(Tables.events(s, dir))),
    "markout_curve" -> ((s, dir) =>
      MarketStats.markoutCurve(Tables.events(s, dir))),
    "lead_lag_corr" -> ((s, dir) =>
      MarketStats.leadLagCorr(Tables.events(s, dir))),
    "trimmed_mean" -> ((s, dir) =>
      EventsOps.trimmedMeanByType(Tables.events(s, dir))),
    "type_pair_lift" -> ((s, dir) =>
      EventsOps.typePairLift(Tables.events(s, dir))),
    "user_communities" -> ((s, dir) =>
      EventsOps.userCommunities(Tables.events(s, dir))),
    "session_stats" -> ((s, dir) =>
      EventsOps.sessionStats(Tables.events(s, dir))),
    "volume_hhi" -> ((s, dir) =>
      EventsOps.volumeHhi(Tables.events(s, dir))),
    "temporal_copresence" -> ((s, dir) =>
      EventsOps.temporalCopresence(Tables.events(s, dir)))
  )

  def sql: Map[String, String] = Map(
    // ── MarketStats oracles: the same exact-DECIMAL-sums + one-IEEE-op
    // recipe, written as literal formulas so both engines compute the
    // identical float. Tick order is (epoch_ns, event_id) throughout. ──
    "ohlc_bars" ->
      """SELECT event_type, window_start,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    value,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_ns(ts) // 600000000000
        |      ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_ns(ts) // 600000000000
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |  FROM events) t
        |GROUP BY event_type, window_start
        |ORDER BY event_type, window_start""".stripMargin,
    // micro-unit floor price (tf·10⁶ div df convention — a float
    // quotient of these small-denominator rationals hits .5 rounding
    // boundaries where engines disagree; integer floor cannot)
    "vwap_hourly" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
        |  CASE WHEN sum(CAST(json_extract(props, '$.k') AS BIGINT)) <> 0 THEN
        |    CAST(CAST(sum(CAST(value AS DECIMAL(8,2)) *
        |          CAST(json_extract(props, '$.k') AS BIGINT)) * 1000000
        |        AS HUGEINT) //
        |      sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    END AS vwap_micro,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS volume,
        |  count(*) AS n_ticks
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "twap_daily" ->
      """SELECT event_type, day,
        |  CAST(CAST(sum(v * hold_ns) * 1000000 AS HUGEINT) //
        |    sum(hold_ns) AS BIGINT) AS twap_micro,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(value AS DECIMAL(8,2)) AS v,
        |    lead(epoch_ns(ts)) OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |      ORDER BY epoch_ns(ts), event_id) - epoch_ns(ts) AS hold_ns
        |  FROM events) t
        |WHERE hold_ns IS NOT NULL
        |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    "realized_variation" ->
      """SELECT event_type, day,
        |  round(sqrt(CAST(sum(d * d) AS DOUBLE)), 6) AS rvar,
        |  count(*) AS n_returns
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(value AS DECIMAL(8,2)) - lag(CAST(value AS DECIMAL(8,2)))
        |      OVER (PARTITION BY event_type, epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts), event_id) AS d
        |  FROM events) t
        |WHERE d IS NOT NULL
        |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    "max_drawdown" ->
      """SELECT event_type,
        |  round(max((peak - value) / peak), 6) AS max_drawdown,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, value,
        |    max(value) OVER (PARTITION BY event_type
        |      ORDER BY epoch_ns(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // forward as-of shifted by the horizon: future price = first tick of
    // the same instrument at or after t+30s; exact integer cents
    // tick-rule-signed markouts at four horizons off one signed pass +
    // one native forward ASOF per probe row; toward-zero integral mean
    "markout_curve" ->
      """WITH t AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), sg AS (
        |  SELECT event_type, ts, event_id, cents,
        |    coalesce(last_value(CASE WHEN d > 0 THEN 1
        |        WHEN d < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sign
        |  FROM (
        |    SELECT *, cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS d
        |    FROM t)
        |), h AS (
        |  SELECT CAST(unnest([1, 5, 30, 120]) AS BIGINT) AS horizon_sec
        |), q AS (
        |  SELECT sg.event_type, sg.cents, sg.sign, h.horizon_sec,
        |    sg.ts + to_microseconds(h.horizon_sec * 1000000) AS qts
        |  FROM sg CROSS JOIN h
        |), j AS (
        |  SELECT q.event_type, q.horizon_sec, q.sign,
        |    f.cents - q.cents AS m
        |  FROM q ASOF LEFT JOIN t f
        |    ON q.event_type = f.event_type AND f.ts >= q.qts
        |)
        |SELECT event_type, horizon_sec, count(m) AS n_marked,
        |  CAST(coalesce(sum(CASE WHEN m IS NOT NULL
        |    THEN CAST(sign AS HUGEINT) * m END), 0) AS BIGINT)
        |    AS signed_sum_cents,
        |  CASE WHEN count(m) > 0 THEN
        |    CAST((coalesce(sum(CASE WHEN m IS NOT NULL
        |      THEN CAST(sign AS HUGEINT) * m END), 0) * 1000000)
        |      // count(m) AS BIGINT) END AS mean_signed_micro
        |FROM j GROUP BY event_type, horizon_sec
        |ORDER BY event_type, horizon_sec""".stripMargin,
    "pair_correlation" ->
      """WITH buckets AS (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b USING (window_start)
        |  WHERE a.event_type < b.event_type
        |)
        |SELECT type_a, type_b,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b
        |ORDER BY type_a, type_b""".stripMargin,
    // per-(pair, day) regime series of the same exact moment sums; NULL
    // where either leg is constant across the day's windows
    "pair_correlation_daily" ->
      """WITH buckets AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2, 3
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, day,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b USING (day, window_start)
        |  WHERE a.event_type < b.event_type
        |)
        |SELECT type_a, type_b, day,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b, day
        |ORDER BY type_a, type_b, day""".stripMargin,
    // running signed-volume sum on exact integers; the cumulative sum
    // widens to HUGEINT in DuckDB → CAST back to BIGINT
    "obv_daily" ->
      """WITH closes AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1
        |), vols AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |      AS volume
        |  FROM events GROUP BY 1, 2
        |), steps AS (
        |  SELECT c.event_type, c.day, v.volume,
        |    CASE WHEN c.cents - lag(c.cents) OVER w > 0 THEN v.volume
        |         WHEN c.cents - lag(c.cents) OVER w < 0 THEN -v.volume
        |         ELSE 0 END AS step
        |  FROM closes c JOIN vols v
        |    ON v.event_type = c.event_type AND v.day = c.day
        |  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.day)
        |)
        |SELECT event_type, day, volume,
        |  CAST(sum(step) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM steps ORDER BY event_type, day""".stripMargin,
    // band position on exact cents; numerator nonnegative so floor (//)
    // and Spark's truncating div agree
    "stochastic_k" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), rolled AS (
        |  SELECT event_type, day, close_c,
        |    max(high_c) OVER wr AS hh, min(low_c) OVER wr AS ll,
        |    count(*) OVER wr AS n_win
        |  FROM daily
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day, hh, ll,
        |  CASE WHEN hh <> ll
        |    THEN (close_c - ll) * 1000000 // (hh - ll) END AS k_micro
        |FROM rolled WHERE n_win = 14 ORDER BY event_type, day""".stripMargin,
    // OLS slope Δp ~ λ·flow: exact integer moment sums (HUGEINT), ONE
    // literal double evaluation — the pair_correlation pattern
    "kyle_lambda" ->
      """WITH bars AS (
        |  SELECT event_type, window_start,
        |    CAST(CAST(max(CASE WHEN rn_d = 1 THEN value END)
        |        AS DECIMAL(8,2)) * 100 AS BIGINT) -
        |      CAST(CAST(max(CASE WHEN rn_a = 1 THEN value END)
        |        AS DECIMAL(8,2)) * 100 AS BIGINT) AS dp
        |  FROM (
        |    SELECT event_type,
        |      epoch_ns(ts) // 3600000000000 * 3600 AS window_start, value,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 3600000000000
        |        ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 3600000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, window_start
        |), flow AS (
        |  SELECT event_type, window_start,
        |    CAST(sum(sign * size) AS BIGINT) AS imbalance
        |  FROM (
        |    SELECT event_type,
        |      epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      coalesce(last_value(chg_sign IGNORE NULLS) OVER wc, 0) AS sign
        |    FROM (
        |      SELECT event_type, ts, event_id, props,
        |        CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END AS chg_sign
        |      FROM (
        |        SELECT event_type, ts, event_id, props,
        |          CAST(value AS DECIMAL(8,2)) -
        |            lag(CAST(value AS DECIMAL(8,2))) OVER
        |              (PARTITION BY event_type
        |               ORDER BY epoch_ns(ts), event_id) AS d
        |        FROM events) a
        |    ) b
        |    WINDOW wc AS (PARTITION BY event_type
        |      ORDER BY epoch_ns(ts), event_id ROWS UNBOUNDED PRECEDING)
        |  ) c
        |  GROUP BY event_type, window_start
        |), xy AS (
        |  SELECT b.event_type, f.imbalance AS x, b.dp AS y
        |  FROM bars b JOIN flow f
        |    ON f.event_type = b.event_type
        |    AND f.window_start = b.window_start
        |)
        |SELECT event_type,
        |  round(CASE WHEN CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
        |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    END, 6) AS lambda_cents,
        |  count(*) AS n_windows
        |FROM xy GROUP BY event_type ORDER BY event_type""".stripMargin,
    // volume-weighted RSI on ×3 typical prices (exact cents, no ÷3);
    // flows ride HUGEINT, micro-percent floor like rsi_daily
    "money_flow_index" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    CAST(sum(size) AS BIGINT) AS volume
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), flows AS (
        |  SELECT event_type, day,
        |    tp3 - lag(tp3) OVER (PARTITION BY event_type ORDER BY day) AS d,
        |    CAST(tp3 AS HUGEINT) * volume AS flow
        |  FROM (SELECT event_type, day, high_c + low_c + close_c AS tp3,
        |    volume FROM daily) b
        |), rolled AS (
        |  SELECT event_type, day,
        |    sum(CASE WHEN d > 0 THEN flow ELSE 0 END) OVER wr AS pf,
        |    sum(CASE WHEN d < 0 THEN flow ELSE 0 END) OVER wr AS nf,
        |    count(d) OVER wr AS n_win
        |  FROM flows
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CASE WHEN pf + nf <> 0
        |    THEN CAST((pf * 100000000) // (pf + nf) AS BIGINT)
        |    END AS mfi_micro
        |FROM rolled WHERE n_win = 14
        |ORDER BY event_type, day""".stripMargin,
    // close-location flow with the +1 shift: floor on a NONNEGATIVE
    // numerator (portable), signed flow recovered after the floor
    "chaikin_ad" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    CAST(sum(size) AS BIGINT) AS volume
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), mfvs AS (
        |  SELECT event_type, day,
        |    CASE WHEN high_c <> low_c
        |      THEN CAST((2 * (close_c - low_c) * CAST(volume AS HUGEINT)
        |          * 1000000) // (high_c - low_c)
        |        - CAST(volume AS HUGEINT) * 1000000 AS BIGINT)
        |      ELSE 0 END AS mfv_micro
        |  FROM daily
        |)
        |SELECT event_type, day, mfv_micro,
        |  CAST(sum(mfv_micro) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ad_micro
        |FROM mfvs ORDER BY event_type, day""".stripMargin,
    // RMS drawdown off the prefix-max closes; ONE IEEE sqrt, floored
    // onto the x10^8 integer scale (a 6-dp round on a ~10^8 double is a
    // cross-engine rounding boundary)
    "ulcer_index" ->
      """WITH closes AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1
        |), dds AS (
        |  SELECT event_type, day,
        |    ((peak - cents) * 100000000) // peak AS dd
        |  FROM (
        |    SELECT event_type, day, cents,
        |      max(cents) OVER (PARTITION BY event_type ORDER BY day
        |        ROWS UNBOUNDED PRECEDING) AS peak
        |    FROM closes) p
        |), rolled AS (
        |  SELECT event_type, day,
        |    sum(CAST(dd AS HUGEINT) * dd) OVER wr AS ssq,
        |    count(*) OVER wr AS n_win
        |  FROM dds
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CAST(floor(sqrt(CAST(CAST(ssq // n_win AS BIGINT) AS DOUBLE)))
        |    AS BIGINT) AS ulcer_x8
        |FROM rolled WHERE n_win = 14
        |ORDER BY event_type, day""".stripMargin,
    // Fano factor of observed-window tick counts: exact moments, one
    // literal double evaluation
    "tick_burstiness" ->
      """WITH counts AS (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 AS w,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type,
        |  round(CASE WHEN CAST(sum(c) AS DOUBLE) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(c * c) AS DOUBLE) -
        |        CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) /
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
        |    END, 6) AS fano6,
        |  count(*) AS n_windows
        |FROM counts GROUP BY event_type ORDER BY event_type""".stripMargin,
    // central moments from exact HUGEINT power sums; the closed forms
    // run once in double with the identical literal expression (m2^1.5
    // spelled m2*sqrt(m2), never pow)
    "ret_moments" ->
      """WITH rets AS (
        |  SELECT event_type,
        |    CAST(CAST(floor((cents - p_cents) * 1000000.0 / p_cents)
        |      AS BIGINT) AS HUGEINT) AS x
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |  WHERE p_cents IS NOT NULL
        |), sums AS (
        |  SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(x * x) AS DOUBLE) AS s2,
        |    CAST(sum(x * x * x) AS DOUBLE) AS s3,
        |    CAST(sum(x * x * x * x) AS DOUBLE) AS s4,
        |    count(*) AS n_days
        |  FROM rets GROUP BY 1
        |)
        |SELECT event_type,
        |  round(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0.0 THEN
        |    (s3 / n - 3 * (s1 / n) * (s2 / n)
        |      + 2 * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) *
        |      sqrt(s2 / n - (s1 / n) * (s1 / n))) END, 6) AS skew6,
        |  round(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0.0 THEN
        |    (s4 / n - 4 * (s1 / n) * (s3 / n)
        |      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) *
        |      (s2 / n - (s1 / n) * (s1 / n))) - 3 END, 6) AS kurt6,
        |  n_days
        |FROM sums ORDER BY event_type""".stripMargin,
    // asymmetric lagged co-movement: a's window vs b's PREVIOUS window
    "lead_lag_corr" ->
      """WITH buckets AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b
        |    ON a.window_start = b.window_start + 600
        |    AND a.event_type <> b.event_type
        |)
        |SELECT type_a, type_b,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr_lag1,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b
        |ORDER BY type_a, type_b""".stripMargin,
    // Pearson over (r_t, r_{t-1}) pairs of the integer micro-returns
    "ret_autocorr" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), pairs AS (
        |  SELECT event_type, ret_micro AS x,
        |    lag(ret_micro) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM rets WHERE ret_micro IS NOT NULL
        |)
        |SELECT event_type,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS autocorr_lag1,
        |  count(*) AS n_pairs
        |FROM pairs WHERE y IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // daily OHLC in exact cents (id-broken open/close election), each
    // ln() micro-floored FIRST, then literal-double estimator + floor —
    // the same one-ln budget as dsir/lm_perplexity
    "range_volatility" ->
      """WITH daily AS (
        |  SELECT event_type, day,
        |    max(CASE WHEN rn_a = 1 THEN cents END) AS open_c,
        |    max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    count(*) AS n_ticks
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), logs AS (
        |  SELECT event_type, day, n_ticks,
        |    CASE WHEN low_c > 0 THEN
        |      CAST(floor(ln(CAST(high_c AS DOUBLE) / CAST(low_c AS DOUBLE))
        |        * 1000000.0) AS BIGINT) END AS lhl_micro,
        |    CASE WHEN open_c > 0 AND close_c > 0 THEN
        |      CAST(floor(ln(CAST(close_c AS DOUBLE) / CAST(open_c AS DOUBLE))
        |        * 1000000.0) AS BIGINT) END AS lco_micro
        |  FROM daily
        |)
        |SELECT event_type, day, n_ticks, lhl_micro, lco_micro,
        |  CAST(floor(CAST(lhl_micro * lhl_micro AS DOUBLE)
        |    / (4.0 * ln(2.0)) / 1000000.0) AS BIGINT) AS parkinson_micro,
        |  CAST(floor((0.5 * CAST(lhl_micro * lhl_micro AS DOUBLE)
        |    - (2.0 * ln(2.0) - 1.0) * CAST(lco_micro * lco_micro AS DOUBLE))
        |    / 1000000.0) AS BIGINT) AS gk_micro
        |FROM logs ORDER BY event_type, day""".stripMargin,
    // uncentered VR(5): exact HUGEINT second moments of the daily and
    // 5-day-rolling return sums, one nonnegative integral division
    "variance_ratio" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |    sum(ret_micro) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5
        |  FROM rets WHERE ret_micro IS NOT NULL
        |)
        |SELECT event_type, count(*) AS n_days,
        |  CASE WHEN count(CASE WHEN rn >= 5 THEN 1 END) >= 1
        |      AND sum(CAST(r AS HUGEINT) * r) > 0 THEN
        |    CAST((sum(CASE WHEN rn >= 5 THEN CAST(s5 AS HUGEINT) * s5 END)
        |        * count(*) * 1000000)
        |      // (5 * sum(CAST(r AS HUGEINT) * r)
        |        * count(CASE WHEN rn >= 5 THEN 1 END)) AS BIGINT)
        |  END AS vr_micro
        |FROM seq GROUP BY event_type ORDER BY event_type""".stripMargin,
    // equal-weighted market day-return on the exact nano grid, OLS beta
    // via HUGEINT moment sums + toward-zero integral division (verified:
    // Spark `div` ≡ DuckDB `//` on negatives), ρ via the literal-double
    // closed form
    "market_beta" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), nn AS (
        |  SELECT event_type, day, ret_micro FROM rets
        |  WHERE ret_micro IS NOT NULL
        |), mkt AS (
        |  SELECT day, CAST(floor(CAST(sum(ret_micro) AS DOUBLE) * 1000.0
        |    / count(*)) AS BIGINT) AS mkt_nano
        |  FROM nn GROUP BY day
        |), j AS (
        |  SELECT event_type, CAST(mkt_nano AS HUGEINT) AS x,
        |    CAST(ret_micro AS HUGEINT) * 1000 AS y
        |  FROM nn JOIN mkt USING (day)
        |)
        |SELECT event_type, count(*) AS n_days,
        |  CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) > 0 THEN
        |    CAST(((count(*) * sum(x * y) - sum(x) * sum(y)) * 1000000)
        |      // (count(*) * sum(x * x) - sum(x) * sum(x)) AS BIGINT)
        |  END AS beta_micro,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr6
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    // tick-rule signs with IGNORE-NULLS inheritance, volume-clock bucket
    // assignment off the exclusive cumulative prefix, exact micro
    // imbalance — both running windows ride one per-instrument sort
    "vpin_buckets" ->
      """WITH ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS size
        |  FROM events
        |), signed AS (
        |  SELECT event_type, tns, event_id, size,
        |    cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS d
        |  FROM ticks
        |), sgn AS (
        |  SELECT event_type, size,
        |    coalesce(last_value(CASE WHEN d > 0 THEN 1
        |        WHEN d < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY tns, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sign,
        |    coalesce(CAST(sum(size) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS cum_prev
        |  FROM signed
        |)
        |SELECT event_type, cum_prev // 2000 AS bucket,
        |  CAST(sum(CASE WHEN sign = 1 THEN size ELSE 0 END) AS BIGINT)
        |    AS buy_vol,
        |  CAST(sum(CASE WHEN sign = -1 THEN size ELSE 0 END) AS BIGINT)
        |    AS sell_vol,
        |  CAST(sum(size) AS BIGINT) AS bucket_vol,
        |  count(*) AS n_ticks,
        |  CASE WHEN sum(size) > 0 THEN
        |    CAST(abs(sum(CASE WHEN sign = 1 THEN size ELSE 0 END) -
        |        sum(CASE WHEN sign = -1 THEN size ELSE 0 END)) * 1000000
        |      // sum(size) AS BIGINT) END AS imb_micro
        |FROM sgn GROUP BY event_type, cum_prev // 2000
        |ORDER BY event_type, bucket""".stripMargin,
    // pairwise day-close slopes (exact micro floors), discrete lower
    // median picked by rank — a value that exists, integer-exact
    "theil_sen_trend" ->
      ("""WITH daily AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |), slopes AS (
        |  SELECT a.event_type,
        |    CAST(floor((b.cents - a.cents) * 1000000.0 /
        |      (b.day - a.day)) AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |), ranked AS (
        |  SELECT event_type, slope_micro,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_micro) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM slopes
        |)
        |SELECT event_type, n AS n_pairs, slope_micro AS ts_slope_micro
        |FROM ranked WHERE rn = (n + 1) // 2
        |ORDER BY event_type""").stripMargin,
    // strict-below-prior-peak flags, gaps-and-islands spell lengths
    "drawdown_durations" ->
      ("""WITH daily AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |), f AS (
        |  SELECT event_type, day, cents,
        |    max(cents) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS peak,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily
        |), g AS (
        |  SELECT event_type, rn,
        |    CASE WHEN peak IS NOT NULL AND cents < peak
        |      THEN 1 ELSE 0 END AS uw,
        |    sum(CASE WHEN peak IS NOT NULL AND cents < peak
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ru
        |  FROM f
        |), spells AS (
        |  SELECT event_type, rn - ru AS island, count(*) AS len
        |  FROM g WHERE uw = 1 GROUP BY event_type, rn - ru
        |), tot AS (
        |  SELECT event_type, CAST(sum(uw) AS BIGINT) AS underwater_days
        |  FROM g GROUP BY 1
        |), sp AS (
        |  SELECT event_type, count(*) AS n_spells,
        |    CAST(max(len) AS BIGINT) AS longest_spell
        |  FROM spells GROUP BY 1
        |)
        |SELECT t.event_type, t.underwater_days,
        |  coalesce(s.n_spells, 0) AS n_spells,
        |  coalesce(s.longest_spell, 0) AS longest_spell
        |FROM tot t LEFT JOIN sp s USING (event_type)
        |ORDER BY event_type""").stripMargin,
    // observation-lag ACF via a row_number self-join — one exploded
    // relation serves all five lags; pearson per (type, lag)
    "ret_acf" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM rets WHERE ret_micro IS NOT NULL
        |), lags AS (
        |  SELECT CAST(unnest([1, 2, 3, 4, 5]) AS BIGINT) AS lag
        |), pairs AS (
        |  SELECT a.event_type, l.lag, a.r AS x, b.r AS y
        |  FROM seq a CROSS JOIN lags l
        |  JOIN seq b ON b.event_type = a.event_type AND b.rn = a.rn - l.lag
        |)
        |SELECT event_type, lag,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS acf6,
        |  count(*) AS n_pairs
        |FROM pairs GROUP BY event_type, lag
        |ORDER BY event_type, lag""".stripMargin,
    // scaled-integer R/S per full block (X_i = n·C_i − i·S exact, one
    // sqrt+divide per block, micro-floored BEFORE the exact-integer
    // cross-block mean)
    "hurst_rs" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM rets WHERE ret_micro IS NOT NULL
        |), sizes AS (
        |  SELECT CAST(unnest([8, 16, 32]) AS BIGINT) AS block_n
        |), e AS (
        |  SELECT s.event_type, z.block_n, (s.rn - 1) // z.block_n AS blk,
        |    (s.rn - 1) % z.block_n + 1 AS i, s.r
        |  FROM seq s CROSS JOIN sizes z
        |), w AS (
        |  SELECT event_type, block_n, blk, i, r,
        |    sum(r) OVER (PARTITION BY event_type, block_n, blk ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
        |    sum(r) OVER (PARTITION BY event_type, block_n, blk) AS s_blk,
        |    count(*) OVER (PARTITION BY event_type, block_n, blk) AS cnt
        |  FROM e
        |), xb AS (
        |  SELECT event_type, block_n, blk,
        |    max(block_n * c - i * s_blk) - min(block_n * c - i * s_blk)
        |      AS r_scaled,
        |    block_n * sum(CAST(r AS HUGEINT) * r) -
        |      sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)) AS den
        |  FROM w WHERE cnt = block_n
        |  GROUP BY event_type, block_n, blk
        |), rsm AS (
        |  SELECT event_type, block_n,
        |    CAST(floor(CAST(r_scaled AS DOUBLE) / sqrt(CAST(den AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS rs_micro
        |  FROM xb WHERE den > 0
        |)
        |SELECT event_type, block_n, count(*) AS n_blocks,
        |  CAST(sum(rs_micro) // count(*) AS BIGINT) AS mean_rs_micro
        |FROM rsm GROUP BY event_type, block_n
        |ORDER BY event_type, block_n""".stripMargin,
    // serial covariance of consecutive cent changes; sign test on the
    // exact integer numerator, ONE literal double (divide, sqrt, ×2)
    "roll_spread" ->
      """WITH ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), dd AS (
        |  SELECT event_type, tns, event_id,
        |    cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS d
        |  FROM ticks
        |), pairs AS (
        |  SELECT event_type, CAST(d AS HUGEINT) AS x,
        |    CAST(lag(d) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS HUGEINT) AS y
        |  FROM dd
        |)
        |SELECT event_type, count(*) AS n_pairs,
        |  round(CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0
        |    THEN 2.0 * sqrt(
        |      CAST(-(count(*) * sum(x * y) - sum(x) * sum(y)) AS DOUBLE) /
        |      CAST(count(*) * count(*) AS DOUBLE))
        |  END, 6) AS roll_spread6
        |FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // bar closes at each frequency from ONE tick relation crossed with
    // the frequency list; RV = exact Σr² of the differenced closes
    "vol_signature" ->
      """WITH f AS (
        |  SELECT CAST(unnest([60, 300, 600, 1800]) AS BIGINT) AS freq_sec
        |), ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), wb AS (
        |  SELECT t.event_type, f.freq_sec,
        |    tns // (f.freq_sec * 1000000000) * f.freq_sec AS window_start,
        |    cents,
        |    row_number() OVER (PARTITION BY t.event_type, f.freq_sec,
        |      tns // (f.freq_sec * 1000000000)
        |      ORDER BY tns DESC, event_id DESC) AS rn_d
        |  FROM ticks t CROSS JOIN f
        |), bars AS (
        |  SELECT event_type, freq_sec, window_start, cents AS close_c
        |  FROM wb WHERE rn_d = 1
        |), r AS (
        |  SELECT event_type, freq_sec,
        |    close_c - lag(close_c) OVER (PARTITION BY event_type, freq_sec
        |      ORDER BY window_start) AS r
        |  FROM bars
        |)
        |SELECT event_type, freq_sec, count(*) AS n_bars,
        |  CAST(sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS rv_cents2
        |FROM r WHERE r IS NOT NULL
        |GROUP BY event_type, freq_sec
        |ORDER BY event_type, freq_sec""".stripMargin,
    // robust location: drop outside the exact-discrete [p05, p95], mean
    // of survivors as the micro-int floor of an exact DECIMAL sum
    "trimmed_mean" ->
      """WITH cd AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |    min(CASE WHEN cd >= 0.05 THEN value END) AS p_lo,
        |    min(CASE WHEN cd >= 0.95 THEN value END) AS p_hi
        |  FROM cd GROUP BY event_type
        |)
        |SELECT e.event_type,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) * 1000000 AS HUGEINT)
        |    // count(*) AS BIGINT) AS trimmed_mean_micro,
        |  count(*) AS n_kept
        |FROM events e JOIN b ON b.event_type = e.event_type
        |WHERE e.value >= b.p_lo AND e.value <= b.p_hi
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // time-bounded association numerator: distinct (user, window, type)
    // cells, window-local pair join, exact counts
    // co-presence pair generator (hot cells above 20 users dropped,
    // the df-cut pattern) + the dedup_groups recursive-CTE closure
    "user_communities" ->
      """WITH RECURSIVE cells AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 600000000000 AS w, event_type
        |  FROM events
        |), keep AS (
        |  SELECT w, event_type FROM cells
        |  GROUP BY 1, 2 HAVING count(*) <= 20
        |), bounded AS (
        |  SELECT c.user_id, c.w, c.event_type
        |  FROM cells c JOIN keep USING (w, event_type)
        |), pairs AS (
        |  SELECT DISTINCT a.user_id AS id_a, b.user_id AS id_b
        |  FROM bounded a JOIN bounded b
        |    ON a.w = b.w AND a.event_type = b.event_type
        |    AND a.user_id < b.user_id
        |), und AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        |), members AS (SELECT DISTINCT a AS id FROM und)
        |SELECT m.id AS user_id, least(m.id, min(r.dst)) AS community_id
        |FROM members m JOIN reach r ON r.src = m.id
        |GROUP BY m.id ORDER BY user_id""".stripMargin,
    // lag/cumsum session assembly on the (ts, event_id) order; entry =
    // first event per session; exact micro ratios
    "session_stats" ->
      """WITH o AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, event_type, event_id, us, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), per AS (
        |  SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        |    count(*) AS n_events
        |  FROM (
        |    SELECT user_id, sid, event_type, row_number() OVER (
        |      PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
        |    FROM s) t
        |  GROUP BY user_id, sid
        |)
        |SELECT entry_type, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bounce_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS bounce_micro,
        |  CAST(sum(n_events) * 1000000 // count(*) AS BIGINT)
        |    AS mean_events_micro
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-user volume shares squared on HUGEINT — no float shares summed
    "volume_hhi" ->
      """WITH per AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, count(*) AS n_users,
        |  CAST(sum(v) AS BIGINT) AS total_vol,
        |  CASE WHEN sum(v) > 0 THEN
        |    CAST((sum(CAST(v AS HUGEINT) * v) * 1000000)
        |      // (CAST(sum(v) AS HUGEINT) * sum(v)) AS BIGINT) END
        |    AS hhi_micro,
        |  CASE WHEN sum(v) > 0 THEN
        |    CAST((CAST(max(v) AS HUGEINT) * 1000000)
        |      // CAST(sum(v) AS HUGEINT) AS BIGINT) END
        |    AS top_share_micro
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "temporal_copresence" ->
      """WITH cells AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 600000000000 AS w, event_type
        |  FROM events
        |)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_copresent
        |FROM cells a JOIN cells b
        |  ON a.user_id = b.user_id AND a.w = b.w
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // association lift = N·c_ab/(c_a·c_b) on exact integers — the
    // log-free PMI surrogate; products ride HUGEINT
    "type_pair_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |), totals AS (
        |  SELECT event_type, count(*) AS c FROM ut GROUP BY 1
        |), n AS (
        |  SELECT count(DISTINCT user_id) AS n_users FROM ut
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS c_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT p.type_a, p.type_b, CAST(p.c_ab AS BIGINT) AS c_ab,
        |  CAST(CAST(n.n_users AS HUGEINT) * p.c_ab * 1000000 //
        |    (CAST(ta.c AS HUGEINT) * tb.c) AS BIGINT) AS lift_micro
        |FROM pairs p
        |JOIN totals ta ON ta.event_type = p.type_a
        |JOIN totals tb ON tb.event_type = p.type_b
        |CROSS JOIN n
        |ORDER BY p.type_a, p.type_b""".stripMargin,
    // Laplace-smoothed bigram LM trained on the corpus itself; each
    // bigram's log-prob is floored onto the integer micro grid BEFORE the
    // per-doc sum (a float sum of hundreds of ln() terms is
    // order-dependent), so both engines sum exact BIGINTs; the single
    // float division of exact integers at the end is deterministic.
    // V = |{w1} ∪ {w2}| over bigram TYPES (single-token docs are outside
    // the model's event space by construction — documented in Scaladoc).
    // unigram + bigram censuses off one tokenize; ONE ln() on the
    // literal ratio cb·n1²/(n2·c1·c2), micro-floored; (pmi desc, bigram)
    // total order makes the k-cutoff deterministic
    "bigram_pmi" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
        |    SELECT unnest(w) AS w FROM toks) GROUP BY 1
        |), n1 AS (
        |  SELECT CAST(sum(cw) AS BIGINT) AS n1 FROM uni
        |), big AS (
        |  SELECT unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS b FROM toks
        |), bc AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS cb FROM big
        |  GROUP BY 1 HAVING count(*) >= 5
        |), n2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n2 FROM big
        |), j AS (
        |  SELECT bc.b AS bigram, bc.cb, u1.cw AS c1, u2.cw AS c2,
        |    CAST(floor(ln(
        |      (CAST(bc.cb AS DOUBLE) * CAST(n1.n1 AS DOUBLE) * CAST(n1.n1 AS DOUBLE)) /
        |      (CAST(n2.n2 AS DOUBLE) * CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS pmi_micro
        |  FROM bc
        |  JOIN uni u1 ON u1.w = split_part(bc.b, ' ', 1)
        |  JOIN uni u2 ON u2.w = split_part(bc.b, ' ', 2)
        |  CROSS JOIN n1 CROSS JOIN n2
        |)
        |SELECT bigram, cb, c1, c2, pmi_micro FROM j
        |ORDER BY pmi_micro DESC, bigram LIMIT 20""".stripMargin
  )
}
