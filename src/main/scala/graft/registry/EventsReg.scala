package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Events family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object EventsReg {
  // ── Events: JSON extraction + declarative rate-limit window (ST6) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_agg" -> ((s, dir) => EventsOps.jsonExtractAgg(Tables.events(s, dir))),
    "rate_limit_flags" -> ((s, dir) => EventsOps.rateLimitFlags(Tables.events(s, dir))),
    "events_sessionize" -> ((s, dir) => EventsOps.sessionize(Tables.events(s, dir))),
    "event_gaps" -> ((s, dir) => EventsOps.eventGaps(Tables.events(s, dir))),
    "mode_by_type" -> ((s, dir) => EventsOps.modeByType(Tables.events(s, dir))),
    "user_event_types" -> ((s, dir) => EventsOps.userEventTypes(Tables.events(s, dir))),
    "latest_events" -> ((s, dir) => EventsOps.latestEvents(Tables.events(s, dir))),
    "kmv_distinct" -> ((s, dir) => EventsOps.kmvDistinct(Tables.events(s, dir))),
    "hll_distinct" -> ((s, dir) => EventsOps.hllDistinct(Tables.events(s, dir))),
    "dispersion_by_type" -> ((s, dir) =>
      EventsOps.dispersionByType(Tables.events(s, dir))),
    "moments_by_type" -> ((s, dir) =>
      EventsOps.momentsByType(Tables.events(s, dir))),
    "value_trend_by_type" -> ((s, dir) =>
      EventsOps.valueTrendByType(Tables.events(s, dir))),
    "scd2_intervals" -> ((s, dir) =>
      EventsOps.scd2Intervals(Tables.events(s, dir))),
    "winsorize_values" -> ((s, dir) =>
      EventsOps.winsorizeByType(Tables.events(s, dir))),
    "quantiles_disc_by_type" -> ((s, dir) =>
      EventsOps.quantilesDiscByType(Tables.events(s, dir))),
    "trends_zscore" -> ((s, dir) => Trends.trendsZscore(Tables.events(s, dir),
      "ts", "event_type", "purchase", "value", TrendsFrom, TrendsTo)),
    "funnel_steps" -> ((s, dir) => EventsOps.funnelSteps(Tables.events(s, dir))),
    // 6 h window: the widest level split on this corpus timeline
    // (3600 s leaves level 3 degenerate-zero, a week saturates all three)
    "funnel_window" -> ((s, dir) =>
      EventsOps.funnelWindow(Tables.events(s, dir), windowSec = 21600L)),
    "max_concurrency" -> ((s, dir) =>
      EventsOps.maxConcurrency(Tables.events(s, dir))),
    "survival_retention" -> ((s, dir) =>
      EventsOps.survivalRetention(Tables.events(s, dir))),
    "retention_cohorts" -> ((s, dir) =>
      EventsOps.retentionCohorts(Tables.events(s, dir))),
    // DAU / trailing-WAU stickiness: the engagement ratio off the
    // distinct (day, user) activity matrix; trailing window via a
    // map-side 7-day explode, never a per-day self-join
    "dau_stickiness" -> ((s, dir) =>
      EventsOps.dauStickiness(Tables.events(s, dir))),
    // event-concentration audit: exact Gini (rank identity, ascending
    // (cnt, user_id) order) + top-decile share over the per-user counts
    "user_gini" -> ((s, dir) =>
      EventsOps.userGini(Tables.events(s, dir))),
    "revenue_share" -> ((s, dir) => Relational.revenueShare(
      Tables.orders(s, dir), Tables.customer(s, dir), Tables.nation(s, dir))),
    "integrity_checksum" -> ((s, dir) =>
      TextAnalysis.integrityChecksum(Tables.documents(s, dir))),
    "fk_orphans" -> ((s, dir) => Relational.fkOrphans(
      Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    "benford_values" -> ((s, dir) =>
      EventsOps.benfordValues(Tables.events(s, dir))),
    // version diff between two deterministic synthetic drops of the one
    // corpus: old = all but doc_id≡3 (mod 11); new = all but ≡7
    // (mod 11), with doc_id≡0 (mod 5) texts rewritten — exercises all
    // four statuses with an exactly mirrorable oracle
    "corpus_diff" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextAnalysis.corpusDiff(
        docs.filter(pmod(col("doc_id"), lit(11)) =!= 3),
        docs.filter(pmod(col("doc_id"), lit(11)) =!= 7)
          .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    },
    "value_histogram" -> ((s, dir) => EventsOps.valueHistogram(Tables.events(s, dir))),
    "equidepth_histogram" -> ((s, dir) => EventsOps.equidepthHistogram(Tables.events(s, dir))),
    "event_transitions" -> ((s, dir) => EventsOps.eventTransitions(Tables.events(s, dir))),
    // power iteration over the transition matrix, pagerank's exact
    // integer-micro convention: the chain's asymptotic state mix
    "markov_stationary" -> ((s, dir) => EventsOps.markovStationary(Tables.events(s, dir))),
    // the 30-minute constant's sensitivity curve: session counts for the
    // whole gap ladder from ONE lag pass (n_users + breaks >= g)
    "session_gap_sweep" -> ((s, dir) => EventsOps.sessionGapSweep(Tables.events(s, dir))),
    // Markov removal-effect attribution: per channel, the conversion
    // mass lost when its in-edges redirect to drop; integer-micro chain
    "markov_attribution" -> ((s, dir) => EventsOps.markovAttribution(Tables.events(s, dir)))
  )

  def sql: Map[String, String] = Map(
    "events_json_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "rate_limit_flags" ->
      """SELECT event_id, user_id, in_window, in_window > 2 AS limited FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                   RANGE BETWEEN 999999 PRECEDING AND CURRENT ROW) AS in_window
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,
    // Session boundary: gap >= 30 min starts a new session — matches
    // session_window's exclusive end (merge only when diff < gap).
    "events_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "event_gaps" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,
    "latest_events" ->
      """SELECT user_id, event_type, latest_id, latest_us, value FROM (
        |  SELECT user_id, event_type, event_id AS latest_id,
        |    epoch_us(ts) AS latest_us, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |) t WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    // Explicit cume_dist definition — native percentile_disc tie
    // conventions differ across engines; this one is spelled out.
    // lag elects change rows, lead closes intervals — both over the
    // (us, event_id) tie-broken key order; exact double equality.
    "scd2_intervals" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, value, epoch_us(ts) AS us, event_id,
        |    lag(value) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS prev_value
        |  FROM events
        |), changes AS (
        |  SELECT user_id, event_type, value, us, event_id FROM ordered
        |  WHERE prev_value IS NULL OR value <> prev_value
        |)
        |SELECT user_id, event_type, value, us AS valid_from_us,
        |  lead(us) OVER (PARTITION BY user_id, event_type
        |    ORDER BY us, event_id) AS valid_to_us
        |FROM changes
        |ORDER BY user_id, event_type, valid_from_us""".stripMargin,
    // Same cume_dist discrete-percentile rule as quantiles_disc; the
    // clamp is pure comparison, so the output is engine-exact.
    "winsorize_values" ->
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
        |SELECT e.event_id, e.event_type, e.value,
        |  greatest(least(e.value, b.p_hi), b.p_lo) AS value_winsorized,
        |  (e.value < b.p_lo OR e.value > b.p_hi) AS clipped
        |FROM events e JOIN b ON b.event_type = e.event_type
        |ORDER BY e.event_id""".stripMargin,
    "quantiles_disc_by_type" ->
      """WITH cd AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events
        |)
        |SELECT event_type,
        |  min(CASE WHEN cd >= 0.5 THEN value END) AS p50_disc,
        |  min(CASE WHEN cd >= 0.9 THEN value END) AS p90_disc,
        |  min(CASE WHEN cd >= 0.99 THEN value END) AS p99_disc,
        |  count(*) AS n
        |FROM cd GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Five exact-decimal moments, closed forms in double; degenerate
    // variances emit NULL on both sides (never an engine-divergent ÷0).
    "value_trend_by_type" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS sy,
        |    sum(CAST(value AS DECIMAL(18,2))
        |        * CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS sxy,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))
        |        * CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS syy
        |  FROM events GROUP BY event_type
        |), d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |  FROM m
        |)
        |SELECT event_type, n,
        |  CASE WHEN varx > 0 AND vary > 0
        |       THEN round(cov / (sqrt(varx) * sqrt(vary)), 6) END AS corr_vt,
        |  CASE WHEN vary > 0
        |       THEN round(cov / vary * 86400, 6) END AS slope_per_day
        |FROM d ORDER BY event_type""".stripMargin,
    "trends_zscore" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), mi AS (
         |  SELECT window_start, v_mean,
         |    CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         |      AS v_micro
         |  FROM agg
         |), mo AS (
         |  SELECT window_start, v_mean, v_micro,
         |    count(*) OVER w AS nn,
         |    CAST(sum(v_micro) OVER w AS BIGINT) AS sx,
         |    sum(CAST(v_micro AS HUGEINT) * v_micro) OVER w AS sxx
         |  FROM mi
         |  WINDOW w AS (ORDER BY window_start
         |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |), st AS (
         |  SELECT window_start, v_mean, v_micro,
         |    CAST(sx // nn AS BIGINT) AS ma_micro,
         |    CAST(floor(sqrt(CAST(nn * sxx - CAST(sx AS HUGEINT) * sx
         |      AS DOUBLE)) / nn) AS BIGINT) AS sd_micro
         |  FROM mo
         |)
         |SELECT window_start, v_mean, ma_micro, sd_micro,
         |  CASE WHEN sd_micro > 0 THEN
         |    CAST(floor((v_micro - ma_micro) * 1000000.0 / sd_micro)
         |      AS BIGINT) END AS z_micro,
         |  coalesce(CASE WHEN sd_micro > 0 THEN
         |    abs(CAST(floor((v_micro - ma_micro) * 1000000.0 / sd_micro)
         |      AS BIGINT)) > 2000000 END, FALSE) AS anomaly
         |FROM st ORDER BY window_start""".stripMargin,
    // Exact-decimal moments, double-assembled closed form — native
    // stddev/var aggregates are combine-order-dependent float sums and
    // would not hash-match across engines; this does.
    "dispersion_by_type" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(greatest((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0), 6) AS var_pop,
        |  round(sqrt(greatest((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0)), 6) AS stddev_pop
        |FROM m ORDER BY event_type""".stripMargin,
    // Skewness/kurtosis from exact DECIMAL power sums; formula text is
    // shared with the Spark side op-for-op (m2·sqrt(m2), never pow — a
    // libm call whose last ulp differs across implementations).
    "moments_by_type" ->
      """WITH vals AS (
        |  SELECT event_type, CAST(value AS DECIMAL(8,2)) AS x1,
        |    CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
        |      AS DECIMAL(19,4)) AS x2
        |  FROM events
        |), vals2 AS (
        |  -- staged widths: DuckDB decimals are int64 up to 18 digits and
        |  -- only promote on the DECLARED result type, so each product is
        |  -- cast to a width that fits exactly (x4 ≤ 24 digits at scale 8)
        |  SELECT event_type, x1, x2,
        |    CAST(x2 * x1 AS DECIMAL(28,6)) AS x3,
        |    CAST(x2 * x2 AS DECIMAL(38,8)) AS x4
        |  FROM vals
        |), s AS (
        |  SELECT event_type, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
        |    sum(x3) AS s3, sum(x4) AS s4
        |  FROM vals2 GROUP BY 1
        |), d AS (
        |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |    CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d
        |  FROM s
        |), m AS (
        |  SELECT event_type, n, nd, s1d,
        |    greatest((nd * s2d - s1d * s1d) / (nd * nd), 0.0) AS m2,
        |    (nd * nd * s3d - 3 * nd * s1d * s2d + 2 * s1d * s1d * s1d)
        |      / (nd * nd * nd) AS m3,
        |    (nd * nd * nd * s4d - 4 * nd * nd * s1d * s3d
        |      + 6 * nd * s1d * s1d * s2d - 3 * s1d * s1d * s1d * s1d)
        |      / (nd * nd * nd * nd) AS m4
        |  FROM d
        |)
        |SELECT event_type, n,
        |  round(s1d / nd, 6) AS mean,
        |  round(m2, 6) AS var_pop,
        |  CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
        |  CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - 3, 6) END AS kurtosis_ex
        |FROM m ORDER BY event_type""".stripMargin,
    // Bottom-k distinct sketch, reproduced hash-for-hash: same h60
    // family, same rank rule, same (k−1)·2^60/kth estimate — the oracle
    // matches the sketch's ERROR, not just its target.
    "kmv_distinct" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events
        |), ranked AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM hashed
        |)
        |SELECT event_type, count(*) AS n_kept, max(h) AS kth_min,
        |  CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |       WHEN max(h) > 0
        |       THEN round(63.0 * (1152921504606846976.0 / CAST(max(h) AS DOUBLE)), 3)
        |  END AS n_est
        |FROM ranked WHERE rn <= 64
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // register-exact HLL (m=64): bucket = h60 mod m, register = ρ of the
    // 54-bit remainder via bin() length (both engines drop leading
    // zeros); harmonic sum assembled as an exact BIGINT numerator so the
    // estimate is one correctly-rounded IEEE divide — no float fold
    "hll_distinct" ->
      """WITH hashed AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events
        |), regs AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    max(CASE WHEN h // 64 = 0 THEN 55
        |        ELSE 55 - length(bin(h // 64)) END) AS reg
        |  FROM hashed GROUP BY 1, 2
        |), per AS (
        |  SELECT event_type, count(*) AS n_used, max(reg) AS max_reg
        |  FROM regs GROUP BY 1
        |), asm AS (
        |  SELECT r.event_type, p.n_used, p.max_reg,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(p.max_reg - r.reg AS INT))
        |      AS BIGINT) AS s_present
        |  FROM regs r JOIN per p USING (event_type)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT event_type,
        |  CAST(64 - n_used AS BIGINT) AS v_zero,
        |  max_reg,
        |  s_present + (64 - n_used) *
        |    (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS s_num,
        |  round(0.709 * 64 * 64 * pow(2.0, max_reg) /
        |    CAST(s_present + (64 - n_used) *
        |      (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS DOUBLE), 6)
        |    AS hll_est
        |FROM asm ORDER BY event_type""".stripMargin,
    // Chained step windows: each CTE layer adds the next step's
    // conditional min, mirroring the Spark window chain exactly.
    "funnel_steps" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS v_us FROM base
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > v_us THEN us END)
        |    OVER (PARTITION BY user_id) AS c_us FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > c_us THEN us END)
        |    OVER (PARTITION BY user_id) AS p_us FROM s2
        |), per_user AS (
        |  SELECT DISTINCT user_id, v_us, c_us, p_us FROM s3
        |)
        |SELECT count(v_us) AS n_view,
        |  count(c_us) AS n_click_after_view,
        |  count(p_us) AS n_purchase_after_click,
        |  count(*) AS n_users
        |FROM per_user""".stripMargin,
    // windowFunnel semantics: a chain may open at ANY view; first click
    // strictly after it, first purchase strictly after that click, both
    // within 21600s of the OPENING view; level counts are nested
    // distinct user sets
    "funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT DISTINCT user_id, us AS v_us FROM e
        |  WHERE event_type = 'view'
        |), vc AS (
        |  SELECT v.user_id, v.v_us, min(c.us) AS c_us
        |  FROM v LEFT JOIN e c ON c.user_id = v.user_id
        |    AND c.event_type = 'click' AND c.us > v.v_us
        |  GROUP BY 1, 2
        |), alive AS (
        |  SELECT * FROM vc
        |  WHERE c_us IS NOT NULL AND c_us <= v_us + 21600000000
        |), vcp AS (
        |  SELECT a.user_id, a.v_us, min(p.us) AS p_us
        |  FROM alive a LEFT JOIN e p ON p.user_id = a.user_id
        |    AND p.event_type = 'purchase' AND p.us > a.c_us
        |  GROUP BY 1, 2
        |), l3 AS (
        |  SELECT DISTINCT user_id FROM vcp
        |  WHERE p_us IS NOT NULL AND p_us <= v_us + 21600000000
        |)
        |SELECT CAST(21600 AS BIGINT) AS window_sec,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM v)
        |    AS n_level1,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM alive)
        |    AS n_level2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM l3) AS n_level3""".stripMargin,
    // sweep-line max-intersections over inclusive session intervals:
    // +1 at start, -1 at end+1, ties collapsed per timestamp BEFORE the
    // cumsum, argmax with first-timestamp tiebreak
    "max_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), o AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT user_id, us, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), iv AS (
        |  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us
        |  FROM s GROUP BY 1, 2
        |), d AS (
        |  SELECT start_us AS us, 1 AS dd FROM iv
        |  UNION ALL SELECT end_us + 1, -1 FROM iv
        |), n AS (
        |  SELECT us, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY 1
        |), r AS (
        |  SELECT us, sum(net) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING)
        |    AS conc
        |  FROM n
        |)
        |SELECT CAST(conc AS BIGINT) AS max_concurrent, us AS at_us
        |FROM r ORDER BY conc DESC, us LIMIT 1""".stripMargin,
    // Event-concentration: the same ascending (cnt, user_id) rank, the
    // Gini rank identity through HUGEINT (mirrors the Spark side's
    // DECIMAL(38,0) widening), nonnegative numerator ⇒ floor division
    // is engine-identical; top decile = ceil(n/10) highest ranks.
    "user_gini" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT cnt,
        |    row_number() OVER (ORDER BY cnt, user_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM c
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total,
        |  CAST((2 * CAST(sum(rk * cnt) AS HUGEINT) * 1000000
        |    - CAST(max(n) + 1 AS HUGEINT) * CAST(sum(cnt) AS BIGINT)
        |      * 1000000)
        |    // (CAST(max(n) AS HUGEINT) * CAST(sum(cnt) AS BIGINT))
        |    AS BIGINT) AS gini_micro,
        |  CAST(CAST(sum(CASE WHEN rk > n - (n + 9) // 10
        |      THEN cnt ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(cnt) AS BIGINT) AS BIGINT)
        |    AS top_decile_share_micro
        |FROM r""".stripMargin,
    // DAU/WAU stickiness: trailing-7 membership stated as the range
    // join over present days (≡ the Spark side's 7-day explode after
    // the inner join restricts to active days); integer micro ratio.
    "dau_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events
        |), dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1
        |), sp AS (
        |  SELECT DISTINCT t.day, d.user_id
        |  FROM du d JOIN (SELECT DISTINCT day FROM du) t
        |    ON t.day BETWEEN d.day AND d.day + 6
        |), wau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM sp GROUP BY 1
        |)
        |SELECT d.day, d.dau, w.wau,
        |  d.dau * 1000000 // w.wau AS stickiness_micro
        |FROM dau d JOIN wau w USING (day) ORDER BY 1""".stripMargin,
    // Kaplan–Meier: integer day lifetimes, horizon-censored (1 day),
    // reverse-cumulative at-risk, micro-floored ln factors prefix-
    // summed in BIGINT; surv6 = one final exp/round; d = n_risk
    // absorbs the curve at exactly 0 (NULL logsurv) from that day on.
    "survival_retention" ->
      """WITH life AS (
        |  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
        |  FROM events GROUP BY 1
        |), hor AS (SELECT max(epoch_us(ts)) AS t_end FROM events),
        |per AS (
        |  SELECT (l - f) // 86400000000 AS day,
        |    CASE WHEN l >= t_end - 86400000000 THEN 1 ELSE 0 END AS cens
        |  FROM life CROSS JOIN hor
        |), byday AS (
        |  SELECT day, CAST(sum(CASE WHEN cens = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(cens) AS BIGINT) AS c
        |  FROM per GROUP BY 1
        |), r AS (
        |  SELECT day, d, c, CAST(sum(d + c) OVER (ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        |  FROM byday
        |), s AS (
        |  SELECT day, d, c, n_risk,
        |    CASE WHEN d > 0 AND d < n_risk THEN CAST(floor(
        |      ln(1 - CAST(d AS DOUBLE) / n_risk) * 1000000) AS BIGINT)
        |      ELSE 0 END AS step,
        |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY day) AS absorbed
        |  FROM r
        |)
        |SELECT day, n_risk, d, c,
        |  CASE WHEN absorbed = 1 THEN NULL
        |    ELSE CAST(sum(step) OVER (ORDER BY day) AS BIGINT)
        |    END AS logsurv_micro,
        |  CASE WHEN absorbed = 1 THEN 0.0
        |    ELSE round(exp(CAST(sum(step) OVER (ORDER BY day) AS DOUBLE)
        |      / 1000000), 6) END AS surv6
        |FROM s ORDER BY day""".stripMargin,
    "retention_cohorts" ->
      """WITH wk AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
        |), coh AS (
        |  SELECT user_id, wk,
        |    min(wk) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM wk
        |), per AS (
        |  SELECT DISTINCT user_id, cohort_week,
        |    wk - cohort_week AS week_offset FROM coh
        |)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM per GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "revenue_share" ->
      """WITH rev AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
        |  round(CAST(rev_dec AS DOUBLE) /
        |    CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS share
        |FROM rev ORDER BY n_name""".stripMargin,
    "user_event_types" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same h60 formula as sample_hash; xor_agg is order-invariant on both
    // engines, so the digest survives any partitioning.
    "integrity_checksum" ->
      """SELECT source, count(*) AS n_docs,
        |  bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 15))::BIGINT)
        |    AS checksum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Drop-over-drop diff: digest compare on doc_id over the same
    // deterministic synthetic versions the Spark side builds.
    "corpus_diff" ->
      """WITH v_old AS (
        |  SELECT doc_id, source, md5(text) AS dig,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 11 <> 3
        |), v_new AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |             ELSE text END) AS dig,
        |    CAST(length(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |                     ELSE text END) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 11 <> 7
        |)
        |SELECT coalesce(v_new.source, v_old.source) AS source,
        |  CASE WHEN v_old.dig IS NULL THEN 'added'
        |       WHEN v_new.dig IS NULL THEN 'removed'
        |       WHEN v_old.dig = v_new.dig THEN 'unchanged'
        |       ELSE 'modified' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(v_new.len, 0) - coalesce(v_old.len, 0))
        |    AS BIGINT) AS chars_delta
        |FROM v_old FULL OUTER JOIN v_new USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mode_by_type" ->
      """SELECT event_type, mode_value, n FROM (
        |  SELECT event_type, value AS mode_value, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY count(*) DESC, value) AS rn
        |  FROM events GROUP BY event_type, value
        |) t WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "value_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Benford first-digit audit: digit via exact integer cents and a
    // string head (no float logs on the data path); restored 9-digit
    // grid; the reference mass enters once as a micro-floored log.
    "benford_values" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events WHERE value > 0
        |), cnt AS (
        |  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        |  FROM cnt GROUP BY 1
        |), grid AS (
        |  SELECT t.event_type, t.total, d.digit
        |  FROM tot t CROSS JOIN
        |    (SELECT unnest(generate_series(1, 9)) AS digit) d
        |)
        |SELECT g.event_type, CAST(g.digit AS BIGINT) AS digit,
        |  coalesce(c.n, 0) AS n,
        |  CAST(coalesce(c.n, 0) * 1000000 // g.total AS BIGINT) AS p_micro,
        |  CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000) AS BIGINT)
        |    AS benford_micro,
        |  abs(CAST(coalesce(c.n, 0) * 1000000 // g.total AS BIGINT)
        |    - CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000)
        |      AS BIGINT)) AS dev_micro
        |FROM grid g LEFT JOIN cnt c
        |  ON c.event_type = g.event_type AND c.digit = g.digit
        |ORDER BY 1, 2""".stripMargin,
    // FK orphan audit: one scalar-subquery row per edge; NULL child
    // keys count as orphans (left-join-null = Spark anti-join-keep).
    "fk_orphans" ->
      """SELECT 'customer.nation' AS fk,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |   LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL) AS n_orphans
        |UNION ALL SELECT 'lineitem.order',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |   WHERE o.o_orderkey IS NULL)
        |UNION ALL SELECT 'lineitem.part',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |   WHERE p.p_partkey IS NULL)
        |UNION ALL SELECT 'lineitem.supplier',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |   WHERE s.s_suppkey IS NULL)
        |UNION ALL SELECT 'nation.region',
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation),
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation n
        |   LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |   WHERE r.r_regionkey IS NULL)
        |UNION ALL SELECT 'orders.customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE c.c_custkey IS NULL)
        |UNION ALL SELECT 'supplier.nation',
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier s
        |   LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL)
        |ORDER BY fk""".stripMargin,
    // ntile over the (value, event_id) total order: identical bucket
    // boundaries on both engines (a bare value order ties arbitrarily).
    "equidepth_histogram" ->
      """SELECT event_type, bucket, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS bucket
        |  FROM events) t
        |GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    // lag over the per-user (epoch_us, event_id) order — the tiebreak
    // keeps same-timestamp neighbors deterministic across engines.
    "event_transitions" ->
      """SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
        |  SELECT event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events) t
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,
    // one lag pass; n_sessions(g) = distinct users + gaps >= g (the
    // session_window boundary rule); ladder spine survives empty input
    "session_gap_sweep" ->
      """WITH l AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events
        |), lad AS (
        |  SELECT CAST(unnest([300, 600, 1200, 1800, 3600]) AS BIGINT)
        |    AS gap_s
        |), u AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM events
        |), c AS (
        |  SELECT lad.gap_s,
        |    CAST(count(*) FILTER (WHERE l.gap_us >= lad.gap_s * 1000000)
        |      AS BIGINT) AS n_breaks
        |  FROM lad, l WHERE l.gap_us IS NOT NULL GROUP BY 1
        |)
        |SELECT lad.gap_s, coalesce(c.n_breaks, 0) AS n_breaks,
        |  u.n_users + coalesce(c.n_breaks, 0) AS n_sessions
        |FROM lad CROSS JOIN u LEFT JOIN c ON c.gap_s = lad.gap_s
        |ORDER BY lad.gap_s""".stripMargin,
    // eight unrolled power-iteration steps over the transition counts,
    // the dup_pagerank integer convention: per-term floor then
    // order-independent sums; DuckDB sum() widens → CAST back to BIGINT
    "markov_stationary" -> {
      val steps = (1 to 8).map { i =>
        s"""p$i AS (
           |  SELECT t.to_type AS state,
           |    CAST(sum((p.p * t.n) // t.n_from) AS BIGINT) AS p
           |  FROM t JOIN p${i - 1} p ON p.state = t.from_type
           |  GROUP BY 1)""".stripMargin
      }.mkString(", ")
      s"""WITH trans AS (
         |  SELECT prev_type AS from_type, event_type AS to_type,
         |    CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT event_type, lag(event_type) OVER (
         |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |      AS prev_type
         |    FROM events) x
         |  WHERE prev_type IS NOT NULL GROUP BY 1, 2
         |), outdeg AS (
         |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
         |  FROM trans GROUP BY 1
         |), t AS (
         |  SELECT trans.from_type, trans.to_type, trans.n, outdeg.n_from
         |  FROM trans JOIN outdeg USING (from_type)
         |), p0 AS (
         |  SELECT from_type AS state, CAST(1000000 AS BIGINT) AS p
         |  FROM outdeg
         |), $steps
         |SELECT o.from_type AS state, o.n_from, p8.p AS p_micro
         |FROM outdeg o JOIN p8 ON p8.state = o.from_type
         |ORDER BY state""".stripMargin
    },
    // removal-effect attribution: the path/edge census, then one
    // unrolled 12-step absorbing walk per variant (base + one per
    // channel with that channel's in-edges redirected to drop); every
    // per-edge flow floors BEFORE summing, denominators from the
    // UNREDIRECTED chain — the operator's driver loop replayed exactly.
    // The shared census CTEs are MATERIALIZED: DuckDB inlines CTEs by
    // default, and 60 step-CTEs re-deriving the window census measured
    // 832 s vs 15 s materialized (values identical)
    "markov_attribution" -> markovAttributionOracle
  )

  private val AttrChannels = Seq("click", "error", "signup", "view")

  /** The attribution walk unrolled as CTEs — generated like the
    * [[TextReg]] repair chain: (1 + |channels|) variants × 12 steps,
    * each step = per-edge flows (f), surviving transient mass (p),
    * and the conversion accumulator (c). */
  private def markovAttributionOracle: String = {
    val iters = 12
    val variants = ("b", "") +: AttrChannels.zipWithIndex.map {
      case (c, i) => (s"v$i", c)
    }
    val walks = variants.map { case (tag, removed) =>
      val seed =
        s"""p_${tag}_0 AS (
           |  SELECT '__start' AS s, CAST(1000000 AS BIGINT) AS m
           |), c_${tag}_0 AS (SELECT CAST(0 AS BIGINT) AS c)""".stripMargin
      val steps = (1 to iters).map { i =>
        val to =
          if (removed.isEmpty) "e.to_s"
          else s"CASE WHEN e.to_s = '$removed' THEN '__drop' ELSE e.to_s END"
        s"""f_${tag}_$i AS (
           |  SELECT $to AS to_s, p.m * e.n // nf.n_from AS f
           |  FROM edges e JOIN p_${tag}_${i - 1} p ON p.s = e.from_s
           |  JOIN nfrom nf ON nf.from_s = e.from_s
           |), p_${tag}_$i AS (
           |  SELECT to_s AS s, CAST(sum(f) AS BIGINT) AS m
           |  FROM f_${tag}_$i
           |  WHERE to_s NOT IN ('__conv', '__drop') GROUP BY 1
           |), c_${tag}_$i AS (
           |  SELECT (SELECT c FROM c_${tag}_${i - 1}) +
           |    coalesce((SELECT CAST(sum(f) AS BIGINT) FROM f_${tag}_$i
           |      WHERE to_s = '__conv'), 0) AS c
           |)""".stripMargin
      }.mkString(", ")
      s"$seed, $steps"
    }.mkString(", ")
    val resRows = AttrChannels.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS channel, (SELECT c FROM c_v${i}_$iters) AS conv_removed"
    }.mkString(" UNION ALL ")
    s"""WITH b AS MATERIALIZED (
       |  SELECT user_id, event_type, row_number() OVER (
       |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pos
       |  FROM events
       |), fc AS MATERIALIZED (
       |  SELECT user_id, min(pos) AS conv_pos FROM b
       |  WHERE event_type = 'purchase' GROUP BY 1
       |), path AS MATERIALIZED (
       |  SELECT b.user_id, b.pos, fc.conv_pos,
       |    CASE WHEN b.event_type = 'purchase' THEN '__conv'
       |         ELSE b.event_type END AS state
       |  FROM b LEFT JOIN fc USING (user_id)
       |  WHERE fc.conv_pos IS NULL OR b.pos <= fc.conv_pos
       |), within AS (
       |  SELECT coalesce(lag(state) OVER (
       |    PARTITION BY user_id ORDER BY pos), '__start') AS from_s,
       |    state AS to_s
       |  FROM path
       |), lastnc AS (
       |  SELECT state AS from_s, '__drop' AS to_s FROM (
       |    SELECT state, row_number() OVER (
       |      PARTITION BY user_id ORDER BY pos DESC) AS rn
       |    FROM path WHERE conv_pos IS NULL) t
       |  WHERE rn = 1
       |), edges AS MATERIALIZED (
       |  SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT from_s, to_s FROM within
       |    UNION ALL SELECT from_s, to_s FROM lastnc) u
       |  GROUP BY 1, 2
       |), nfrom AS MATERIALIZED (
       |  SELECT from_s, CAST(sum(n) AS BIGINT) AS n_from
       |  FROM edges GROUP BY 1
       |), $walks, res AS (
       |  $resRows
       |), r2 AS (
       |  SELECT channel, conv_removed,
       |    CASE WHEN (SELECT c FROM c_b_$iters) > 0
       |      THEN 1000000 - conv_removed * 1000000 //
       |        (SELECT c FROM c_b_$iters)
       |      ELSE 0 END AS removal
       |  FROM res
       |)
       |SELECT channel,
       |  CAST((SELECT c FROM c_b_$iters) AS BIGINT) AS conv_micro,
       |  CAST(conv_removed AS BIGINT) AS conv_removed_micro,
       |  CAST(removal AS BIGINT) AS removal_micro,
       |  CAST(CASE WHEN sum(removal) OVER () > 0
       |    THEN removal * 1000000 // sum(removal) OVER ()
       |    ELSE 0 END AS BIGINT) AS share_micro
       |FROM r2 ORDER BY channel""".stripMargin
  }
}
