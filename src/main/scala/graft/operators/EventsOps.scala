package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Operators over the `events` stream table: semi-structured JSON extraction
 * (the reference's edges are JSON, SURVEY.md §2.1 S1/S8) and the reference's
 * per-user sliding-window rate limiter re-expressed as a declarative
 * analytic query (`consumer/ratelimit/ratelimit.go:38-62`; the streaming
 * stateful variant lives in graft.streaming).
 */
object EventsOps {

  /** JSON property extraction + aggregation: `props` is a JSON object column;
    * pull a numeric field and aggregate per event type. get_json_object is
    * evaluated once per row inside codegen — no UDF. */
  def jsonExtractAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Streaming form of [[sessionize]]: the same merging session windows
    * over an unbounded stream. The watermark bounds state — an open
    * session's window closes (and emits, in append mode) once the
    * watermark passes its end + gap, so state tracks ACTIVE sessions
    * only, never history. No orderBy (streams have no global order; the
    * sink orders if it needs to). */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))

  /** Per-user inter-arrival gaps: each event's microseconds since the
    * user's previous event (null for the first) — the lag-window building
    * block under sessionization, burst detection, and retention curves.
    * One shuffle on user_id; ties broken by event_id so the lag is
    * deterministic across engines and retries. */
  def eventGaps(events: DataFrame): DataFrame = {
    // ordering by the micros projection ≡ ordering by ts (monotone)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .select(col("event_id"), col("user_id"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Markov removal-effect ATTRIBUTION (Anderl et al. 2016 — the
    * standard "Markov chain attribution" read): how much of observed
    * conversion does each channel carry? Each user's event path is
    * truncated at the first `convType` (the conversion absorbing
    * state); non-converting paths absorb at a drop state. The model is
    * the first-order transition-count chain; a channel's REMOVAL
    * EFFECT is 1 − P(conv | every edge into the channel redirected to
    * drop) / P(conv), and attribution shares normalize the effects —
    * unlike last-touch/first-touch position rules, a channel earns
    * credit exactly for the conversion mass that provably flows
    * through it.
    *
    * Determinism: conversion probabilities run in the
    * [[markovStationary]] integer convention — micro mass seeded at
    * the start state, every per-EDGE flow floored individually
    * (p·n div n_from, denominators from the UNREDIRECTED chain — the
    * removal loses flow, it does not renormalize), absorbed
    * conversion mass accumulated over `iters` steps; removal and
    * share are integral micro divisions. Redirected edges are never
    * re-merged, so the oracle replays every floor bit-for-bit.
    *
    * Shape at 100 TB: the transition census is the one data-sized pass
    * (two windows on the user shuffle); the chain itself is bounded by
    * the event-type domain, so the per-variant iteration is
    * corpus-size-independent driver work (the pca_power/mmr
    * convention), recorded into PlanTrace for the fingerprint. */
  def markovAttribution(events: DataFrame,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      convType: String = "purchase", iters: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val base = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("pos", row_number().over(w))
    val firstConv = base.filter(col("event_type") === convType)
      .groupBy(col("user_id")).agg(min(col("pos")).as("conv_pos"))
    val path = base.join(firstConv, Seq("user_id"), "left")
      .filter(col("conv_pos").isNull || col("pos") <= col("conv_pos"))
      .withColumn("state", when(col("event_type") === convType,
        lit("__conv")).otherwise(col("event_type")))
    val wp = Window.partitionBy(col("user_id")).orderBy(col("pos"))
    val within = path
      .withColumn("from_s",
        coalesce(lag(col("state"), 1).over(wp), lit("__start")))
      .select(col("from_s"), col("state").as("to_s"))
    val lastNc = path.join(firstConv, Seq("user_id"), "left_anti")
      .groupBy(col("user_id"))
      .agg(max(struct(col("pos"), col("state"))).as("l"))
      .select(col("l.state").as("from_s"), lit("__drop").as("to_s"))
    val counts = within.unionByName(lastNc)
      .groupBy(col("from_s"), col("to_s")).agg(count(lit(1)).as("n"))
    graft.plans.PlanTrace.record("markov_attr",
      graft.plans.PlanFingerprint.structSha(counts))
    val edges = counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    val nFrom = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap

    def convMicro(removed: Option[String]): Long = {
      var p = Map("__start" -> 1000000L)
      var conv = 0L
      (1 to iters).foreach { _ =>
        val next = scala.collection.mutable.Map[String, Long]()
        edges.foreach { case (u, v0, n) =>
          p.get(u).foreach { m =>
            val v = if (removed.contains(v0)) "__drop" else v0
            val f = m * n / nFrom(u)
            if (v == "__conv") conv += f
            else if (v != "__drop")
              next(v) = next.getOrElse(v, 0L) + f
          }
        }
        p = next.toMap
      }
      conv
    }

    val baseConv = convMicro(None)
    val removals = channels.sorted.map { c =>
      val cc = convMicro(Some(c))
      val eff = if (baseConv > 0) 1000000L - cc * 1000000L / baseConv else 0L
      (c, cc, eff)
    }
    val total = removals.map(_._3).sum
    removals.map { case (c, cc, eff) =>
      (c, baseConv, cc, eff,
        if (total > 0) eff * 1000000L / total else 0L)
    }.toDF("channel", "conv_micro", "conv_removed_micro",
      "removal_micro", "share_micro")
      .orderBy(col("channel"))
  }

  /** Session-count sensitivity SWEEP over the inactivity-gap ladder —
    * the calibration read behind [[sessionize]]'s 30-minute constant:
    * every ladder threshold's session count from ONE lag pass, using
    * the identity n_sessions(g) = n_users + #{gaps ≥ g} (each user
    * opens one session; every qualifying gap opens one more — exactly
    * `session_window`'s boundary rule, spec-asserted equal to the
    * sessionizer at 1800 s). A pipeline reads the curve's knee before
    * trusting any downstream session metric; re-running [[sessionize]]
    * per candidate would cost a merging-window shuffle per point.
    *
    * Shape: the gaps relation is the one data-sized move (the
    * [[eventGaps]] shuffle); the ladder explode is crushed map-side to
    * |ladder| cells, the user count rides a broadcast 1-row aggregate,
    * and the ladder spine survives empty input (one row per threshold,
    * zero counts). */
  def sessionGapSweep(events: DataFrame,
      gapsSec: Seq[Long] = Seq(300L, 600L, 1200L, 1800L, 3600L)): DataFrame = {
    val breaks = eventGaps(events)
      .filter(col("gap_us").isNotNull)
      .select(explode(array(gapsSec.map(lit): _*)).as("gap_s"),
        col("gap_us"))
      .groupBy(col("gap_s"))
      .agg(sum(when(col("gap_us") >= col("gap_s") * 1000000L, 1L)
        .otherwise(0L)).as("n_breaks"))
    events.agg(countDistinct(col("user_id")).as("n_users"))
      .select(explode(array(gapsSec.map(lit): _*)).as("gap_s"),
        col("n_users"))
      .join(breaks, Seq("gap_s"), "left")
      .select(col("gap_s"),
        coalesce(col("n_breaks"), lit(0L)).as("n_breaks"),
        (col("n_users") + coalesce(col("n_breaks"), lit(0L)))
          .cast("long").as("n_sessions"))
      .orderBy(col("gap_s"))
  }

  /** Sessionization: group each user's events into sessions separated by
    * ≥ `gap` of inactivity (`session_window` — merging windows keyed by
    * user; one shuffle). Money-free sums are DECIMAL-exact for the oracle.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Click→purchase CONVERSION RATE within a horizon: the fraction of
    * clicks followed by the same user's purchase inside `horizonSec` —
    * the bounded-funnel KPI (the unbounded ordered funnel is
    * [[funnelSteps]]). One forward-as-of pass carries the next
    * purchase's μs in the payload struct; the horizon test and the
    * rate's micro-int floor are exact integer arithmetic. Single
    * summary row (NULL rate when no clicks — the empty-input case). */
  def clickConversionRate(events: DataFrame,
      horizonSec: Long = 3600L): DataFrame = {
    import graft.operators.AsOfJoin
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("ts"),
        struct(unix_micros(col("ts")).as("pus")).as("p"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOfForward(
      left = clicks, right = purchases, keyCol = "user_id",
      leftTs = "ts", rightTs = "ts", payloadCol = "p", as = "m")
      .select((col("m.pus") - unix_micros(col("ts")) <=
        horizonSec * 1000000L).as("converted"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("converted"), 1L).otherwise(0L)).cast("long")
          .as("n_converted"))
      .select(col("n_clicks"), col("n_converted"),
        when(col("n_clicks") > 0,
          expr("(n_converted * 1000000) div n_clicks")).as("rate_micro"))
  }

  /** FIRST-TOUCH session attribution: each purchase credited to the
    * EARLIEST click in its own session (30-min-gap sessions over the
    * user's full event stream) — the marketing-attribution join next to
    * the as-of family's last-touch direction. Sessionization is the
    * shared lag/cumsum boundary-flag formulation; the first click is a
    * running conditional min over the (us, event_id) struct — O(1)
    * window state, no self-join — and NULL for click-less sessions.
    * Two window partitionings (user, then user×session) but the second
    * sort rides the first's order; one data-sized shuffle each.
    * The oracle recovers the arg-min id via a μs-equality join, exact
    * because μs instants are collision-free (spec-asserted). */
  def sessionAttribution(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(wOrd).isNull ||
          col("us") - lag(col("us"), 1).over(wOrd) >= gapSec * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
    val wSess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess
      .withColumn("first_click",
        min(when(col("event_type") === "click",
          struct(col("us"), col("event_id")))).over(wSess))
      .withColumn("session_start_us", min(col("us")).over(wSess))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("first_click.event_id").as("first_click_id"),
        col("session_start_us"))
      .orderBy(col("purchase_id"))
  }

  /** Log COMPACTION: the latest event per (user, type) — the
    * keep-newest-per-key upsert/SCD shape every event-sourced store
    * compacts with. row_number over (ts desc, event_id desc) so
    * same-timestamp ties are deterministic; one shuffle on the key,
    * WindowGroupLimit prunes non-winners before the final filter. */
  def latestEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").desc, col("event_id").desc)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("latest_id"),
        col("us").as("latest_us"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Sorted set aggregation: each user's distinct event types as an
    * ordered array — the collect-style shape made engine-portable by
    * sorting (collect_set order is undefined in every engine; array_sort
    * pins it). Distinct-then-sort runs as aggregate machinery, never a
    * driver collect. Emitted as a joined string: array columns hash
    * differently across engine result formats, a flat string doesn't. */
  def userEventTypes(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
          .as("types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Deterministic MODE per group: the most frequent value of each event
    * type, ties to the smallest value — two-level aggregation (value
    * counts, then argmax via an ordered window), never a per-group
    * collect. Engine-portable where a native `mode()` is not: tie order
    * is unspecified in both Spark and DuckDB, so the explicit
    * (count desc, value asc) window IS the semantics. */
  def modeByType(events: DataFrame): DataFrame = {
    val counts = events.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("value"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("value").as("mode_value"), col("n"))
      .orderBy(col("event_type"))
  }

  /** Fixed-width histogram of `value` per event type: bin = floor(value /
    * width), engine-exact for the synthetic 2-dp values (the division is
    * a double op on identical inputs; floor boundaries land on exact
    * doubles). Map-side partial aggregation over (type, bin) — histogram
    * cardinality is bins × types regardless of corpus size. */
  def valueHistogram(events: DataFrame, width: Double = 10.0): DataFrame =
    events
      .groupBy(col("event_type"),
        floor(col("value") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  /** Exact per-(type, value) cume_dist from the VALUE HISTOGRAM —
    * cd(v) = (#rows ≤ v) / n, the identical integer-ratio IEEE division
    * `cume_dist()` performs over the raw rows (ties share the
    * count-at-or-below), but computed over the value-domain-bounded
    * aggregate: the one per-type window rides the histogram, never a
    * task holding every raw event of a type. Also carries `hn` (the
    * value's own row count) so callers can recover per-type totals. */
  private def cumeDistHist(events: DataFrame): DataFrame = {
    val hist = events.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("hn"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = Window.partitionBy(col("event_type"))
    hist
      .withColumn("__cum", sum(col("hn")).over(wCum))
      .withColumn("__tot", sum(col("hn")).over(per))
      .select(col("event_type"), col("value"), col("hn"),
        (col("__cum").cast("double") / col("__tot").cast("double"))
          .as("cd"))
  }

  /** Exact DISCRETE quantiles per group (percentile_disc semantics: the
    * smallest actual data value whose cumulative distribution reaches p)
    * — the variant that returns a real observation, where interpolated
    * percentile_cont (see `quantiles_by_type`) can invent one. Engines
    * disagree on native percentile_disc tie conventions, so the
    * definition is spelled out: cume_dist (an exact integer-ratio
    * division, portable) + conditional mins — with the cume_dist drawn
    * from [[cumeDistHist]]'s value histogram, so no per-type window ever
    * holds the raw event stream in one task. */
  def quantilesDiscByType(events: DataFrame): DataFrame =
    cumeDistHist(events)
      .groupBy(col("event_type"))
      .agg(min(when(col("cd") >= 0.5, col("value"))).as("p50_disc"),
        min(when(col("cd") >= 0.9, col("value"))).as("p90_disc"),
        min(when(col("cd") >= 0.99, col("value"))).as("p99_disc"),
        sum(col("hn")).cast("long").as("n"))
      .orderBy(col("event_type"))

  /** SCD TYPE-2 interval construction — turn a change-event stream into
    * validity ranges: one row per (key, value-run) with
    * [valid_from, valid_to) microsecond bounds, valid_to NULL for the
    * current value. The change-data-capture → dimension-table build
    * every warehouse runs; [[latestEvents]] is its "current snapshot"
    * projection, `customer_price_drift` its endpoints-only cousin.
    * Change rows are elected by lag() over the (us, event_id)-tie-broken
    * per-key order (exact double equality — portable, unlike an epsilon),
    * then lead() over the surviving rows closes each interval. Two
    * windows on the SAME key+order: one shuffle, the second window
    * reuses the partitioning and re-sorts the (smaller) change set. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_value").isNull || col("value") =!= col("prev_value"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("value"),
        col("us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("event_type"), col("valid_from_us"))
  }

  /** WINSORIZE per group — clamp each value to its group's exact
    * discrete [p05, p95] (percentile_disc semantics, spelled out via the
    * cume_dist integer-ratio rule like [[quantilesDiscByType]] so every
    * engine elects the same REAL observations as bounds; interpolated
    * bounds would be engine-float territory). The standard outlier
    * treatment before training a regression / computing a mean that a
    * fat tail would own. Bounds come from [[cumeDistHist]]'s value
    * histogram (value-domain-bounded — no per-type window over raw
    * rows), then broadcast back via a result-cardinality join — at
    * 100 TB the bounds table is |groups| rows, the clamp is map-side. */
  def winsorizeByType(events: DataFrame, lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val bounds = cumeDistHist(events)
      .groupBy(col("event_type"))
      .agg(min(when(col("cd") >= lo, col("value"))).as("p_lo"),
        min(when(col("cd") >= hi, col("value"))).as("p_hi"))
    events
      .join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        greatest(least(col("value"), col("p_hi")), col("p_lo"))
          .as("value_winsorized"),
        (col("value") < col("p_lo") || col("value") > col("p_hi"))
          .as("clipped"))
      .orderBy(col("event_id"))
  }

  /** TRIMMED mean per group — the robust-location companion to
    * [[winsorizeByType]]: drop values outside the exact-discrete
    * [p05, p95] bounds instead of clamping them, then take the mean of
    * the survivors as the micro-int floor of an exact DECIMAL sum.
    * Same histogram bounds pass, broadcast join-back, map-side filter;
    * n_kept > 0 always (the bounds are attained corpus values). */
  def trimmedMeanByType(events: DataFrame, lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val bounds = cumeDistHist(events)
      .groupBy(col("event_type"))
      .agg(min(when(col("cd") >= lo, col("value"))).as("p_lo"),
        min(when(col("cd") >= hi, col("value"))).as("p_hi"))
    events
      .join(broadcast(bounds), "event_type")
      .filter(col("value") >= col("p_lo") && col("value") <= col("p_hi"))
      .groupBy(col("event_type"))
      .agg(sum(col("value")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("sv"),
        count(lit(1)).as("n_kept"))
      .select(col("event_type"),
        expr("(sv * 1000000) div n_kept").as("trimmed_mean_micro"),
        col("n_kept"))
      .orderBy(col("event_type"))
  }

  /** Market-basket LIFT between event types: for each type pair, how
    * much more often one user does BOTH than independence predicts —
    * lift = N·c_ab/(c_a·c_b). The log-free PMI surrogate (PMI is just
    * log lift, and log is a libm call that is not bit-portable):
    * monotone in the same association signal, exact integers end to
    * end. Per-user distinct types are a tiny relation (users × ≤
    * |types|); the pair self-join is user-local and |types|²-bounded;
    * the totals join back broadcast. Products ride DECIMAL/HUGEINT —
    * N·c_ab·10⁶ overflows int64 at ~10⁹ users. */
  def typePairLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("c_ab"))
      .join(broadcast(totals.select(col("event_type").as("type_a"),
        col("c").as("c_a"))), "type_a")
      .join(broadcast(totals.select(col("event_type").as("type_b"),
        col("c").as("c_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("c_ab"),
        expr("CAST(CAST(n_users AS DECIMAL(38,0)) * c_ab * 1000000 div " +
          "(CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)").as("lift_micro"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Time-bounded association: event-type pairs CO-PRESENT for the same
    * user inside the same 10-minute window — [[typePairLift]]'s
    * numerator with a temporal bound (a pair a user does months apart
    * is not the session-level signal recommenders and abuse detectors
    * want). Distinct (user, window, type) triples first (the dedup that
    * keeps heavy users from quadratic blowup), then a (user, window)-
    * local self-join bounded by |types|² per cell. Exact integer
    * counts; one shuffle on (user, window). */
  def temporalCopresence(events: DataFrame,
      windowSec: Long = 600L): DataFrame = {
    val cells = events
      .select(col("user_id"),
        expr(s"ts_ns div ${windowSec * 1000000000L}").as("w"),
        col("event_type"))
      .distinct()
    cells.as("a")
      .join(cells.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.w") === col("b.w") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_copresent"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Session depth / bounce statistics per ENTRY type — the product
    * funnel's front door: of the sessions that started with X, how many
    * bounced (single-event sessions) and how deep did the rest go. The
    * session assembly is the lag/cumsum gap rule (30 min, the
    * [[sessionize]] semantics) with the (ts, event_id) tick order so
    * boundaries and the entry election are engine-deterministic; the
    * entry event is a sort-free min_by over the session. Ratios are
    * exact micro floors (nonnegative). One user-keyed shuffle; the
    * rollup runs on the session-cardinality relation. */
  def sessionStats(events: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(wOrd).isNull ||
          col("us") - lag(col("us"), 1).over(wOrd) >= gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
    sess
      .groupBy(col("user_id"), col("sid"))
      .agg(min_by(col("event_type"),
        struct(col("us"), col("event_id"))).as("entry_type"),
        count(lit(1)).as("n_events"))
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .cast("long").as("bounce_sessions"),
        sum(col("n_events")).cast("long").as("total_events"))
      .select(col("entry_type"), col("n_sessions"), col("bounce_sessions"),
        expr("bounce_sessions * 1000000 div n_sessions").as("bounce_micro"),
        expr("total_events * 1000000 div n_sessions")
          .as("mean_events_micro"))
      .orderBy(col("entry_type"))
  }

  /** Volume CONCENTRATION per instrument — Herfindahl–Hirschman index
    * of each user's share of traded size, plus the top trader's share:
    * the wash-trading / dominant-account surveillance dial (HHI → 10⁶
    * means one account IS the market; 10⁶/n means perfectly spread).
    * HHI·10⁶ = Σv_u²·10⁶ div V² on exact DECIMAL/HUGEINT — no float
    * shares are ever summed. Two hash aggregates, both on keys bounded
    * by (instrument × users) then instruments. */
  def volumeHhi(events: DataFrame): DataFrame = {
    val per = events
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("size"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("size")).cast("long").as("v"))
    per.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("tot"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
          col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("ssq"),
        max(col("v")).as("maxv"))
      .select(col("event_type"), col("n_users"),
        col("tot").cast("long").as("total_vol"),
        when(col("tot") > 0,
          expr("CAST((ssq * 1000000) div (tot * tot) AS BIGINT)"))
          .as("hhi_micro"),
        when(col("tot") > 0, expr(
          """CAST((CAST(maxv AS DECIMAL(38,0)) * 1000000) div tot
            | AS BIGINT)""".stripMargin))
          .as("top_share_micro"))
      .orderBy(col("event_type"))
  }

  /** Behavioral user COMMUNITIES: connected components over the
    * co-presence graph — two users are linked when they acted in the
    * same (window, event_type) cell, and communities are the transitive
    * closure (the fraud-ring / bot-farm / shared-session structure
    * [[temporalCopresence]]'s type-pair counts can't see; the entity-
    * resolution shape applied to behavior instead of content). Reuses
    * the dedup family's pointer-jumped min-label CC
    * ([[Dedup.connectedComponents]]) on a different pair relation —
    * the component machinery is generic, the GENERATOR is what changes.
    *
    * Scale guard: a cell self-join is quadratic in the cell's user
    * count, and one viral window would blow it up — cells above
    * `maxCell` distinct users are dropped from PAIRING (the df-cut /
    * hot-shingle pattern: mass-event windows carry no linking signal,
    * exactly like stopword shingles). Output: (user_id, community_id)
    * for every user with at least one link — min member id labels the
    * community, the dedup-groups convention. */
  def userCommunities(events: DataFrame, windowSec: Long = 600L,
      maxCell: Long = 20L): DataFrame = {
    // Shape kept deliberately (r15 optimization round): a collect_set
    // pair generator was prototyped and rejected — it gathers a cell's
    // FULL membership before the maxCell guard can apply, so one viral
    // window builds an unbounded array (the exact skew failure §2.5
    // warns about). Count-first-then-prune keeps every aggregate
    // bounded; the self-join only ever sees cells ≤ maxCell.
    val cells = events
      .select(col("user_id"),
        expr(s"ts_ns div ${windowSec * 1000000000L}").as("w"),
        col("event_type"))
      .distinct()
    val keep = cells.groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxCell)
      .select(col("w"), col("event_type"))
    val bounded = cells.join(keep, Seq("w", "event_type"))
    val pairs = bounded.as("a")
      .join(bounded.as("b"),
        col("a.w") === col("b.w") &&
          col("a.event_type") === col("b.event_type") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("id_a"), col("b.user_id").as("id_b"))
      .distinct()
    graft.operators.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("user_id"), col("rep_id").as("community_id"))
      .orderBy(col("user_id"))
  }

  /** Behavioral concentration per user: Gini impurity of the user's
    * event-type distribution — 0 for a single-type user, → 1−1/k for a
    * uniform k-type one (the bot-vs-browser dial). The identity
    * 1 − Σ(cᵢ/N)² = (N² − Σcᵢ²)·10⁶ div N² keeps it exact-integer end
    * to end (same convention as the token Gini). Two-level aggregation:
    * (user, type) census then per-user rollup — both shuffles on keys
    * that cannot skew beyond the type cardinality. */
  def userTypeGini(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        sum((col("c") * col("c"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("ssq"),
        count(lit(1)).as("n_types"))
      .select(col("user_id"), col("n").cast("long").as("n_events"),
        col("n_types"),
        expr("CAST(((CAST(n AS DECIMAL(38,0)) * n - ssq) * 1000000)" +
          " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("gini_micro"))
      .orderBy(col("user_id"))

  /** Dispersion statistics per group — variance/stddev made ENGINE-EXACT.
    * Naive stddev aggregates are distributed float sums whose combine
    * order varies run to run; instead the MOMENTS are summed in exact
    * DECIMAL (values are 2-dp, so x and x² are exact decimals) and the
    * population variance assembles from the closed form
    * (n·Σx² − (Σx)²)/n² with one double division at the end — every
    * float op is a single correctly-rounded IEEE step, identical in any
    * engine, any partitioning. sqrt is correctly rounded too, so stddev
    * inherits the guarantee. Map-side partial sums; group-cardinality
    * result. */
  def dispersionByType(events: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(18, 2)
    val x = col("value").cast(d)
    // assemble in DOUBLE from the exact decimal sums (n·Σx² in decimal
    // would overflow precision 38 and round engine-specifically; from
    // identical exact inputs, each double op is one correctly-rounded
    // IEEE step — portable)
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    // clamp at 0: float cancellation on a (near-)constant group can land
    // a hair below zero, and sqrt of that is engine trouble (NaN here,
    // an error in DuckDB)
    val varPop = greatest((nD * sxxD - sxD * sxD) / (nD * nD), lit(0d))
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"))
      .select(col("event_type"), col("n"),
        round(sxD / nD, 6).as("mean"),
        round(varPop, 6).as("var_pop"),
        round(sqrt(varPop), 6).as("stddev_pop"))
      .orderBy(col("event_type"))
  }

  /** Higher MOMENTS per group — population skewness and excess kurtosis,
    * the tail-shape statistics behind outlier policies and drift checks,
    * with the same engine-exactness discipline as [[dispersionByType]]:
    * Σx..Σx⁴ are EXACT DECIMAL sums (value is 2-dp and cast to
    * DECIMAL(8,2), so x⁴ is an exact (35,8) — magnitudes audited: 10⁴
    * rows of x ≤ 10³ keep every sum under 24 digits), and the central
    * moments assemble in double with one shared formula text on both
    * engines, each step a single correctly-rounded IEEE op. No `pow`
    * anywhere — m2^1.5 is written m2·√m2 because pow is a libm call
    * whose last ulp differs across implementations, while multiply and
    * sqrt are IEEE-exact. Degenerate (constant) groups yield NULL, not
    * NaN. Map-side partial sums; group-cardinality result. */
  def momentsByType(events: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.types.DecimalType(8, 2)
    val x = col("value").cast(d)
    val nD = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val s3 = col("s3").cast("double")
    val s4 = col("s4").cast("double")
    val m2 = greatest(
      (nD * s2 - s1 * s1) / (nD * nD), lit(0d))
    val m3 = (nD * nD * s3 - lit(3d) * nD * s1 * s2
      + lit(2d) * s1 * s1 * s1) / (nD * nD * nD)
    val m4 = (nD * nD * nD * s4 - lit(4d) * nD * nD * s1 * s3
      + lit(6d) * nD * s1 * s1 * s2 - lit(3d) * s1 * s1 * s1 * s1) /
      (nD * nD * nD * nD)
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      .select(col("event_type"), col("n"),
        round(s1 / nD, 6).as("mean"),
        round(m2, 6).as("var_pop"),
        when(m2 > 0, round(m3 / (m2 * sqrt(m2)), 6)).as("skewness"),
        when(m2 > 0, round(m4 / (m2 * m2) - lit(3d), 6)).as("kurtosis_ex"))
      .orderBy(col("event_type"))
  }

  /** Trend regression per group — Pearson correlation and least-squares
    * slope of `value` over TIME, the is-this-metric-drifting query.
    * Same portability discipline as [[dispersionByType]]: both variables
    * are exact decimals (2-dp value; whole epoch-seconds), all five
    * moments (Σx, Σy, Σxy, Σx², Σy²) are exact DECIMAL sums with
    * magnitudes audited against precision 38, and the closed forms
    * assemble in double at the end — native corr/regr_slope aggregates
    * are combine-order float sums and would not hash-match across
    * engines. Slope is reported per DAY (per-second slopes round to
    * zero at 6 dp). Degenerate groups (constant value or single instant:
    * a zero variance) emit NULL, not an engine-divergent ÷0. */
  def valueTrendByType(events: DataFrame): DataFrame = {
    val dx = org.apache.spark.sql.types.DecimalType(18, 2)
    // 19 digits: forces int128-backed decimals in DuckDB too — an
    // int64-backed (≤18-digit) y² product trips its precision check
    val dy = org.apache.spark.sql.types.DecimalType(19, 0)
    val x = col("value").cast(dx)
    // y in SECONDS, not micros: keeps y² sums ~1e23 ≪ 10^38 (exact);
    // integer DIV (floor), never a double divide that truncates off-by-one
    // at a misrounded boundary
    val y = col("ysec").cast(dy)
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    events
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      .withColumn("ysec", expr("us div 1000000"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("event_type"), col("n"),
        when(varX > 0 && varY > 0,
          round(cov / (sqrt(varX) * sqrt(varY)), 6)).as("corr_vt"),
        when(varY > 0,
          round(cov / varY * 86400d, 6)).as("slope_per_day"))
      .orderBy(col("event_type"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: keep the k
    * smallest distinct h60 hashes of the key; the k-th smallest estimates
    * the cardinality as (k−1)·2^60/kth — the classic bottom-k estimator
    * (Bar-Yossef et al.), the same family HyperLogLog refines. Groups
    * with fewer than k distinct keys are EXACT (the sketch holds them
    * all).
    *
    * Unlike approx_count_distinct (HLL++, engine-private register
    * layout), this sketch is engine-REPRODUCIBLE: the oracle rebuilds the
    * identical hashes, ranks, and estimate — sketch error included.
    * Shape at scale: the distinct pass dedups map-side (partial
    * aggregate) so the shuffle carries distinct (group, hash) pairs
    * only, and the rank filter is a WindowGroupLimit — per-partition
    * top-k heaps before the final window, never a full sort. The
    * streaming twin ([[graft.streaming.StreamKmv]]) folds the same
    * sketch incrementally: bottom-k sets are mergeable (min-union), so
    * streamed ≡ batch exactly. */
  def kmvDistinct(events: DataFrame, k: Int = 64): DataFrame = {
    import graft.functions.PortableHash.h60
    kmvEstimate(
      events.select(col("event_type"), h60(col("user_id").cast("string")).as("h")),
      k)
  }

  /** Rank-filter + estimate over raw (event_type, h) rows — shared by the
    * batch query above and the streaming fold ([[graft.streaming.StreamKmv]])
    * so both produce the identical estimate by construction. */
  def kmvEstimate(hashes: DataFrame, k: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    hashes
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col("event_type"), col("n_kept"), col("kth_min"),
        // kth_min = 0 (an all-zero md5 prefix, p≈2^-60) would be an
        // engine-divergent ÷0 (Spark Inf, DuckDB NULL) — emit NULL
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .when(col("kth_min") > 0, round(lit((k - 1).toDouble) *
            (lit(math.pow(2, 60)) / col("kth_min")), 3)).as("n_est"))
      .orderBy(col("event_type"))
  }

  /** HyperLogLog distinct-user estimate per event_type, REGISTER-EXACT
    * against the SQL oracle — the other canonical mergeable-distinct
    * sketch next to [[kmvDistinct]] (KMV's error is ~1.3/√k with k·8
    * bytes; HLL gets ~1.04/√m from m·6 BITS, the production choice when
    * millions of group sketches must ship over a shuffle or live in a
    * serving store). m = 2^b registers; bucket = h60 mod m, and the
    * register is ρ(remaining 54-bit field) = leading-zeros + 1 —
    * computed portably as 55 − length(bin(rem)) (both engines' `bin`
    * drops leading zeros; the all-zero field takes rank 55).
    *
    * Everything after the per-(type, bucket) max is EXACT integer
    * arithmetic: the harmonic sum Σ2^(−M_j) is assembled as
    * Σ 2^(maxM−M_j) / 2^maxM with a BIGINT numerator (≤ m·2^55 < 2^62),
    * so the one double division at the end is a single correctly-rounded
    * IEEE op — no float fold, no libm, engine-identical. Empty registers
    * enter as 2^maxM each. The raw-HLL small-range bias correction
    * (linear counting) needs ln — libm, NOT portable — so this emits
    * the raw estimate plus the zero-register count V; a consumer applies
    * corrections driver-side where bit-portability no longer matters.
    *
    * Shape at scale: partial-aggregated (type, bucket) max — ≤ m rows
    * per group cross the shuffle regardless of input size — then a
    * group-cardinality assembly. Registers max-merge, so the streaming /
    * cross-shard union is the same fold. */
  def hllDistinct(events: DataFrame, b: Int = 6): DataFrame = {
    import graft.functions.PortableHash.h60
    hllEstimate(hllRegisters(
      events.select(col("event_type"),
        h60(col("user_id").cast("string")).as("h")), b), b)
  }

  /** (event_type, bucket, reg) register table from raw (event_type, h)
    * rows — the partial-aggregated, max-MERGEABLE sketch state shared
    * with the streaming fold ([[graft.streaming.StreamHll]]). */
  def hllRegisters(hashes: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    // the remainder field is 60−b bits wide, so the leading-zero rank of
    // an all-zero field is (60−b)+1 and otherwise (61−b) − bitlen(rem) —
    // derived from b, not pinned to the b=6 constants (55)
    val zeroRank = (61 - b).toLong
    hashes
      .withColumn("bucket", pmod(col("h"), lit(m.toLong)))
      .withColumn("rem", expr(s"h div $m"))
      .withColumn("rho",
        when(col("rem") === 0, lit(zeroRank))
          .otherwise(lit(zeroRank) - length(bin(col("rem")))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  /** Exact-integer estimate assembly over a register table — same
    * projection for batch and stream, so streamed ≡ batch by
    * construction. */
  def hllEstimate(regs: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    // canonical α_m (Flajolet et al.): table values for small m, the
    // asymptotic formula otherwise — matches the b the registers carry
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // Σ 2^(maxM − M_j) needs maxM first: one tiny pass over the ≤ m·|types|
    // register rows, joined back for the exact-integer assembly
    val perType = regs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_used"), max(col("reg")).as("max_reg"))
    regs.join(perType, "event_type")
      .groupBy(col("event_type"), col("n_used"), col("max_reg"))
      .agg(sum(expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(max_reg - reg AS INT)) AS BIGINT)"))
        .cast("long").as("s_present"))
      .withColumn("s_num", col("s_present") +
        (lit(m.toLong) - col("n_used")) *
          expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(max_reg AS INT)) AS BIGINT)"))
      .select(col("event_type"),
        (lit(m.toLong) - col("n_used")).as("v_zero"),
        col("max_reg"), col("s_num"),
        // α_m·m² is exact (0.709 · 2^12 scales the exponent only), so the
        // whole estimate is one correctly-rounded IEEE divide
        round(lit(alpha * m * m) * pow(lit(2.0), col("max_reg")) /
          col("s_num").cast("double"), 6).as("hll_est"))
      .orderBy(col("event_type"))
  }

  /** ORDERED funnel conversion (view → click → purchase): how many users
    * completed each step IN ORDER — a click only counts after the user's
    * first view, a purchase only after that click. Three chained
    * min-over-partition windows on ONE user_id shuffle (each step's
    * timestamp conditions on the previous step's column, so the windows
    * evaluate sequentially over the same exchange — no self-joins, no
    * per-user collect). The per-user step times collapse to one row per
    * user before the final count: a driver-sized aggregate. */
  def funnelSteps(events: DataFrame): DataFrame =
    funnelFromUs(events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us")))

  /** WINDOWED funnel — the ClickHouse-`windowFunnel` read the unbounded
    * [[funnelSteps]] can't give: a chain only counts when every step
    * lands within `windowSec` of its OPENING view, and the chain may
    * open at ANY view (not just the user's first — a user whose first
    * view went stale but who converted from a later one still counts).
    * Steps are strictly ordered (click after view, purchase after that
    * click). Output is one row: distinct users reaching level ≥1/≥2/≥3.
    *
    * Shape: each step is one forward as-of pass ([[AsOfJoin.asOfForward]]
    * — union + one ordered window per step, never a per-user quadratic
    * join; strictness via a +1 μs probe on the integer timeline). The
    * windowing test against the opening view is a plain filter on the
    * carried v_us. Per-level counts are nested by construction, so the
    * final rollup is max-level per user then three conditional sums. */
  def funnelWindow(events: DataFrame, windowSec: Long = 3600L): DataFrame =
    funnelWindowRollup(
      funnelWindowLevels(events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")), windowSec),
      windowSec)

  /** Per-user deepest windowed-chain level over raw (user_id,
    * event_type, us) rows — shared with
    * [[graft.streaming.StreamFunnelWindow]] so the streaming fold's
    * readout is the identical computation by construction. Emits one
    * (user_id, lvl ∈ 1..3) row per user with ≥ 1 view. */
  def funnelWindowLevels(e: DataFrame, windowSec: Long): DataFrame = {
    import graft.operators.AsOfJoin
    val wUs = windowSec * 1000000L
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("v_us")).distinct()
    def stepTable(t: String, payloadName: String) = e
      .filter(col("event_type") === t)
      .select(col("user_id"), col("us")).distinct()
      .select(col("user_id"), col("us"),
        struct(col("us").as(payloadName)).as("p"))
    // first click STRICTLY after the view (asOfForward is inclusive >=,
    // so probe at v_us + 1 on the integer μs timeline)
    val vc = AsOfJoin.asOfForward(
      views.withColumn("probe", col("v_us") + 1),
      stepTable("click", "cus"),
      "user_id", "probe", "us", "p", "mc")
      .select(col("user_id"), col("v_us"), col("mc.cus").as("c_us"))
    // surviving chains (≤ |views| rows) feed BOTH the level union and
    // the purchase as-of pass — checkpoint so the first union-window
    // over the full event relation runs once, not twice
    val alive = vc.filter(col("c_us").isNotNull &&
      col("c_us") <= col("v_us") + wUs)
      .transform(d => graft.plans.PlanTrace.cp(d, tag = "funnel_alive"))
    val l3 = AsOfJoin.asOfForward(
      alive.withColumn("probe2", col("c_us") + 1),
      stepTable("purchase", "pus"),
      "user_id", "probe2", "us", "p", "mp")
      .filter(col("mp.pus").isNotNull &&
        col("mp.pus") <= col("v_us") + wUs)
    views.select(col("user_id"), lit(1).as("lvl"))
      .union(alive.select(col("user_id"), lit(2).as("lvl")))
      .union(l3.select(col("user_id"), lit(3).as("lvl")))
      .groupBy(col("user_id")).agg(max(col("lvl")).as("lvl"))
  }

  /** One-row readout over per-user levels ([[funnelWindowLevels]]). */
  def funnelWindowRollup(perUser: DataFrame, windowSec: Long): DataFrame =
    perUser
      .agg(
        coalesce(sum(when(col("lvl") >= 1, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_level1"),
        coalesce(sum(when(col("lvl") >= 2, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_level2"),
        coalesce(sum(when(col("lvl") >= 3, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_level3"))
      .select(lit(windowSec).as("window_sec"), col("n_level1"),
        col("n_level2"), col("n_level3"))

  /** PEAK CONCURRENCY — the maximum number of user sessions open at the
    * same instant (and the first instant it is reached): the capacity/
    * load-sizing read on the sessionized activity ([[sessionStats]]'
    * gap rule), and the classic sweep-line max-intersections problem.
    * Sessions are inclusive [first, last] event-μs intervals; the sweep
    * is +1 at start, −1 at end+1, net deltas per distinct timestamp
    * (ties collapse BEFORE the cumsum, so the running count never
    * depends on tie order), running-sum, argmax with first-timestamp
    * tie-break.
    *
    * Scale shape: the data-sized cumsum is NOT a single-partition
    * window — boundary points are partitioned by DAY with per-day
    * carry-in offsets from a day-cardinality prefix sum (the
    * shard-parallel cumsum of `Sampling.tokenLayout` keyed by calendar
    * bucket), so only the day-level table crosses a global window. The
    * peak is TakeOrderedAndProject, never a global sort. */
  def maxConcurrency(events: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(wOrd).isNull ||
          col("us") - lag(col("us"), 1).over(wOrd) >= gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    // boundary points (≤ 2·sessions rows) feed BOTH the day-totals
    // aggregate and the sweep join — checkpoint so the session assembly
    // over the full event relation runs once, not twice
    val deltas = sess.select(col("start_us").as("us"), lit(1L).as("d"))
      .union(sess.select((col("end_us") + 1).as("us"), lit(-1L).as("d")))
      .groupBy(col("us")).agg(sum(col("d")).cast("long").as("net"))
      .withColumn("day", expr("us div 86400000000"))
      .transform(d => graft.plans.PlanTrace.cp(d, tag = "conc_deltas"))
    // day-cardinality carry-in: the only relation crossing a global window
    val dayTotals = deltas.groupBy(col("day"))
      .agg(sum(col("net")).cast("long").as("day_net"))
    val wDays = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = dayTotals
      .withColumn("carry", coalesce(sum(col("day_net")).over(wDays), lit(0L)))
      .select(col("day"), col("carry"))
    val wDay = Window.partitionBy(col("day")).orderBy(col("us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(offsets), "day")
      .withColumn("conc", col("carry") + sum(col("net")).over(wDay))
      .orderBy(col("conc").desc, col("us")).limit(1)
      .select(col("conc").as("max_concurrent"), col("us").as("at_us"))
  }

  /** Core of [[funnelSteps]] over raw (user_id, event_type, us) rows —
    * shared with [[graft.streaming.StreamFunnel]] so the streaming fold's
    * readout is the identical computation by construction. */
  def funnelFromUs(events: DataFrame): DataFrame =
    funnelTimes(events)
      .agg(count(col("v_us")).as("n_view"),
        count(col("c_us")).as("n_click_after_view"),
        count(col("p_us")).as("n_purchase_after_click"),
        count(lit(1)).as("n_users"))

  /** Per-user step times (one row per user): first view, first click
    * after it, first purchase after that. */
  def funnelTimes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("v_us",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c_us",
        min(when(col("event_type") === "click" && col("us") > col("v_us"),
          col("us"))).over(w))
      .withColumn("p_us",
        min(when(col("event_type") === "purchase" && col("us") > col("c_us"),
          col("us"))).over(w))
      .select(col("user_id"), col("v_us"), col("c_us"), col("p_us"))
      .distinct()
  }

  /** Benford first-digit audit per event type — the forensic
    * data-quality read (Benford 1938; Nigrini's fraud-audit use): value
    * populations spanning orders of magnitude follow P(d) = log₁₀(1 +
    * 1/d) in their first significant digit, and a type whose digit
    * histogram deviates hard is the classic signature of synthetic,
    * clipped, defaulted, or hand-entered values — worth reading BEFORE
    * any model trains on the column.
    *
    * Determinism: the first significant digit is extracted WITHOUT
    * float logs — values go to exact integer cents (2-dp doubles ⇒
    * round lands on the integer, never a .5 tie) and the digit is the
    * first character of the integer's decimal rendering, identical on
    * both engines; ×100 shifts the decimal point and cannot change
    * significant digits. Counts and p_micro are exact integers; the
    * Benford reference enters once as a micro-floored log expression
    * written identically in both engines. The (type, digit) grid is
    * restored (missing digits report n = 0 against their full Benford
    * mass — "no 9s ever" is exactly the anomaly the audit exists for).
    *
    * Shape at 100 TB: one scan → (type, digit) counts, ≤ 9·types rows;
    * everything after is grid arithmetic on that bounded relation. */
  def benfordValues(events: DataFrame): DataFrame =
    benfordFromCounts(benfordCounts(events))

  /** The (type, digit) count census — the map-side half of
    * [[benfordValues]], exposed because it is exactly the bounded
    * mergeable state the streaming fold maintains. */
  def benfordCounts(events: DataFrame): DataFrame =
    events.filter(col("value") > 0)
      .select(col("event_type"),
        expr("CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .groupBy(col("event_type"), col("digit"))
      .agg(count(lit(1)).as("n"))

  /** Grid readout over a (type, digit, n) census — shared verbatim by
    * the batch query and the streaming table. */
  def benfordFromCounts(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy(col("event_type"))
      .agg(sum(col("n")).cast("long").as("total"))
    tot.select(col("event_type"), col("total"),
        explode(sequence(lit(1L), lit(9L))).as("digit"))
      .join(cnt, Seq("event_type", "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("event_type"), col("digit"), col("n"),
        expr("n * 1000000 div total").as("p_micro"),
        expr("CAST(floor(ln(1 + 1.0 / digit) / ln(10) * 1000000)" +
          " AS BIGINT)").as("benford_micro"))
      .withColumn("dev_micro", abs(col("p_micro") - col("benford_micro")))
      .orderBy(col("event_type"), col("digit"))
  }

  /** Kaplan–Meier retention survival curve — the censoring-aware
    * companion [[retentionCohorts]] is not: cohort counting treats a
    * user last seen yesterday as churned at their last event, which
    * systematically UNDERSTATES retention near the observation horizon.
    * The KM estimator (Kaplan & Meier 1958) prices that in: a user
    * whose last event falls within `horizonDays` of the corpus's final
    * timestamp is CENSORED at their observed lifetime (still at risk,
    * not a death), and the survival probability multiplies only over
    * actual death days, S(t) = Π_{u≤t} (1 − d_u/n_u) with n_u = users
    * whose lifetime (censored or not) is ≥ u days.
    *
    * Determinism: lifetimes are integer day buckets of the exact ns
    * spans; d/c/n_risk are exact counts; each death-day factor enters
    * as ⌊ln(1 − d/n)·10⁶⌋ and the running product is an exact BIGINT
    * prefix sum of those micro-logs — `surv6` is one final
    * exp()/round() over the integer. A day where d = n_risk drives S
    * to exactly 0 (ln undefined): logsurv goes NULL and surv6 0.0 from
    * that day on, via an explicit absorbed flag — NULL-skipping sums
    * would silently revive the curve.
    *
    * Shape at 100 TB: one user_id-keyed aggregate (first/last event),
    * then everything lives on the day spine — a relation bounded by
    * the observation span in days, where the two cumulative windows
    * (reverse for at-risk, forward for the log-product) run on the
    * single-partition-window allowance for bounded spines. */
  def survivalRetention(events: DataFrame, horizonDays: Long = 1L): DataFrame =
    survivalFromSpans(events.groupBy(col("user_id"))
      .agg(min(col("ts_ns")).as("f"), max(col("ts_ns")).as("l")),
      horizonDays)

  /** The KM readout over a per-user (f, l) ns-span relation — split
    * from [[survivalRetention]] so the streaming fold (which maintains
    * exactly this relation as min/max-mergeable state) shares the
    * readout code instead of reimplementing the spine arithmetic. The
    * observation horizon t_end = max(l) re-derives from the spans, so
    * batch and stream agree on it by construction. */
  def survivalFromSpans(spans: DataFrame, horizonDays: Long = 1L): DataFrame = {
    val dayNs = 86400000000000L // 24·3600·1e9
    val hor = spans.agg(max(col("l")).as("t_end"))
    val byDay = spans.crossJoin(broadcast(hor))
      .select(expr(s"(l - f) div $dayNs").as("day"),
        when(col("l") >= col("t_end") - lit(horizonDays * dayNs), 1L)
          .otherwise(0L).as("cens"))
      .groupBy(col("day"))
      .agg(sum(when(col("cens") === 0L, 1L).otherwise(0L)).as("d"),
        sum(col("cens")).as("c"))
    val rev = Window.orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val fwd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_risk", sum(col("d") + col("c")).over(rev))
      .withColumn("step", when(col("d") > 0 && col("d") < col("n_risk"),
        expr("CAST(floor(ln(1 - CAST(d AS DOUBLE) / n_risk) * 1000000)" +
          " AS BIGINT)")).otherwise(lit(0L)))
      .withColumn("absorbed", max(when(col("d") === col("n_risk"), 1L)
        .otherwise(0L)).over(fwd))
      .withColumn("logsurv_micro",
        when(col("absorbed") === 1L, lit(null).cast("long"))
          .otherwise(sum(col("step")).over(fwd)))
      .select(col("day"), col("n_risk"), col("d"), col("c"),
        col("logsurv_micro"),
        when(col("absorbed") === 1L, lit(0.0)).otherwise(
          round(exp(col("logsurv_micro").cast("double") / 1e6), 6))
          .as("surv6"))
      .orderBy(col("day"))
  }

  /** Weekly retention cohorts: users grouped by their FIRST-activity week,
    * counted in every later week they return — the (cohort, offset) →
    * users matrix behind every retention curve. Weeks are integer
    * epoch-week indices (us DIV week) so bucketing is engine-exact; the
    * per-user first week is a min window on the same user_id shuffle the
    * distinct rides; the final aggregate is cohorts×offsets-sized. */
  /** DAU / trailing-WAU STICKINESS — the classic product-engagement
    * ratio (DAU/WAU, "how many of this week's actives came back
    * today"): per active day, the distinct daily actives, the distinct
    * actives over the trailing 7 days ending that day, and the
    * integral micro ratio. Early days read against a window truncated
    * at stream start (day 0's trailing week IS day 0), the standard
    * convention.
    *
    * Shape at 100 TB: the corpus collapses to the distinct (day, user)
    * relation (one map-combined shuffle — days × actives, the activity
    * matrix a product warehouse materializes anyway); the trailing
    * window is a map-side 7-day explode of that relation, NOT a
    * per-day self-join (each pair contributes to the ≤ 7 target days
    * it is visible from), distinct'd and counted per day. Day-bounded
    * output. */
  def dauStickiness(events: DataFrame): DataFrame =
    dauStickinessFrom(dayUserMatrix(events))

  /** The distinct (day, user) activity matrix — the standing relation
    * the stickiness readout (and its streaming twin) fold against;
    * distinct-union mergeable, so at-least-once redelivery is absorbed
    * by construction. */
  def dayUserMatrix(events: DataFrame): DataFrame =
    events
      .select(expr("(ts_ns div 1000) div 86400000000").as("day"),
        col("user_id"))
      .distinct()

  /** The readout half over a (possibly standing) activity matrix —
    * shared verbatim with `StreamDau`, so streamed ≡ batch by
    * construction. */
  def dauStickinessFrom(dayUser: DataFrame): DataFrame = {
    val dau = dayUser.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
        col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_micro"))
      .orderBy(col("day"))
  }

  /** EVENT-CONCENTRATION audit — exact Gini coefficient of per-user
    * event counts plus the top-decile share: the "do 10% of users
    * generate 90% of traffic" read that decides rate limits, sampling
    * strata and whether per-user state will skew (a Gini near 1 says
    * the hottest keys ARE the workload). Gini via the rank identity
    * G = (2·Σᵢ i·cᵢ − (n+1)·Σc) / (n·Σc) over counts ranked ascending
    * (ties by user_id — deterministic), on the micro grid with the
    * wide-decimal products both engines share (2·Σ(i·c)·10⁶ passes 2⁶³
    * exactly at the event volumes this exists for). Numerator is
    * provably nonnegative under ascending rank, so floor division is
    * engine-identical.
    *
    * Shape at 100 TB: the corpus collapses to per-user counts (one
    * map-combined shuffle); the rank window runs over that AGGREGATE
    * (user-cardinality, never events), and the verdict is one row. */
  def userGini(events: DataFrame): DataFrame =
    Profiling.giniFrom(events.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("cnt")))

  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekUs = 604800000000L // 7·24·3600·1e6
    val w = Window.partitionBy(col("user_id"))
    events
      // integer DIV, not `/`: Column./ on longs is a double divide, and a
      // floor over it can misround at exact week boundaries
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("wk", expr(s"us div $weekUs"))
      .drop("us")
      .withColumn("cohort_week", min(col("wk")).over(w))
      .select(col("user_id"), col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /**
   * Per-user sliding-window rate limit, batch analytic form: for every event,
   * the number of events by the same user in the 1-second window ending at
   * (and including) it — i.e. `(ts-1s, ts]`, mirroring the Redis
   * ZREM/ZADD/ZCARD window (`ratelimit.go:43-49`); events over `limit` are
   * flagged as the 429 path (`ratelimit.go:54-60`).
   *
   * One shuffle on user_id; RANGE frame over epoch-micros so the window is
   * exact at the source's microsecond resolution.
   */
  def rateLimitFlags(events: DataFrame, limit: Int = 2): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-999999L, 0L) // [ts-999999us, ts] == (ts-1s, ts]
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("in_window", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("in_window"),
        (col("in_window") > limit).as("limited"))
      .orderBy(col("event_id"))
  }

  /** Event-type TRANSITION matrix: counts of consecutive (prev → next)
    * event-type pairs per user timeline — the Markov-chain / user-journey
    * summary behind "what do users do after a view?". One shuffle on
    * user_id for the lag window ((us, event_id) order — deterministic
    * under timestamp ties), then a result-cardinality (|types|²-bounded)
    * aggregate; first events (no predecessor) drop out. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Stationary distribution of the user-behavior Markov chain — the
    * asymptotic read [[eventTransitions]]'s one-step counts only hint
    * at: where does a user's session settle if the observed transition
    * structure persists? Power iteration over the transition matrix,
    * the [[Dedup.dupPagerank]] exact-integer convention: masses start
    * at 10⁶ per state, each step floors every (from→to) term
    * p·n div n_from individually and sums (order-independent BIGINT
    * arithmetic — bit-portable under any partitioning), `iters` steps
    * unrolled. Masses are unnormalized micro units (Σ decays only by
    * the per-term floor loss); ratios between states are the read.
    *
    * Shape at 100 TB: ONE data-sized pass (the per-user lag window the
    * transition census already pays); everything after is `iters`
    * joins over the states²-bounded matrix — broadcast-sized by the
    * attribute domain, never corpus-sized. */
  def markovStationary(events: DataFrame, iters: Int = 8): DataFrame = {
    val trans = eventTransitions(events)
      .select(col("prev_type").as("from_type"),
        col("next_type").as("to_type"), col("n"))
    val outDeg = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    // the states²-bounded matrix is the iteration's only input —
    // checkpoint it ONCE so the 8 steps join a tiny materialized
    // relation instead of chaining 8 copies of the data-sized lag pass
    // into one plan (the join_size_audit zero-re-scan convention)
    val t = graft.plans.PlanTrace.cp(
      trans.join(outDeg, "from_type"), tag = "markov_t")
    var p = t.select(col("from_type").as("state"), lit(1000000L).as("p"))
      .distinct()
    (1 to iters).foreach { _ =>
      p = t.join(p, col("from_type") === col("state"))
        .select(col("to_type"), expr("p * n div n_from").as("m"))
        .groupBy(col("to_type"))
        .agg(sum(col("m")).as("p"))
        .select(col("to_type").as("state"), col("p"))
    }
    t.select(col("from_type").as("state"), col("n_from")).distinct()
      .join(p, "state")
      .select(col("state"), col("n_from"), col("p").as("p_micro"))
      .orderBy(col("state"))
  }

  /** EQUI-DEPTH histogram per event type: `buckets` quantile buckets of
    * equal population (ntile over the (value, event_id) total order —
    * the tiebreak makes bucket boundaries engine-deterministic where a
    * bare value order is not), each reporting its population and value
    * range. The complement of the fixed-width [[valueHistogram]]: width
    * adapts to density, so heavy-tailed metrics get resolution where the
    * mass is. The per-type ntile comes from
    * [[graft.operators.Ranks.withNtileBucket]]'s cell-partitioned closed
    * form — a type's whole event stream never sorts in one task; result
    * is |types|·buckets rows. */
  def equidepthHistogram(events: DataFrame, buckets: Int = 4): DataFrame =
    graft.operators.Ranks.withNtileBucket(
      events.select(col("event_type"), col("value"), col("event_id")),
      buckets, col("value"), Seq(col("event_id")), "bucket",
      partition = Seq("event_type"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("event_type"), col("bucket"))

  /** Distinct users per SLIDING window (1 h every 30 min) per type — the
    * rolling-reach metric. Each event explodes to its two overlapping
    * windows (slide = width/2 ⇒ exactly 2), then one exact
    * count-distinct per (type, window). At true user-cardinality scale
    * the same shape takes approx_count_distinct or the KMV sketch
    * ([[kmvDistinct]]) — the explode+group skeleton is unchanged. */
  def slidingActiveUsers(events: DataFrame, slideSec: Long = 1800L): DataFrame = {
    val slotNs = slideSec * 1000000000L
    events
      .select(col("event_type"), col("user_id"),
        explode(array(expr(s"ts_ns div $slotNs"),
          expr(s"ts_ns div $slotNs") - 1)).as("slot"))
      .select(col("event_type"), col("user_id"),
        (col("slot") * slideSec).as("window_start"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Log₂-scale value histogram per type — the heavy-tail profile a
    * linear-bin histogram ([[valueHistogram]]) flattens. The bin is
    * floor(log₂ cents) computed as binary-string length on the EXACT
    * integer cents — no libm log whose ulp at power-of-two boundaries
    * the engines could disagree on. Map-side projection, one aggregate
    * on ≤ ~25 bins per type. */
  def log2Histogram(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .select(col("event_type"),
        (length(expr("bin(cents)")) - 1).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))

  /** Median absolute deviation per group — the robust dispersion measure
    * (outlier-immune where stddev is not; the robust-stats sibling of
    * [[winsorizeByType]]). Two exact interpolated medians: the per-group
    * median joins back BROADCAST (group cardinality is small by
    * definition), each |x − med| is one correctly-rounded double op, and
    * the second median re-sorts the same group partition. Two shuffles on
    * the group key, nothing driver-side. */
  def madByType(events: DataFrame): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    events.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("ad"))
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(ad, 0.5)"), 6).as("mad"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** MAD-based robust outlier flags per type — [[madByType]]'s decision
    * form: |x − median| > 3·MAD, the standard robust z-score gate (the
    * Hampel identifier at the conventional 3σ-equivalent cut). Exact
    * integers end to end: on cent values, dev2 = |2·cents − med2| and
    * mad4 = 2·median(dev2) are integers (an interpolated median of
    * integers is a multiple of ½, so doubling it is an exact double →
    * BIGINT cast), and the flag |x−m| > 3·MAD becomes 2·dev2 > 3·mad4 —
    * no float comparison anywhere, so the count can't flip on a ulp.
    *
    * Shape at 100 TB: same as [[madByType]] — two group-keyed
    * aggregates with the tiny median relation broadcast back; the flag
    * itself is a map-side projection. */
  def anomalyMad(events: DataFrame): DataFrame = {
    val cents =
      expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents")
    val base = events.select(col("event_type"), cents)
    val med = base.groupBy(col("event_type"))
      .agg(expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)").as("med2"))
    val dev = base.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med2"),
        abs(col("cents") * 2 - col("med2")).as("dev2"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("CAST(2 * percentile(dev2, 0.5) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("med2")).as("med2"), max(col("mad4")).as("mad4"))
      .orderBy(col("event_type"))
  }

  /** RFM (recency / frequency / monetary) quartile segmentation over the
    * purchase stream — the standard customer-value grid. Per user:
    * recency = last purchase instant, frequency = purchase count,
    * monetary = exact cent sum; each scored 1–4 by `ntile(4)` over a
    * TIE-BROKEN total order (metric, then user_id), so bucket membership
    * is engine-deterministic. The output is the 4×4×4 segment grid with
    * user counts and exact monetary mass.
    *
    * Shape at 100 TB: the scored relation is USER-cardinality (one row
    * per user after the first aggregate), orders of magnitude below the
    * event count — and each quartile comes from
    * [[graft.operators.Ranks.withNtileBucket]]'s cell-partitioned closed
    * form, so even a 10⁹-user grid never funnels through a single-task
    * sort (the oracle keeps stating ntile; the driver hash proves the
    * forms equal). */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns div 1000").as("us"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("freq"),
        sum(col("cents")).as("cents"))
    Ranks.withNtileBuckets(perUser, Seq(
        (4, col("last_us"), Seq(col("user_id")), "r_score"),
        (4, col("freq"), Seq(col("user_id")), "f_score"),
        (4, col("cents"), Seq(col("user_id")), "m_score")))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("segment_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Top-k most common 3-step user journeys — the event-type trigram
    * census over per-user time-ordered paths ([[eventTransitions]] is the
    * bigram form; three steps is where funnels and loops become visible).
    * Path order is the deterministic (ts_ns, event_id) total order within
    * a user; counts are global; top-k by (count desc, path).
    *
    * Shape at 100 TB: ONE user-keyed shuffle for the lead() window, then
    * an aggregate bounded by |types|³ rows and a TakeOrdered cut — no
    * global sort of data-sized relations. */
  def userPathTopK(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("b", lead(col("event_type"), 1).over(w))
      .withColumn("c", lead(col("event_type"), 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .select(concat_ws(">", col("event_type"), col("b"), col("c")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }
}
