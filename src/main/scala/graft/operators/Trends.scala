package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Statistic

/**
 * The flagship analytical query — the only query the reference serves
 * (`trends/listing/service.go:47-62`, SURVEY.md §2.3):
 *
 *   SELECT toStartOfInterval(toDateTime(time_placed), INTERVAL 10 minute) w,
 *          min(rate), max(rate), avg(rate), median(rate)
 *   FROM trades
 *   WHERE time_placed BETWEEN ? AND ?           -- both bounds INCLUSIVE
 *     AND currency_from = ? AND currency_to = ?
 *   GROUP BY w ORDER BY w
 *
 * Spark-first realization: pushed-down range + equality filters on the
 * parquet scan, `window()` tumbling aggregation (partial+final hash agg),
 * exact `median` (deviation from ClickHouse's approximate `median`,
 * documented in SURVEY.md §2.3 A3), sort at result cardinality.
 *
 * Scale notes (100 TB): the two filters reach the scan (row-group pruning on
 * a time-sorted store, dictionary filter on the pair columns); the aggregate
 * is partial→final over the window key so the shuffle carries only
 * (windows × pairs) rows, not input rows. Empty windows are absent — the
 * reference does no gap-fill.
 */
object Trends {

  /** Typed flagship entry: Dataset[Statistic] over a stored trades table. */
  def trends(
      trades: DataFrame,
      from: Timestamp,
      to: Timestamp,
      currencyFrom: String,
      currencyTo: String): Dataset[Statistic] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .filter(
        col("time_placed") >= lit(from) && col("time_placed") <= lit(to) &&
        col("currency_from") === currencyFrom &&
        col("currency_to") === currencyTo)
      .groupBy(window(col("time_placed"), "10 minutes"))
      .agg(
        min(col("rate")).as("min"),
        max(col("rate")).as("max"),
        avg(col("rate")).as("mean"),
        median(col("rate")).as("median"))
      .select(col("window.start").as("window"), col("min"), col("max"),
        col("mean"), col("median"))
      .orderBy(col("window"))
      .as[Statistic]
  }

  /**
   * Same operator shape over any (ts, key, value) table — used to run the
   * flagship semantics against the driver's `events` table for the
   * DuckDB-oracle gate. Window start is emitted as epoch seconds (LONG) and
   * the float aggregates rounded to 6 dp so the hash-compare is stable
   * across engines.
   */
  def trendsOf(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      keyValue: String,
      valueCol: String,
      fromTs: String,
      toTs: String,
      slide: Option[String] = None): DataFrame = {
    val from = Timestamp.valueOf(fromTs)
    val to = Timestamp.valueOf(toTs)
    // When the source keeps a raw nanos column under a derived timestamp,
    // transpose the range bounds onto it: predicates on the derived
    // column can't cross the conversion arithmetic, but the raw bounds
    // are pushed to the parquet scan and prune row groups. Prefer the
    // untouched scan attribute (ts_ns_raw) — the μs-aligned ts_ns is
    // itself derived (DIV 1000 * 1000) and would not push; the bounds are
    // ms-aligned, so raw and truncated filters admit the same rows. The
    // ns-precision bounds are AUTHORITATIVE (exact [from, to] at full
    // resolution): an event in (to, to+1µs) is excluded here even though
    // its micro-truncated ts still equals `to`. The tsCol filter below is
    // then implied (floor(ns/1000) is monotone) but kept for sources
    // without a raw-nanos column.
    val prefiltered =
      Seq("ts_ns_raw", "ts_ns").find(df.columns.contains) match {
        case Some(c) =>
          df.filter(
            col(c) >= lit(from.getTime * 1000000L) &&
            col(c) <= lit(to.getTime * 1000000L))
        case None => df
      }
    prefiltered
      .filter(
        col(tsCol) >= lit(from) &&
        col(tsCol) <= lit(to) &&
        col(keyCol) === keyValue)
      // sliding windows (overlapping) when a slide is given — each event
      // lands in windowDuration/slide groups; the aggregate stays
      // partial→final, the shuffle grows by that small constant factor
      .groupBy(slide match {
        case Some(s) => window(col(tsCol), "10 minutes", s)
        case None => window(col(tsCol), "10 minutes")
      })
      .agg(
        round(min(col(valueCol)), 6).as("v_min"),
        round(max(col(valueCol)), 6).as("v_max"),
        round(avg(col(valueCol)), 6).as("v_mean"),
        round(median(col(valueCol)), 6).as("v_median"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"),
        col("v_min"), col("v_max"), col("v_mean"), col("v_median"), col("n"))
      .orderBy(col("window_start"))
  }

  /** Gap-filled trend series: every 10-minute slot in [from, to] present,
    * empty slots carried as (n = 0, v_mean = null) — the calendar-spine
    * left join a charting/serving tier needs so a quiet interval reads as
    * zero, not as a missing row. The spine is `spark.range` over window
    * starts — distributed generation, no driver-side materialization and
    * no array-size cap however wide the range; the aggregated side is
    * result-cardinality, so the join broadcasts. */
  def trendsGapfill(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      keyValue: String,
      valueCol: String,
      fromTs: String,
      toTs: String): DataFrame = {
    val from = Timestamp.valueOf(fromTs)
    val to = Timestamp.valueOf(toTs)
    val f = math.floorDiv(from.getTime, 600000L) * 600L
    val t = math.floorDiv(to.getTime, 600000L) * 600L
    val agg = trendsOf(df, tsCol, keyCol, keyValue, valueCol, fromTs, toTs)
      .select(col("window_start"), col("v_mean"), col("n"))
    val spine = df.sparkSession.range(f, t + 1, 600)
      .select(col("id").as("window_start"))
    spine.join(agg, Seq("window_start"), "left")
      .select(col("window_start"),
        coalesce(col("n"), lit(0L)).as("n"), col("v_mean"))
      .orderBy(col("window_start"))
  }

  /** LOCF (last-observation-carried-forward) fill over the gap-filled
    * series: empty windows repeat the last known mean instead of NULL —
    * the step-function read a pricing/serving tier wants ("the rate IS
    * 1.0842 until a new tick says otherwise"). `last(_, ignoreNulls)`
    * over the spine order; the series is result-cardinality, so the
    * single-task unpartitioned window is free (same argument as
    * revenueShare) — the corpus never sees it. Leading windows before
    * the first observation stay NULL (nothing to carry). */
  def trendsGapfillLocf(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      keyValue: String,
      valueCol: String,
      fromTs: String,
      toTs: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trendsGapfill(df, tsCol, keyCol, keyValue, valueCol, fromTs, toTs)
      .withColumn("v_filled", last(col("v_mean"), ignoreNulls = true).over(w))
      .orderBy(col("window_start"))
  }

  /** Trailing moving average over the 10-minute series (6-slot ≈ 1 h
    * frame) — the smoothing pass a charting tier applies on top of the
    * flagship aggregate. The frame sum runs in exact DECIMAL over the
    * already-6-dp means and only the final quotient is a double, so
    * engines can't disagree at a rounding boundary. The unpartitioned
    * window runs single-task — correct here because its input is the
    * RESULT series (range/10min rows), never the raw corpus; a per-key
    * variant would partition by the series key. */
  def trendsMovingAvg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      keyValue: String,
      valueCol: String,
      fromTs: String,
      toTs: String,
      slots: Int = 6): DataFrame = {
    // ma as the INTEGER MICRO FLOOR of the trailing mean: the previous
    // round(double, 6) form diverged from DuckDB by one ulp on windows
    // whose exact mean sits on a 6-dp rounding boundary (sf0.1 surfaced
    // three) — engines round doubles differently at the boundary, so the
    // ladder's floor-of-exact-integers convention applies. v_mean is
    // 6-dp, so its DECIMAL(18,6)·10⁶ micro image is exact; sums and the
    // floor division are pure integer arithmetic on both engines.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("window_start")).rowsBetween(-(slots - 1), 0)
    trendsOf(df, tsCol, keyCol, keyValue, valueCol, fromTs, toTs)
      .select(col("window_start"), col("v_mean"))
      .withColumn("v_micro",
        expr("CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
      .withColumn("s", sum(col("v_micro")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("window_start"), col("v_mean"),
        expr("s div n").as("ma_micro"))
      .orderBy(col("window_start"))
  }

  /** Z-score ANOMALY flags over the 10-min series: each window's mean
    * against the trailing `slots`-window mean and population stddev —
    * the alerting query a monitoring tier runs on the flagship series.
    * All derived columns ride the INTEGER MICRO ladder (the
    * trendsMovingAvg lesson — a boundary-ulp round(double, 6) diverged
    * between engines at sf0.1): v_mean's DECIMAL(18,6)·10⁶ image is an
    * exact BIGINT, the moment sums and n·Σv² − (Σv)² are exact
    * integers, sd_micro = floor(sqrt(exact int)/n) has ONE correctly-
    * rounded IEEE sqrt and division on identical inputs, and z_micro
    * floors a single double division. sd_micro = 0 (constant window, or
    * the frame's first row where n = 1) emits a NULL z rather than an
    * engine-divergent ÷0. The window is unpartitioned but runs over the
    * RESULT series (calendar cardinality), not the corpus — single-task
    * is free here. */
  def trendsZscore(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      keyValue: String,
      valueCol: String,
      fromTs: String,
      toTs: String,
      slots: Int = 6,
      flagAt: Double = 2.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("window_start")).rowsBetween(-(slots - 1), 0)
    val flagMicro = (flagAt * 1e6).toLong
    trendsOf(df, tsCol, keyCol, keyValue, valueCol, fromTs, toTs)
      .select(col("window_start"), col("v_mean"))
      .withColumn("v_micro",
        expr("CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
      .withColumn("s", sum(col("v_micro")).over(w))
      // square through DECIMAL(38,0): a raw BIGINT*BIGINT wraps silently
      // past |v_micro| ≈ 3.0e9 (|v_mean| > ~3037) in non-ANSI Spark
      // while the DuckDB oracle raises — widening pushes the exact
      // domain to |v_micro| ≈ 1.3e18 (the n·Σv² term then approaches
      // DECIMAL(38)'s 1e38 ceiling), far past any micro-scaled mean.
      // The oracle mirrors via HUGEINT (internal only — output columns
      // stay BIGINT, so the hash-boundary ban is untouched).
      .withColumn("sxx",
        sum(expr("CAST(v_micro AS DECIMAL(38,0)) * v_micro")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("ma_micro", expr("s div n"))
      // n·Σv² − (Σv)² ≥ 0 exactly (integers — no float cancellation to
      // clamp); sd in micro units = sqrt(that)/n
      .withColumn("sd_micro", expr(
        """CAST(floor(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx -
          | CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)) / n) AS BIGINT)"""
          .stripMargin))
      .withColumn("z_micro", expr(
        """CASE WHEN sd_micro > 0 THEN
          |CAST(floor((v_micro - ma_micro) * 1000000.0 / sd_micro)
          |  AS BIGINT) END""".stripMargin))
      .withColumn("anomaly",
        col("z_micro").isNotNull && abs(col("z_micro")) > flagMicro)
      .select(col("window_start"), col("v_mean"), col("ma_micro"),
        col("sd_micro"), col("z_micro"), col("anomaly"))
      .orderBy(col("window_start"))
  }
}
