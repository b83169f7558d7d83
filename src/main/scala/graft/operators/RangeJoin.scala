package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Time-range join — each left row matched to right rows of the same key
 * whose timestamp falls in the trailing window `(left.ts - window, left.ts]`.
 * The other canonical market-data join next to as-of ([[AsOfJoin]]): "all
 * quotes/clicks in the N minutes before this trade/purchase".
 *
 * Spark has no native range-join operator; the naive inequality join plans
 * as BroadcastNestedLoopJoin (per-row scan of the right side — quadratic,
 * dead at scale). This is the bin-bucketed form instead: bucket both sides
 * into fixed `window`-width time bins, explode each left row to its two
 * candidate bins (a trailing window of width W can only intersect bin(l)
 * and bin(l)-1), equi-join on (key, bin), and apply the exact range
 * predicate to the bin-pair candidates only.
 *
 * Scale: ONE shuffle per side on (key, bin) into a plain equi-join
 * (SMJ/shuffled-hash — AQE picks), left side duplicated exactly ×2,
 * candidates bounded by per-bin density × 2 — never all-pairs. Hot keys
 * spread over bins; residual skew is AQE's skew-join case. Each true match
 * survives exactly once (a right row lies in exactly one bin, and that bin
 * is exactly one of the left row's two probes).
 */
object RangeJoin {

  /** Matched pairs (inner form): all (left row, right row) pairs with equal
    * `keyCol` and `rightUs` in `(leftUs - windowUs, leftUs]`. Column names
    * must not collide across sides (pre-rename payloads). */
  def rangePairs(left: DataFrame, right: DataFrame, keyCol: String,
      leftUs: String, rightUs: String, windowUs: Long): DataFrame = {
    // `div` = integer division (repo convention, see retentionCohorts):
    // a double divide + cast truncates toward zero, which differs from
    // floor for negative timestamps and relies on the quotient being
    // exactly representable.
    val lb = left.withColumn("__bin", explode(array(
      expr(s"$leftUs div $windowUs"),
      expr(s"$leftUs div $windowUs") - 1)))
    val rb = right.withColumn("__bin", expr(s"$rightUs div $windowUs"))
    lb.join(rb, Seq(keyCol, "__bin"))
      .filter(col(rightUs) > col(leftUs) - windowUs && col(rightUs) <= col(leftUs))
      .drop("__bin")
  }

  /** Left-outer count form: every left row with the number of in-range
    * right rows (0 when none) — without a second scan of the left side.
    * The two bin probes left-join independently; an unmatched probe
    * contributes a null right row, excluded by count(when(in-range)), and
    * a groupBy on a per-row surrogate key folds the probes back to one row
    * per left row. The surrogate (monotonically_increasing_id BEFORE the
    * explode) makes duplicate left rows keep their own output rows — a
    * groupBy over the left columns alone would silently collapse them. The
    * id is partition-layout-dependent but is dropped before returning, so
    * the output multiset is deterministic. */
  def countInRange(left: DataFrame, right: DataFrame, keyCol: String,
      leftUs: String, rightUs: String, windowUs: Long,
      as: String = "n_matches"): DataFrame = {
    val leftCols = left.columns.toSeq
    val lb = left.withColumn("__rowid", monotonically_increasing_id())
      .withColumn("__bin", explode(array(
        expr(s"$leftUs div $windowUs"),
        expr(s"$leftUs div $windowUs") - 1)))
    val rb = right.withColumn("__bin", expr(s"$rightUs div $windowUs"))
    lb.join(rb, Seq(keyCol, "__bin"), "left")
      .groupBy((col("__rowid") +: leftCols.map(col)): _*)
      .agg(count(when(
        col(rightUs) > col(leftUs) - windowUs && col(rightUs) <= col(leftUs),
        lit(1))).as(as))
      .drop("__rowid")
  }

  /** The NAIVE formulation of the same attribution join — written exactly
    * as a user would: an inner join on user equality plus the raw range
    * predicates, then a count. Left alone, Spark plans the inequality
    * pair as BroadcastNestedLoopJoin; under
    * [[graft.plans.BinnedRangeJoinRule]] the plan rewrites to the
    * bin-bucketed equi-join automatically (the registered `range_join_auto`
    * query installs the rule via `spark.experimental.extraOptimizations`).
    * Inner form: purchases with zero in-range clicks are absent. */
  def purchaseClickCountsNaive(events: DataFrame,
      windowUs: Long = 300000000L): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"))
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_us") > col("us") - windowUs &&
        col("c_us") <= col("us"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  /** Registered query shape: for every purchase event, the number of click
    * events by the same user in the preceding 5 minutes (inclusive of the
    * purchase instant). Trailing-window attribution — the join the
    * reference's ClickHouse tier would express as a correlated range
    * predicate. */
  def purchaseClickCounts(events: DataFrame,
      windowUs: Long = 300000000L): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"))
    countInRange(purchases, clicks, "user_id", "us", "c_us", windowUs,
      as = "n_clicks")
      .select(col("event_id"), col("user_id"), col("n_clicks"))
      .orderBy(col("event_id"))
  }

  /** INTERVAL×INTERVAL overlap join, bin-bucketed — the third member of
    * the temporal-join family (as-of = point→latest-point, rangePairs =
    * point→trailing-window, this = interval→interval). Each interval
    * explodes to every `binUs`-wide bin it spans (`sequence` — fan-out
    * ceil(len/binUs)+1, bounded when interval lengths are); candidates
    * equi-join on the bin, the exact overlap predicate prunes them, and
    * the (bin-count × bin-count) duplicate matches collapse through
    * `distinct` on the pair identity. Never an inequality nested-loop:
    * one shuffle per side on bin + one distinct shuffle, all bounded by
    * per-bin interval density.
    *
    * Inputs carry (`idCol`, `startUs`, `endUs`) with distinct names on
    * each side; `pred` adds the non-temporal join condition (e.g.
    * different instruments). */
  def intervalOverlapPairs(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String, rightStart: String,
      rightEnd: String, binUs: Long,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val lb = left.withColumn("__bin_l", explode(
      expr(s"sequence($leftStart div $binUs, $leftEnd div $binUs)")))
    val rb = right.withColumn("__bin_r", explode(
      expr(s"sequence($rightStart div $binUs, $rightEnd div $binUs)")))
    lb.join(rb, col("__bin_l") === col("__bin_r") && pred &&
        col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .drop("__bin_l", "__bin_r")
      .distinct()
  }

  /** Registered query shape: for every pair of instruments, how many of
    * their trading sessions (the session_ohlc intervals) overlap in time
    * — the cross-liquidity coincidence matrix. Sessions are intervals of
    * bounded length (gap-split), so the bin fan-out is bounded; the
    * distinct collapses multi-bin duplicates on the session-start pair
    * identity. */
  def sessionOverlapCounts(events: DataFrame,
      gapNs: Long = 1800L * 1000000000L,
      binUs: Long = 3600000000L): DataFrame = {
    // materialized once: the two join arms would otherwise re-derive the
    // whole sessionization per plan reference (no CSE across references)
    val sess = MarketStats.sessionOhlc(events, gapNs)
      .select(col("event_type"), col("session_start_us"),
        (col("session_start_us") + col("duration_us")).as("session_end_us"))
      .transform(d => graft.plans.PlanTrace.cp(d, tag = "sess_ohlc"))
    val a = sess.select(col("event_type").as("type_a"),
      col("session_start_us").as("a_start"),
      col("session_end_us").as("a_end"))
    val b = sess.select(col("event_type").as("type_b"),
      col("session_start_us").as("b_start"),
      col("session_end_us").as("b_end"))
    intervalOverlapPairs(a, b, "a_start", "a_end", "b_start", "b_end",
      binUs, col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
