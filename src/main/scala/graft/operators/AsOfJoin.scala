package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, the latest right row with
 * `right.ts <= left.ts` on the same key. The canonical market-data lookup
 * (trade → prevailing quote); Spark has no native operator for it.
 *
 * Implementation is the union + ordered-window trick, not a range join:
 * tag both sides, union, and take `last(right payload, ignoreNulls)` over
 * a window ordered by (ts, side) with rights sorted before lefts at equal
 * timestamps (inclusive `<=` semantics, matching DuckDB's ASOF JOIN).
 *
 * Scale: ONE shuffle on the key + a sort within partitions — no
 * broadcast, no per-row range probe, no quadratic candidate explosion;
 * works at any right-side cardinality. Skewed keys behave like any
 * windowed aggregation (AQE skew handling applies).
 */
object AsOfJoin {

  /**
   * @param left      left rows (kept in full)
   * @param right     right rows; only `payloadCol` survives
   * @param keyCol    equi-join key present on both sides
   * @param leftTs    left timestamp column name
   * @param rightTs   right timestamp column name
   * @param payloadCol right column carried to the left rows (as-of value)
   * @param as        output column name for the payload
   */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right
      .select(col(keyCol), col(rightTs).as("__ts"), lit(0).as("__side"),
        col(payloadCol).as("__payload"))
    val unioned = l.select(
      (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(r, allowMissingColumns = true)
    // rights (side=0) sort before lefts (side=1) at equal ts → inclusive <=
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload")
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key (pandas merge_asof
    * direction='forward') — the label-joining direction of a training
    * pipeline: "the next conversion at or after this impression". Same
    * union + ordered-window shape as [[asOf]], mirrored by REVERSING the
    * sort (ts desc, side desc) so the "next right at or after t" becomes
    * a RUNNING `last(payload, ignoreNulls)` over
    * [unboundedPreceding, currentRow] — at equal ts the right (side 1)
    * sorts first in the reversed order, so it is already visible to the
    * left row: inclusive `>=`. Still one shuffle on the key.
    *
    * Why reversed, not a forward frame: Spark evaluates a
    * [currentRow, unboundedFollowing] frame by rescanning the rest of
    * the partition PER ROW — O(n²) per key, catastrophic on low-key
    * streams (a per-instrument markout over ~1e5 ticks/instrument ran
    * 200+ s). The reversed running frame is the incremental O(n)
    * `UnboundedPrecedingWindowFunctionFrame` path. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right
      .select(col(keyCol), col(rightTs).as("__ts"), lit(1).as("__side"),
        col(payloadCol).as("__payload"))
    val unioned = l.select(
      (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__ts", "__side", "__payload")
  }

  /** Forward-direction registered shape: each event joined to the id of
    * the next 'purchase' of the same user at or after it. */
  def nextPurchaseAfter(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    asOfForward(
      left = events.select(col("event_id"), col("user_id"), col("ts")),
      right = purchases, keyCol = "user_id",
      leftTs = "ts", rightTs = "ts", payloadCol = "purchase_id",
      as = "next_purchase_id")
      .select(col("event_id"), col("user_id"), col("next_purchase_id"))
      .orderBy(col("event_id"))
  }

  /** NEAREST-direction as-of — pandas `merge_asof(direction='nearest')`,
    * the one directional variant the family still lacked: each left row
    * matches the right row with the SMALLEST absolute time distance,
    * ties broken BACKWARD (the earlier right row — deterministic and
    * oracle-stable); right rows SHARING (key, ts) resolve to the
    * largest payload (the window ordering is total, so the pick can
    * never depend on physical tie order). Payload must carry the right
    * row's μs in `usField` so the two direction candidates can be
    * compared.
    *
    * One union, ONE shuffle on the key, two sorts inside the same
    * exchange: backward = running last() over (ts asc), forward =
    * running last() over the REVERSED sort — both inclusive at equal ts
    * (rights ordered before lefts in each pass's direction), both on
    * the incremental O(n) running-frame path (a
    * [currentRow, unboundedFollowing] frame would rescan the partition
    * tail per row — O(n²), the markout_30s lesson). The resolve is a
    * per-row integer comparison of the two candidate distances. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      usField: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right
      .select(col(keyCol), col(rightTs).as("__ts"), lit(0).as("__side"),
        col(payloadCol).as("__payload"))
    val unioned = l.select(
      (leftCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")): _*)
      .unionByName(r, allowMissingColumns = true)
    // rights (side 0) sort before lefts at equal ts in BOTH directions
    // (asc: side asc; desc: side asc again) → both passes inclusive.
    // __payload closes the ordering into a TOTAL order: multiple right
    // rows sharing (key, ts) would otherwise make last()'s pick
    // tie-order-dependent — with the tiebreak both passes
    // deterministically surface the LARGEST payload at equal ts.
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts").desc, col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val db = unix_micros(col("__ts")) - col(s"__b.$usField")
    val df = col(s"__f.$usField") - unix_micros(col("__ts"))
    unioned
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn(as,
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(df < db, col("__f"))
          .otherwise(col("__b")))
      .drop("__ts", "__side", "__payload", "__b", "__f")
  }

  /** INTERPOLATED as-of — the third temporal-join direction (backward,
    * forward, between): each left row gets the right-side value LINEARLY
    * INTERPOLATED between the straddling pair (latest right ≤ t, earliest
    * right ≥ t) — the state-estimation join (sensor fusion, mark-to-time
    * pricing) that pandas merge_asof cannot express at all.
    *
    * One union, ONE shuffle on the key, two sorts inside the same
    * exchange: the backward pass is a running last() over (uts asc), the
    * forward pass a running last() over the REVERSED sort (uts desc) —
    * both inclusive at equal ts (rights ordered before lefts in each
    * pass's direction), and both on the incremental O(n) running-frame
    * path (a [currentRow, unboundedFollowing] frame would rescan the
    * partition tail per row — O(n²), see [[asOfForward]]).
    *
    * The interpolation is EXACT integer arithmetic end-to-end:
    * v(t)·10⁶ = (pc·(nus−pus) + (nc−pc)·(t−pus))·10⁴ div (nus−pus)
    * on cents and μs — the numerator is nonnegative (values are, and t
    * lies inside [pus, nus]), so truncating `div` IS floor and Spark and
    * DuckDB agree; products ride DECIMAL/HUGEINT (they overflow int64).
    * NULL when unstraddled; the exact-hit / zero-span case returns the
    * right value itself.
    *
    * Precondition (shared with the oracle): right-side ticks are unique
    * per (user, μs) — true of the tick stream by construction (verified:
    * zero collisions at every SF). If a feed could violate it, dedupe
    * per (key, μs) first, as [[lastPurchaseBefore]] does, or the
    * last()/first() picks among equal-μs rights tie-break arbitrarily. */
  def asOfInterpolated(events: DataFrame, leftType: String = "purchase",
      rightType: String = "click"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), expr("ts_ns div 1000").as("uts"),
        lit(1).as("__side"), col("event_id"),
        lit(null).cast("long").as("cents"), lit(null).cast("long").as("rus"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), expr("ts_ns div 1000").as("uts"),
        lit(0).as("__side"), lit(null).cast("long").as("event_id"),
        expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").as("cents"),
        expr("ts_ns div 1000").as("rus"))
    val part = Window.partitionBy(col("user_id"))
    val wb = part.orderBy(col("uts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = part.orderBy(col("uts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wb))
      .withColumn("pus", last(col("rus"), ignoreNulls = true).over(wb))
      .withColumn("nc", last(col("cents"), ignoreNulls = true).over(wf))
      .withColumn("nus", last(col("rus"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .select(col("event_id"), col("uts").as("us"),
        expr("""CASE WHEN pc IS NULL OR nc IS NULL THEN NULL
                |     WHEN nus = pus THEN pc * 10000
                |     ELSE CAST((CAST(pc AS DECIMAL(38,0)) * (nus - pus) +
                |       CAST(nc - pc AS DECIMAL(38,0)) * (uts - pus)) * 10000
                |       div (nus - pus) AS BIGINT) END""".stripMargin)
          .as("interp_micro"))
      .orderBy(col("event_id"))
  }

  /** The registered query shape: each event joined to the id of the most
    * recent 'purchase' event of the same user at or before it. Right side
    * deduped per (user, ts) so ties are deterministic across engines. */
  def lastPurchaseBefore(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    asOf(
      left = events.select(col("event_id"), col("user_id"), col("ts")),
      right = purchases, keyCol = "user_id",
      leftTs = "ts", rightTs = "ts", payloadCol = "purchase_id",
      as = "last_purchase_id")
      .select(col("event_id"), col("user_id"), col("last_purchase_id"))
      .orderBy(col("event_id"))
  }

  /** TIME-BUCKETED backward as-of — the [[asOf]] union-window answer
    * computed with NO per-key window over the full stream: the
    * [[EventsOps.maxConcurrency]] day-partitioned sweep/carry pattern
    * applied to as-of. A per-key window is the right shape when the key
    * is an instrument (thousands of bounded streams), but when the key
    * is COARSE — a handful of venues, sides, currencies — one window
    * task holds the key's whole history. Here every window is bounded:
    *
    *   1. rights collapse to ONE winner per (key, bucket) — the latest
    *      (ts, payload) struct max, a hash aggregate;
    *   2. the bucket SPINE (distinct (key, bucket) of both sides) gets a
    *      carry: the last winner among strictly-earlier buckets, via a
    *      per-key window over the CALENDAR-BOUNDED bucket relation;
    *   3. lefts + rights union-window WITHIN (key, bucket) — per-task
    *      volume is one bucket's traffic — and the per-row answer is
    *      coalesce(within-bucket running last, carry).
    *
    * Equals [[asOf]] row-for-row whenever rights are unique per
    * (key, ts) (the family's determinism precondition); with multiple
    * rights at one instant this form deterministically takes the
    * largest payload, where the window form is tie-order-dependent.
    * Timestamps are bucketed on the μs grid; `bucketSec` trades spine
    * size (time-range / bucketSec rows per key) against per-task
    * volume. */
  def asOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      as: String, bucketSec: Long = 86400L): DataFrame = {
    val leftCols = left.columns
    val wUs = bucketSec * 1000000L
    def us(c: Column) = unix_micros(c)
    val r = right.select(col(keyCol), us(col(rightTs)).as("__us"),
      col(payloadCol).as("__payload"))
      .withColumn("__b", expr(s"__us div ${wUs}L"))
    val bucketLast = r.groupBy(col(keyCol), col("__b"))
      .agg(max(struct(col("__us"), col("__payload"))).as("__m"))
    val lb = left
      .withColumn("__us", us(col(leftTs)))
      .withColumn("__b", expr(s"__us div ${wUs}L"))
    // carry over the bucket spine: both sides' buckets, so a left-only
    // bucket still sees the last earlier winner
    val spine = lb.select(col(keyCol), col("__b"))
      .union(r.select(col(keyCol), col("__b"))).distinct()
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine
      .join(bucketLast, Seq(keyCol, "__b"), "left")
      .withColumn("__carry",
        last(col("__m"), ignoreNulls = true).over(wCarry))
      .select(col(keyCol), col("__b"),
        col("__carry").getField("__payload").as("__carry_p"))
    val l = lb
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(right.schema(payloadCol).dataType))
      .select((leftCols.map(col) :+ col("__us") :+ col("__b") :+
        col("__side") :+ col("__payload")): _*)
    val unioned = l.unionByName(
      r.withColumn("__side", lit(0)), allowMissingColumns = true)
    val wIn = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__us"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__in", last(col("__payload"), ignoreNulls = true).over(wIn))
      .filter(col("__side") === 1)
      .join(carry, Seq(keyCol, "__b"), "left")
      .withColumn(as, coalesce(col("__in"), col("__carry_p")))
      .drop("__us", "__b", "__side", "__payload", "__in", "__carry_p")
  }

  /** FORWARD mirror of [[asOfBucketed]]: earliest right at-or-after each
    * left row, with every window bounded by bucket or spine. Rights
    * first collapse to the largest payload per (key, ts) — the family's
    * deterministic equal-instant pick — so the per-(key, bucket) winner
    * is a plain (ts, payload) struct MIN. Carry flows from LATER buckets
    * (descending spine window: the last bucket seen before b is the
    * NEAREST later one); within a bucket the reversed union-window of
    * [[asOfForward]] applies. Equals [[asOfForward]] row-for-row
    * whenever rights are unique per (key, ts). */
  def asOfForwardBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      as: String, bucketSec: Long = 86400L): DataFrame = {
    val leftCols = left.columns
    val wUs = bucketSec * 1000000L
    def us(c: Column) = unix_micros(c)
    // collapse equal-(key, ts) rights to the largest payload FIRST, so
    // the per-bucket earliest winner is the deterministic family pick
    val r = right.select(col(keyCol), us(col(rightTs)).as("__us"),
      col(payloadCol).as("__payload"))
      .groupBy(col(keyCol), col("__us"))
      .agg(max(col("__payload")).as("__payload"))
      .withColumn("__b", expr(s"__us div ${wUs}L"))
    val bucketFirst = r.groupBy(col(keyCol), col("__b"))
      .agg(min(struct(col("__us"), col("__payload"))).as("__m"))
    val lb = left
      .withColumn("__us", us(col(leftTs)))
      .withColumn("__b", expr(s"__us div ${wUs}L"))
    val spine = lb.select(col(keyCol), col("__b"))
      .union(r.select(col(keyCol), col("__b"))).distinct()
    // carry = the earliest winner among strictly-LATER buckets
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine
      .join(bucketFirst, Seq(keyCol, "__b"), "left")
      .withColumn("__carry",
        last(col("__m"), ignoreNulls = true).over(wCarry))
      .select(col(keyCol), col("__b"),
        col("__carry").getField("__payload").as("__carry_p"))
    val l = lb
      .withColumn("__side", lit(0))
      .withColumn("__payload",
        lit(null).cast(right.schema(payloadCol).dataType))
      .select((leftCols.map(col) :+ col("__us") :+ col("__b") :+
        col("__side") :+ col("__payload")): _*)
    val unioned = l.unionByName(
      r.withColumn("__side", lit(1)), allowMissingColumns = true)
    // reversed within-bucket order: rights at equal ts sort first, so
    // inclusive >=. The trailing __payload term only CLOSES the order
    // into a total one — rights are pre-collapsed to one row per
    // (key, ts) upstream, so the tiebreak never actually picks between
    // two rights; do NOT "fix" it to desc (with multiple rights per ts
    // that would change which payload the running last() surfaces)
    val wIn = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__ts_neg"), col("__side").desc, col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__ts_neg", -col("__us"))
      .withColumn("__in", last(col("__payload"), ignoreNulls = true).over(wIn))
      .filter(col("__side") === 0)
      .join(carry, Seq(keyCol, "__b"), "left")
      .withColumn(as, coalesce(col("__in"), col("__carry_p")))
      .drop("__us", "__ts_neg", "__b", "__side", "__payload", "__in",
        "__carry_p")
  }

  /** TOLERANCE-BOUNDED as-of (pandas merge_asof `tolerance=`, DuckDB has
    * no equivalent): the backward match is kept only while it is fresh —
    * a state older than `toleranceSec` is as good as no state (the
    * feature-staleness rule every training pipeline enforces when
    * joining signals onto examples). Implemented by carrying the matched
    * row's timestamp in the payload struct and nulling stale matches
    * after the same one-shuffle union-window pass as [[asOf]]; emits the
    * match's staleness in μs alongside (NULL when unmatched or stale).
    * The oracle states the same rule as a CASE over a plain ASOF join. */
  def lastPurchaseWithin(events: DataFrame,
      toleranceSec: Long = 3600L): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("ts"),
        struct(unix_micros(col("ts")).as("pus"),
          col("purchase_id").as("pid")).as("p"))
    asOf(
      left = events.select(col("event_id"), col("user_id"), col("ts")),
      right = purchases, keyCol = "user_id",
      leftTs = "ts", rightTs = "ts", payloadCol = "p", as = "m")
      .withColumn("stale_us", unix_micros(col("ts")) - col("m.pus"))
      .select(col("event_id"), col("user_id"),
        when(col("stale_us") <= toleranceSec * 1000000L, col("m.pid"))
          .as("last_purchase_id"),
        when(col("stale_us") <= toleranceSec * 1000000L, col("stale_us"))
          .as("staleness_us"))
      .orderBy(col("event_id"))
  }
}
