package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed exact ranking without a single-task (or single-group-task)
 * sort.
 *
 * `ntile(k).over(Window.orderBy(...))` — the form every report operator
 * wants to state — plans as ONE task holding the whole relation (and the
 * partitioned form `Window.partitionBy(status)` is the same hazard when
 * the group count is a handful: each group is a data-sized task). This
 * helper computes the identical rank / front-loaded ntile bucket (first
 * N mod k buckets take the extra row, exactly Spark's and DuckDB's
 * convention) from CLOSED-FORM rank arithmetic:
 *
 *   1. one group-cardinality aggregate gives (min, max, N) of the
 *      ordering value per partition group (one global row when
 *      unpartitioned);
 *   2. each row maps to one of ≤`cells` equal-width VALUE CELLS — a pure
 *      map-side projection off the broadcast stats;
 *   3. per-(group, cell) counts (a groups×cells-bounded aggregate) turn
 *      into cumulative cell offsets via a window over that bounded
 *      relation — the only coarse-keyed window, riding an AGGREGATE like
 *      `length_deciles`' histogram pass, never the data relation;
 *   4. rank = cell offset + row_number() over a window PARTITIONED BY
 *      (group, cell) (≈N/cells rows per task, parallel by construction);
 *   5. ntile / percent_rank / cume_dist = closed forms on (rank, N) —
 *      pure arithmetic.
 *
 * Every shuffle is keyed, every window partitioned by (group, cell) or
 * aggregate-bounded; the plan survives a 1000-executor 100 TB corpus
 * where the one-task sort does not. The driver hash proves equality with
 * the oracle's window functions.
 *
 * Preconditions: the ordering value has a MONOTONE BIGINT image under
 * CAST (integral, decimal and double all truncate monotonically — the
 * long image only BINS; within-cell order uses the original value —
 * but a NaN primary is EXCLUDED: its long image is 0 while it sorts
 * after every finite double, so it would bin mid-range; filter or
 * null-out NaNs first), the image's span max−min stays within the
 * signed-64 range (violations raise at runtime rather than mis-rank —
 * values near both Long.MinValue and Long.MaxValue in one group wrap
 * the width arithmetic), and (primary, tiebreaks...) is a TOTAL
 * order — same contract the window forms carried. The tie-skew
 * subdivision additionally requires the FIRST tiebreak's long image be
 * faithful, so it only engages when primary AND first tiebreak are both
 * integral dtypes (a string tiebreak orders '10' before '9'; a NaN
 * double images as 0 but sorts last — either would subdivide wrongly);
 * non-integral tiebreaks simply skip the subdivision, ranks unchanged.
 * Nulls follow Spark's window semantics: a null partition value is a
 * group (null-safe joins), and null ordering values sort FIRST
 * (sentinel cell −1).
 *
 * Scope: the closed form targets GLOBAL and COARSE-GROUP rankings —
 * its stats/offsets relations are groups×cells rows and must stay
 * broadcastable (hundreds of sources / handfuls of statuses ⇒ ≤ a few
 * hundred thousand rows) — ENFORCED: past `maxGroups` (default 2^18)
 * the plan raises at runtime instead of silently building an
 * unbroadcastable stats side. For HIGH-cardinality keys (per-user,
 * per-doc, per-instrument) the plain keyed window is already the right
 * shape:
 * each group is bounded, tasks are parallel by key, and no cell
 * machinery is needed.
 */
object Ranks {

  /** NULL-SAFE broadcast join on `keys` — `usingColumns` equi-joins drop
    * null-keyed rows, but Spark's window forms treat a null partition
    * value as a perfectly good group, so the closed forms must too. */
  private def nsJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val rr = keys.foldLeft(right)((d, k) =>
      d.withColumnRenamed(k, s"__r_$k"))
    left.join(broadcast(rr),
        keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _))
      .drop(keys.map(k => s"__r_$k"): _*)
  }

  /** TRUE iff the tie-skew subdivision may engage: it bins by the FIRST
    * tiebreak's cast-to-long image, which is faithful to the sort order
    * only for integral dtypes (strings order '10' before '9' but image
    * larger; NaN doubles image as 0 but sort last) — and the width-1
    * trigger itself presumes the primary's long image is exact, i.e.
    * integral. Non-integral on either side → "FALSE": sub stays 1, the
    * subdivision is skipped, ranks are identical (only the skew-spread
    * optimization is forgone). No tiebreak (`__t` = 0 constant) is
    * trivially integral. */
  private def subdividable(df: DataFrame, primary: Column,
      tiebreaks: Seq[Column]): String = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def integral(c: Column): Boolean =
      df.select(c.as("__p")).schema.head.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    if (integral(primary) && tiebreaks.headOption.forall(integral)) "TRUE"
    else "FALSE"
  }

  /** Cell width off the broadcast stats — failing LOUDLY on the two
    * pathological domains instead of silently mis-ranking:
    * `__gc` (group count) past `maxGroups` means the stats/offsets
    * relations are no longer broadcastable — the caller wants the plain
    * keyed window, whose per-group tasks are already parallel at high
    * key cardinality; a NULL `try_subtract(__mx, __mn)` means the
    * primary's long image spans more than the signed-64 range and every
    * downstream cell/rank subtraction would overflow (try_subtract is
    * NULL-on-overflow under BOTH ansi settings, so the curated message
    * fires instead of ANSI's generic ARITHMETIC_OVERFLOW or non-ANSI's
    * silent wrap). The overflow branch is gated on `$mx IS NOT NULL`:
    * a group whose ordering values are ALL NULL aggregates NULL stats,
    * making try_subtract NULL with no overflow — such groups fall
    * through to a NULL width, which the v-IS-NULL sentinel-cell branch
    * in [[cellExpr]] never reads (the documented NULLS-FIRST contract).
    * raise_error is inside the one expression every row evaluates, so
    * the optimizer cannot prune it. */
  private def vwExpr(cells: Int, maxGroups: Long,
      mn: String = "__mn", mx: String = "__mx"): String =
    s"""CASE
       |WHEN __gc > ${maxGroups}L THEN CAST(raise_error(concat(
       |  'Ranks closed form: ', CAST(__gc AS STRING), ' ordering groups',
       |  ' exceed the broadcastable bound ${maxGroups}; the closed form',
       |  ' targets global/coarse-group rankings - use a plain keyed',
       |  ' window for high-cardinality groups (tasks are parallel by',
       |  ' key there)')) AS BIGINT)
       |WHEN $mx IS NOT NULL AND try_subtract($mx, $mn) IS NULL
       |THEN CAST(raise_error(concat(
       |  'Ranks closed form: the ordering value''s long image spans',
       |  ' more than 2^63 (min ', CAST($mn AS STRING), ', max ',
       |  CAST($mx AS STRING), ') - cell width arithmetic would wrap;',
       |  ' pre-shift or rescale the primary')) AS BIGINT)
       |ELSE ($mx - $mn) div ${cells}L + 1L END""".stripMargin

  /** Cell key with Spark's NULLS-FIRST semantics: null ordering values
    * land in sentinel cell −1 (before every real cell, matching
    * ascending null-first window order); a null tiebreak coalesces into
    * the first subcell, where the within-cell sort puts it first. The
    * tiebreak span goes through try_subtract: a span past 2^63 nulls the
    * whole subdivision term for EVERY row (tmn/tmx are group constants),
    * so the coalesce uniformly turns the subdivision off — ranks intact,
    * no ANSI overflow mid-expression. ($t - $tmn itself cannot overflow
    * once the span fits: 0 ≤ t − tmn ≤ tmx − tmn.) */
  private def cellExpr(v: String, t: String, mn: String, mx: String,
      tmn: String, tmx: String, vw: String, sub: String, integral: String,
      cells: Int): String =
    s"""CASE WHEN $v IS NULL THEN -1L ELSE
       |(($v - $mn) div $vw) * $sub +
       |CASE WHEN $vw = 1 AND $integral
       |  THEN coalesce(try_subtract($t, $tmn) div
       |    (try_subtract($tmx, $tmn) div $sub + 1L), 0L)
       |  ELSE 0L END
       |END""".stripMargin

  /** Annotates `df` with `rankCol` (1-based rank under the total order
    * (primary, tiebreaks...), within each `partition` group — global
    * when `partition` is empty) and `nCol` (the group size), computed
    * scalably as described above.
    *
    * The input is materialized ONCE via a LAZY localCheckpoint (no job
    * at construction time): the stats, cell-histogram and ranking
    * consumers otherwise each re-evaluate the caller's upstream plan,
    * and CHAINED calls (rfm's three axes) would compound that 4× per
    * call — measured 64 input scans for three chained buckets. The
    * checkpoint is exactly the materialize-before-rank step a 100 TB
    * pipeline performs anyway; it is query-scoped and swept by the
    * harness' per-query unpersist. */
  def withRankStats(df: DataFrame, partition: Seq[String], primary: Column,
      tiebreaks: Seq[Column], rankCol: String, nCol: String,
      cells: Int = 4096, maxGroups: Long = 1L << 18): DataFrame = {
    val pc = partition.map(col)
    val withV = graft.plans.PlanTrace.cp(
      df.withColumn("__v", primary.cast("long"))
        .withColumn("__t",
          tiebreaks.headOption.map(_.cast("long")).getOrElse(lit(0L))),
      eager = false, tag = "ranks_in")
    val aggs = Seq(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      min(col("__t")).as("__tmn"), max(col("__t")).as("__tmx"),
      count(lit(1)).as("__n"))
    // Equal-width value cells: width ≥ 1 so (v - mn) div width < cells+1;
    // `div` is BIGINT floor division on both engines. Stats are
    // group-cardinality — broadcast by construction.
    //
    // TIE-SKEW refinement: a small-domain primary (range < cells — rfm's
    // frequency axis, say 20 distinct values over 10⁹ users) would put
    // every tied row in ONE cell = one ranking task. When each value
    // cell holds exactly one value (width = 1 AND the primary is
    // integral, so the long image is faithful — a decimal's image bins
    // many values per integer), the within-cell order is purely the
    // first tiebreak, so the cell key subdivides by the tiebreak's long
    // image — lexicographic (v, tb) order is preserved and the ≤`cells`
    // total key budget is re-spent as (range+1) × (cells div (range+1))
    // subcells. Ranks are unchanged; only the task layout spreads.
    val integral = subdividable(df, primary, tiebreaks)
    // __gc rides the (bounded) stats relation: one literal row globally,
    // a stats-relation-sized unpartitioned count when grouped — the
    // guard's own window never touches the data relation
    val celled = (if (partition.isEmpty)
        withV.crossJoin(broadcast(withV.agg(aggs.head, aggs.tail: _*)
          .withColumn("__gc", lit(1L))))
      else
        nsJoin(withV,
          withV.groupBy(pc: _*).agg(aggs.head, aggs.tail: _*)
            .withColumn("__gc",
              count(lit(1)).over(Window.partitionBy())), partition))
      .withColumn("__vw", expr(vwExpr(cells, maxGroups)))
      .withColumn("__sub", expr(
        s"greatest(1L, ${cells}L div try_add(try_subtract(__mx, __mn), 1L))"))
      .withColumn("__cell", expr(cellExpr("__v", "__t", "__mn", "__mx",
        "__tmn", "__tmx", "__vw", "__sub", integral, cells)))
    val offKeys = partition :+ "__cell"
    val wOff = Window.partitionBy(pc: _*).orderBy(col("__cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = celled.groupBy(offKeys.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(offKeys.map(col) :+ col("__off"): _*)
    // within-cell order by the ORIGINAL primary (the long image only
    // bins — decimal/double values sharing a truncated image still sort
    // exactly), then the caller's tiebreaks
    val wCell = Window.partitionBy(pc :+ col("__cell"): _*)
      .orderBy(primary +: tiebreaks: _*)
    nsJoin(celled, offs, offKeys)
      .withColumn(rankCol, col("__off") +
        row_number().over(wCell).cast("long"))
      .withColumn(nCol, col("__n"))
      .drop("__v", "__t", "__mn", "__mx", "__tmn", "__tmx", "__vw",
        "__sub", "__n", "__gc", "__cell", "__c", "__off")
  }

  /** The exact front-loaded `ntile(k)` bucket from (rank, n) — q = n
    * div k rows per bucket, the first n mod k buckets take one extra
    * (the convention both engines share). CaseWhen evaluates only the
    * matched branch, so the q = 0 division never runs when n < k (where
    * the first branch always hits). INT, matching `ntile`'s type. */
  def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $rank <= ($n % $k) * ($n div $k + 1)
       |  THEN ($rank - 1) div ($n div $k + 1) + 1
       |  ELSE ($n % $k) +
       |    ($rank - ($n % $k) * ($n div $k + 1) - 1) div ($n div $k) + 1
       |END AS INT)""".stripMargin)

  /** Adds `bucketCol` = the exact `ntile(k)` bucket of each row under
    * the total order (primary, tiebreaks...) within each `partition`
    * group (global when empty), via [[withRankStats]] +
    * [[ntileFromRank]]. */
  def withNtileBucket(df: DataFrame, k: Int, primary: Column,
      tiebreaks: Seq[Column], bucketCol: String,
      cells: Int = 4096, partition: Seq[String] = Nil,
      maxGroups: Long = 1L << 18): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    withRankStats(df, partition, primary, tiebreaks, "__r", "__gn", cells,
      maxGroups)
      .withColumn(bucketCol, ntileFromRank("__r", "__gn", k))
      .drop("__r", "__gn")
  }

  /** Closed-form distributed EXCLUSIVE PREFIX SUM — the scan primitive
    * under sequence packing: `outCol` = Σ `value` over rows strictly
    * before the current one in (primary, tiebreaks...) order within each
    * `partition` group. The classic one-task-per-group running-sum
    * window becomes: per-(group, cell) value sums cumulated over the
    * bounded histogram (cell offsets), plus a running sum WITHIN each
    * (group, cell) task — exactly the two-phase scan a 100 TB layout
    * needs, with the group's answer unchanged (so `nShards`-style
    * parameters stay semantic knobs, not parallelism workarounds).
    * Same cell/checkpoint machinery as [[withRankStats]]. */
  def withPrefixSum(df: DataFrame, partition: Seq[String], primary: Column,
      tiebreaks: Seq[Column], value: Column, outCol: String,
      cells: Int = 4096, maxGroups: Long = 1L << 18): DataFrame = {
    val pc = partition.map(col)
    val withV = df.withColumn("__v", primary.cast("long"))
      .withColumn("__t",
        tiebreaks.headOption.map(_.cast("long")).getOrElse(lit(0L)))
      .withColumn("__w", value.cast("long"))
      .transform(d => graft.plans.PlanTrace.cp(d, eager = false,
        tag = "ranks_in"))
    val aggs = Seq(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      min(col("__t")).as("__tmn"), max(col("__t")).as("__tmx"))
    val integral = subdividable(df, primary, tiebreaks)
    val celled = (if (partition.isEmpty)
        withV.crossJoin(broadcast(withV.agg(aggs.head, aggs.tail: _*)
          .withColumn("__gc", lit(1L))))
      else
        nsJoin(withV,
          withV.groupBy(pc: _*).agg(aggs.head, aggs.tail: _*)
            .withColumn("__gc",
              count(lit(1)).over(Window.partitionBy())), partition))
      .withColumn("__vw", expr(vwExpr(cells, maxGroups)))
      .withColumn("__sub", expr(
        s"greatest(1L, ${cells}L div try_add(try_subtract(__mx, __mn), 1L))"))
      .withColumn("__cell", expr(cellExpr("__v", "__t", "__mn", "__mx",
        "__tmn", "__tmx", "__vw", "__sub", integral, cells)))
    val offKeys = partition :+ "__cell"
    val wOff = Window.partitionBy(pc: _*).orderBy(col("__cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = celled.groupBy(offKeys.map(col): _*)
      .agg(sum(col("__w")).as("__cw"))
      .withColumn("__voff", coalesce(sum(col("__cw")).over(wOff), lit(0L)))
      .select(offKeys.map(col) :+ col("__voff"): _*)
    val wCell = Window.partitionBy(pc :+ col("__cell"): _*)
      .orderBy(primary +: tiebreaks: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    nsJoin(celled, offs, offKeys)
      .withColumn(outCol, col("__voff") +
        coalesce(sum(col("__w")).over(wCell), lit(0L)))
      .drop("__v", "__t", "__w", "__mn", "__mx", "__tmn", "__tmx",
        "__vw", "__sub", "__gc", "__cell", "__cw", "__voff")
  }

  /** MULTI-AXIS ntile buckets over ONE materialization — rfm's shape:
    * three axes over the same relation. Chaining [[withNtileBucket]]
    * per axis re-checkpoints each call's output and re-runs a stats and
    * a histogram pass per axis; this form shares one checkpoint, ONE
    * combined stats aggregate (min/max of every axis in a single job)
    * and one unioned (axis, cell) histogram, then stacks the per-axis
    * cell-partitioned ranking windows in a single plan. Buckets are
    * identical to the per-axis window statements. Global (unpartitioned)
    * axes only — the only multi-axis consumer ranks a whole relation. */
  def withNtileBuckets(df: DataFrame,
      axes: Seq[(Int, Column, Seq[Column], String)],
      cells: Int = 4096): DataFrame = {
    require(axes.nonEmpty, "at least one axis")
    axes.foreach { case (k, _, _, _) =>
      require(k >= 1, s"ntile bucket count must be >= 1, got $k") }
    val ix = axes.indices
    val vCols = axes.zipWithIndex.flatMap { case ((_, p, tbs, _), i) =>
      Seq(p.cast("long").as(s"__v$i"),
        tbs.headOption.map(_.cast("long")).getOrElse(lit(0L)).as(s"__t$i"))
    }
    val withV = graft.plans.PlanTrace.cp(
      df.select(col("*") +: vCols: _*), eager = false, tag = "ranks_in")
    val statAggs = ix.flatMap { i => Seq(
      min(col(s"__v$i")).as(s"__mn$i"), max(col(s"__v$i")).as(s"__mx$i"),
      min(col(s"__t$i")).as(s"__tmn$i"), max(col(s"__t$i")).as(s"__tmx$i"))
    } :+ count(lit(1)).as("__n")
    val integral = axes.map { case (_, p, tbs, _) =>
      subdividable(df, p, tbs)
    }
    // global form: one group by construction (__gc = 1 satisfies the
    // vwExpr guard; only the span wrap-around check is live per axis)
    val celled = ix.foldLeft(
      withV.crossJoin(broadcast(withV.agg(statAggs.head, statAggs.tail: _*)
        .withColumn("__gc", lit(1L))))) {
      (d, i) =>
        d.withColumn(s"__vw$i",
          expr(vwExpr(cells, 2L, s"__mn$i", s"__mx$i")))
          .withColumn(s"__sub$i",
            expr(s"greatest(1L, ${cells}L div try_add(try_subtract(__mx$i, __mn$i), 1L))"))
          .withColumn(s"__cell$i", expr(cellExpr(s"__v$i", s"__t$i",
            s"__mn$i", s"__mx$i", s"__tmn$i", s"__tmx$i", s"__vw$i",
            s"__sub$i", integral(i), cells)))
    }
    // one unioned (axis, cell) histogram, cum offsets per axis over the
    // axes×cells-bounded relation, materialized once for the per-axis
    // broadcast probes
    val offs = ix.map { i =>
        celled.groupBy(col(s"__cell$i").as("__cell"))
          .agg(count(lit(1)).as("__c")).withColumn("__axis", lit(i))
      }.reduce(_ unionByName _)
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy(col("__axis"))
          .orderBy(col("__cell"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__axis"), col("__cell"), col("__off"))
      .transform(d => graft.plans.PlanTrace.cp(d, eager = false,
        tag = "ranks_offs"))
    val ranked = axes.zipWithIndex.foldLeft(celled) {
      case (d, ((k, p, tbs, name), i)) =>
        d.join(broadcast(offs.filter(col("__axis") === i)
            .select(col("__cell").as(s"__cell$i"),
              col("__off").as(s"__off$i"))), Seq(s"__cell$i"))
          .withColumn(s"__r$i", col(s"__off$i") +
            row_number().over(Window.partitionBy(col(s"__cell$i"))
              .orderBy(p +: tbs: _*)).cast("long"))
          .withColumn(name, ntileFromRank(s"__r$i", "__n", k))
    }
    val internals = Seq("__n", "__gc") ++ ix.flatMap(i => Seq(s"__v$i", s"__t$i",
      s"__mn$i", s"__mx$i", s"__tmn$i", s"__tmx$i", s"__vw$i", s"__sub$i",
      s"__cell$i", s"__off$i", s"__r$i"))
    ranked.drop(internals: _*)
  }
}
