package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Schema-driven data profiling — the audit a pipeline runs on every new
 * corpus drop before trusting it (null saturation, key cardinality,
 * constant columns). The operator is generic over ANY input schema: the
 * per-column aggregate list is built from `df.schema`, so the same code
 * profiles a 10-column TPC-H table or a 3000-column feature store.
 *
 * Shape at 100 TB: ONE scan. Spark plans the N exact count-distincts as
 * a single Expand (N× row fan-out) + two-phase hash aggregate — each
 * expanded row carries one column's value, so the shuffle is
 * per-column-distinct-keyed and partial aggregation collapses
 * duplicates map-side. For columns whose cardinality itself is at data
 * scale (primary keys), [[profileApprox]] swaps count_distinct for
 * approx_count_distinct (HLL++): the per-column state crossing the
 * shuffle becomes a FIXED-SIZE register set instead of the distinct
 * values themselves — AND the Expand disappears entirely (the fan-out
 * only exists to split exact distincts into per-column groups; sketch
 * aggregates each carry their own buffer through one HashAggregate),
 * so the 100 TB variant is one scan + one tiny shuffle of N register
 * sets. The exact form is kept as the oracle-gated query; the approx
 * swap is gated rows-only plus a relative-error + plan-shape spec
 * (Spark's HLL++ is not rebuildable in the oracle engine).
 */
object Profiling {

  /** One row per column: nulls, exact distincts, and the global row
    * count (the denominators a null-rate/constancy check needs). */
  def profile(df: DataFrame): DataFrame =
    assemble(df, c => count_distinct(col(c)))

  /** The 100 TB variant: HLL++ distincts (bounded sketch state per
    * column across the shuffle), identical one-scan Expand plan —
    * asserted in ProfilingSpec, not just claimed. */
  def profileApprox(df: DataFrame, rsd: Double = 0.05): DataFrame =
    assemble(df, c => approx_count_distinct(col(c), rsd))

  private def assemble(df: DataFrame,
      distinctAgg: String => Column): DataFrame = {
    val cols = df.schema.fieldNames.toIndexedSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg(c).as(s"${c}__distinct"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // wide 1-row frame → long (column, n_nulls, n_distinct, n_rows):
    // stack() is driver-built from the schema, evaluated executor-side
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    wide.select(
      expr(s"stack(${cols.length}, $stackArgs) AS (column, n_nulls, n_distinct)"),
      col("__rows").as("n_rows"))
      .orderBy(col("column"))
  }
}
