package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering for multi-column data skipping — the
 * extension of the store's single-column time clustering (SURVEY §2.5 D3)
 * to queries that filter on EITHER of two columns.
 *
 * A single sort column gives tight parquet min/max stats on that column
 * only; a filter on any other column reads everything. Interleaving the
 * bits of two rank-scaled keys produces a 1-D sort order whose contiguous
 * ranges are 2-D rectangles, so row-group/file stats are tight on BOTH
 * columns and a predicate on either one skips most of the data — the
 * same layout Delta/Iceberg expose as OPTIMIZE ZORDER BY.
 *
 * Everything here is plain codegen'd column arithmetic (shifts/masks) —
 * no UDF, no custom expression needed.
 */
object ZOrder {

  /** Scale a numeric column to [0, 2^bits) given fixed bounds (at scale:
    * approximate quantile bounds from a sample; exactness of the bounds
    * only affects skipping quality, never correctness). */
  def scaled(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val top = (1L << bits) - 1
    least(greatest(((c.cast("double") - lo) / (hi - lo)) * top, lit(0.0)),
      lit(top.toDouble)).cast("long")
  }

  /** Interleave the low `bits` bits of two scaled keys: a in even
    * positions, b in odd — the Morton code. */
  def interleaved(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits <= 31, "2*bits must fit a long")
    (0 until bits).map { k =>
      shiftleft(shiftright(a, k).bitwiseAND(1), 2 * k) +
        shiftleft(shiftright(b, k).bitwiseAND(1), 2 * k + 1)
    }.reduce(_ + _)
  }

  /** Cluster a DataFrame by the z-value of two columns into `nChunks`
    * range partitions (each written file then covers one z-range — a 2-D
    * rectangle — so its footer stats are tight on both columns). */
  def cluster(df: DataFrame, a: Column, aLo: Double, aHi: Double,
      b: Column, bLo: Double, bHi: Double, nChunks: Int,
      bits: Int = 16): DataFrame = {
    val z = interleaved(scaled(a, aLo, aHi, bits), scaled(b, bLo, bHi, bits),
      bits)
    df.withColumn("_z", z)
      .repartitionByRange(nChunks, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
