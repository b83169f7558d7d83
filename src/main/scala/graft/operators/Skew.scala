package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation primitives (SURVEY.md §2.5 D2; the brief's "salting for
 * skew"). AQE's skew-join splitting handles joins at runtime; these cover
 * the aggregation side, where one hot key would otherwise serialize into a
 * single reducer.
 *
 * Salting here is DETERMINISTIC — the salt is a hash of stable columns,
 * not a random number — so results are reproducible and retries/speculative
 * tasks can't diverge.
 */
object Skew {

  /**
   * Two-phase aggregation for skewed group keys: aggregate by
   * (key, salt) first — spreading each hot key over `salts` reducers —
   * then combine the partials by key.
   *
   * Caller supplies the partial and final aggregate pairs; they must be
   * algebraically mergeable (sum/sum, count/sum, min/min, max/max...).
   *
   * @param saltFrom stable columns whose hash spreads rows (e.g. a row id)
   */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      salts: Int)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: skew-safe sum/count per key. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFrom: Seq[String], salts: Int = 16): DataFrame =
    saltedAggregate(df, keys, saltFrom, salts)(
      partialAggs = Seq(sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt")),
      finalAggs = Seq(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n")))
}
