package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The columnar trade store — Spark-native equivalent of ClickHouse
 * `MergeTree ORDER BY time_placed` (`db/clickhouse/init.sql:14-15`,
 * SURVEY.md §2.5 D3):
 *
 *  - `partitionBy(trade_date)` → partition pruning for date-range queries
 *    (`PruneFileSourcePartitions`), the analogue of PK-granule pruning;
 *  - `sortWithinPartitions(time_placed)` → parquet row-group min/max stats
 *    are tight on time, so the trends query's pushed range filter skips
 *    row groups exactly like the MergeTree sparse index;
 *  - dictionary encoding of the low-cardinality currency/country columns
 *    (`init.sql:6,7,11`) is automatic in parquet.
 *
 * At 100 TB: writes shuffle once on trade_date (bounded cardinality:
 * days), each partition writes independently; no global sort. Skewed
 * hot days are split by the `repartitionByRange` extra key.
 */
object TradeStore {

  def write(trades: DataFrame, path: String): Unit =
    trades
      .withColumn("trade_date", to_date(col("time_placed")))
      // range-partition on (date, time) rather than hash on date alone:
      // hot dates spread over multiple tasks while staying time-clustered
      .repartitionByRange(col("trade_date"), col("time_placed"))
      .sortWithinPartitions(col("time_placed"))
      .write
      .partitionBy("trade_date")
      .mode("append")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("trade_date")
}
