package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * External-OLAP deployment of the import plane: the reference's importer
 * flushes its queue as ONE columnar INSERT into ClickHouse
 * (`importer/importing/service.go:132-174`, table DDL
 * `db/clickhouse/init.sql` — MergeTree ordered by time_placed). The
 * SURVEY-sanctioned store equivalent is the parquet `TradeStore` (S5);
 * this sink completes the north-star "output to ClickHouse" mapping as a
 * `foreachBatch` JDBC writer behind an option — the same pattern as the
 * Kafka endpoints ([[graft.streaming.KafkaTradeStream]]): format/driver
 * names resolve at RUN time, so this compiles and is API-tested without
 * any JDBC driver jar (none exists in the zero-egress sandbox —
 * COVERAGE.md carries the dated env-limit note), and a deployment with
 * `clickhouse-jdbc` (or any JDBC OLAP driver) on the classpath runs it
 * unchanged.
 *
 * Fidelity to the importer's INSERT:
 *  - identical column list and order (`service.go:156-166`), identical
 *    names as the DDL: user_id, currency_from, currency_to,
 *    amount_sell_micros, amount_buy_micros, rate, originating_country,
 *    time_placed.
 *  - one multi-row batch INSERT per micro-batch flush (Spark JDBC's
 *    `batchsize` plays the importer's queue flush; `isolationLevel=NONE`
 *    matches ClickHouse's non-transactional INSERT path).
 *  - at-least-once like the reference (offsets commit after the sink
 *    succeeds; ClickHouse MergeTree absorbs replays as duplicate rows,
 *    same as the reference's consumer-group redelivery).
 */
object OlapSink {

  /** The importer's INSERT column list, in its order
    * (`importer/importing/service.go:156-166`). */
  val TradeColumns: Seq[String] = Seq(
    "user_id", "currency_from", "currency_to",
    "amount_sell_micros", "amount_buy_micros",
    "rate", "originating_country", "time_placed")

  /** One columnar batch INSERT — the `foreachBatch` body. Generic over
    * the JDBC OLAP target; the defaults name the reference deployment
    * (ClickHouse driver class, `cmp.trades` table —
    * `db/clickhouse/init.sql`). */
  def writeBatch(trades: DataFrame, jdbcUrl: String,
      table: String = "cmp.trades",
      driver: String = "com.clickhouse.jdbc.ClickHouseDriver",
      batchSize: Int = 100000): Unit =
    trades
      .select(TradeColumns.map(col): _*)
      .write
      .format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "NONE")
      .mode("append")
      .save()

  /** Import plane with the OLAP sink swapped in for the parquet store:
    * parsed trades stream → 1 s micro-batches → columnar INSERT, the
    * drop-in alternative to `TradeStore`-backed
    * [[graft.streaming.TradeStream]] (ST1/ST2 semantics unchanged —
    * at-least-once, duplicates preserved). */
  def startImport(parsedTrades: DataFrame, jdbcUrl: String,
      checkpointPath: String,
      table: String = "cmp.trades",
      driver: String = "com.clickhouse.jdbc.ClickHouseDriver",
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    parsedTrades
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeBatch(batch, jdbcUrl, table, driver)
      }
      .start()
}
