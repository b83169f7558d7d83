package graft

import org.apache.spark.sql.types._

/**
 * Data model for the currency-trade analytics engine.
 *
 * Mirrors the reference's stored schema (`/root/reference/db/clickhouse/init.sql:3-15`)
 * and wire format (`/root/reference/consumer/http/rest/api.go:16-25`), re-expressed
 * as Spark types. See SURVEY.md §1.
 */
object model {

  /** Wire JSON schema — the 8-field trade message the reference accepts at
    * POST /api/trade (`consumer/http/rest/api.go:16-25`). The incoming `rate`
    * field is bound but ignored (`api.go:66-74`); it is recomputed at import.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("currencyFrom", StringType),
    StructField("currencyTo", StringType),
    StructField("amountSell", DoubleType),
    StructField("amountBuy", DoubleType),
    StructField("rate", DoubleType),          // ignored on ingest
    StructField("timePlaced", StringType),    // "12-AUG-24 11:23:45", month case-insensitive
    StructField("originatingCountry", StringType)
  ))

  /** Stored table schema — the ClickHouse `cmp.trades` DDL
    * (`db/clickhouse/init.sql:3-15`) as Spark types. UInt64 → LongType
    * (documented deviation, SURVEY.md §1.1c); DateTime64(3,'UTC') →
    * TimestampType with session TZ pinned to UTC.
    */
  val tradeSchema: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("currency_from", StringType),
    StructField("currency_to", StringType),
    StructField("amount_sell_micros", LongType),
    StructField("amount_buy_micros", LongType),
    StructField("rate", DoubleType),          // derived: buy_micros / sell_micros
    StructField("originating_country", StringType),
    StructField("time_placed", TimestampType)
  ))

  /** Stored trade row (schema (c) in SURVEY.md §1.1). */
  case class Trade(
      user_id: String,
      currency_from: String,
      currency_to: String,
      amount_sell_micros: Long,
      amount_buy_micros: Long,
      rate: Double,
      originating_country: String,
      time_placed: java.sql.Timestamp)

  /** Query result row (`trends/listing/statistic.go:5-11`). `window` is the
    * tumbling-window start. Median is exact in this engine (ClickHouse's
    * `median` is approximate — documented deviation, SURVEY.md §2.3 A3).
    */
  case class Statistic(
      window: java.sql.Timestamp,
      min: Double,
      max: Double,
      mean: Double,
      median: Double)

  /** Tumbling window width of the trends query
    * (`trends/listing/service.go:49`: INTERVAL 10 minute). */
  val TrendsWindowSeconds: Long = 600L

  /** Ingest timestamp layout (`consumer/http/rest/api.go:61`:
    * Go layout "02-Jan-06 15:04:05"). */
  val TimePlacedFormat: String = "dd-MMM-yy HH:mm:ss"
}
