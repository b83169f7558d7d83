package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.TradeIngest
import graft.operators.Trends

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then rows-only check).
  * Column names/aliases match between the Spark plan and the oracle SQL;
  * float outputs are rounded (6 dp) and window starts emitted as epoch
  * seconds so the hash compare is engine-stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("trends_10min")(spark, "/root/testdata/sf0.001")

  // Filter range for the events-table trends queries: interior of the
  // generated Jan-2024 span at every scale factor, bounds inclusive
  // (reference semantics, trends/listing/service.go:56-57).
  private val TrendsFrom = "2024-01-05 00:00:00"
  private val TrendsTo = "2024-01-25 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Flagship: 10-min tumbling window min/max/avg/median (SURVEY §2.3) ──
    "trends_10min" -> ((s, dir) =>
      Trends.trendsOf(Tables.events(s, dir), "ts", "event_type", "purchase",
        "value", TrendsFrom, TrendsTo)),

    // ── Ingest chain T1-T6: wire JSON → validated, normalized trade rows ──
    // Wire messages are synthesized deterministically from `events`, with the
    // timestamp formatted in UPPERCASE month to exercise Go-style
    // case-insensitive parsing; the oracle recomputes the normalization
    // directly from the source columns, so a hash match proves the whole
    // JSON→typed chain (micros truncation, rate derivation, ts parse).
    "trade_ingest" -> { (s, dir) =>
      val wire = Tables.events(s, dir).select(to_json(struct(
        col("event_id").cast("string").as("userId"),
        upper(substring(col("event_type"), 1, 3)).as("currencyFrom"),
        lit("USD").as("currencyTo"),
        col("value").as("amountSell"),
        (col("value") * lit(1.5)).as("amountBuy"),
        lit(0.0).as("rate"), // ignored by ingest, recomputed
        upper(date_format(col("ts"), model.TimePlacedFormat)).as("timePlaced"),
        lit("US").as("originatingCountry"))).as("json"))
      TradeIngest.parseTrades(wire)
        .filter(col("amount_sell_micros") =!= 0) // ÷0→Inf covered in unit tests; DuckDB yields NULL
        .select(
          col("user_id"), col("currency_from"), col("currency_to"),
          col("amount_sell_micros"), col("amount_buy_micros"),
          round(col("rate"), 6).as("rate"),
          col("originating_country"),
          col("time_placed").cast("long").as("time_placed_s"))
        .orderBy(col("user_id").cast("long"))
    },
  )

  /** DuckDB-equivalent SQL per query (tables resolved by the driver against
    * the same parquet dir). */
  def oracleSql: Map[String, String] = Map(

    "trends_10min" ->
      s"""SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |  round(min(value), 6) AS v_min,
         |  round(max(value), 6) AS v_max,
         |  round(avg(value), 6) AS v_mean,
         |  round(median(value), 6) AS v_median,
         |  count(*) AS n
         |FROM events
         |WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |  AND event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "trade_ingest" ->
      """SELECT CAST(event_id AS VARCHAR) AS user_id,
        |  upper(substr(event_type, 1, 3)) AS currency_from,
        |  'USD' AS currency_to,
        |  CAST(trunc(value * 1e6) AS BIGINT) AS amount_sell_micros,
        |  CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT) AS amount_buy_micros,
        |  round(CAST(CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT) AS DOUBLE)
        |        / CAST(CAST(trunc(value * 1e6) AS BIGINT) AS DOUBLE), 6) AS rate,
        |  'US' AS originating_country,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS time_placed_s
        |FROM events
        |WHERE CAST(trunc(value * 1e6) AS BIGINT) <> 0
        |ORDER BY event_id""".stripMargin,
  )
}
