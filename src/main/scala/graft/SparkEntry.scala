package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.TradeIngest
import graft.operators.{EventsOps, Relational, Trends}

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

    // ── Relational breadth (SURVEY §2 extension: joins/topk/distinct/window) ──
    "q1_pricing" -> ((s, dir) => Relational.q1Pricing(Tables.lineitem(s, dir))),
    "q3_shipping" -> ((s, dir) => Relational.q3Shipping(
      Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_region_revenue" -> ((s, dir) => Relational.q5RegionRevenue(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "topk_orders" -> ((s, dir) => Relational.topkOrders(Tables.orders(s, dir))),
    "group_distinct" -> ((s, dir) => Relational.groupDistinct(Tables.orders(s, dir))),
    "window_top_orders" -> ((s, dir) => Relational.windowTopOrders(Tables.orders(s, dir))),

    // ── Events: JSON extraction + declarative rate-limit window (ST6) ──
    "events_json_agg" -> ((s, dir) => EventsOps.jsonExtractAgg(Tables.events(s, dir))),
    "rate_limit_flags" -> ((s, dir) => EventsOps.rateLimitFlags(Tables.events(s, dir))),
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

    // Money arithmetic in exact DECIMAL (2-dp sources) then cast to double —
    // identical across engines regardless of float summation order.
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "group_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,

    "events_json_agg" ->
      """SELECT event_type,
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "rate_limit_flags" ->
      """SELECT event_id, user_id, in_window, in_window > 2 AS limited FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                   RANGE BETWEEN 999999 PRECEDING AND CURRENT ROW) AS in_window
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,
  )
}
