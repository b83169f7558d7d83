package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Core family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object CoreReg {
  // ── Flagship: 10-min tumbling window min/max/avg/median (SURVEY §2.3) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "trends_10min" -> ((s, dir) =>
      Trends.trendsOf(Tables.events(s, dir), "ts", "event_type", "purchase",
        "value", TrendsFrom, TrendsTo)),
    // Sliding (overlapping) 10-min windows every 5 min — the capability
    // step past the reference's tumbling-only flagship; each event lands
    // in exactly two windows.
    "trends_sliding" -> ((s, dir) =>
      Trends.trendsOf(Tables.events(s, dir), "ts", "event_type", "purchase",
        "value", TrendsFrom, TrendsTo, slide = Some("5 minutes"))),
    // Calendar-spine gap fill: every 10-min slot present, quiet slots as
    // n=0 — the serving-tier completion of the flagship series.
    "trends_gapfill" -> ((s, dir) =>
      Trends.trendsGapfill(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),
    "trends_gapfill_locf" -> ((s, dir) =>
      Trends.trendsGapfillLocf(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),
    // 1-hour trailing moving average over the 10-min series.
    "trends_moving_avg" -> ((s, dir) =>
      Trends.trendsMovingAvg(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),
    // ClickHouse-median parity variant: same window aggregate with the
    // custom bottom-k TypedImperativeAggregate. The selection hash is the
    // portable h60 of the value floored onto the micros grid, so the
    // DuckDB oracle rebuilds the IDENTICAL sample (rank by the same md5
    // prefix, keep rn ≤ k) and hash-matches the sketch's error — the same
    // technique that gates vocab_cms/kmv_distinct. Quantizing the sketch
    // INPUT to micros is the documented contract of the approx variant
    // (the exact-median query `trends_10min` is unquantized).
    "trends_10min_approx" -> { (s, dir) =>
      import graft.functions.ApproxQuantile.keyed_median_sketch
      import graft.functions.PortableHash.h60
      val vm = floor(col("value") * lit(1e6)).cast("long")
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("__vm", vm)
        .withColumn("__h", h60(col("__vm").cast("string")))
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(
          (keyed_median_sketch(col("__h"), col("__vm").cast("double")) /
            lit(1000000.0)).as("median_approx"),
          count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("window_start"),
          col("median_approx"), col("n"))
        .orderBy(col("window_start"))
    },
    // Wire messages are synthesized deterministically from `events`, with the
    // timestamp formatted in UPPERCASE month to exercise Go-style
    // case-insensitive parsing; the oracle recomputes the normalization
    // directly from the source columns, so a hash match proves the whole
    // JSON→typed chain (micros truncation, rate derivation, ts parse).
    "trade_ingest" -> { (s, dir) =>
      // the events file fits one scan partition; spread the CPU-bound
      // JSON serialize/parse chain across cores before it starts
      val nCores = s.sparkContext.defaultParallelism
      val wire = Tables.events(s, dir).repartition(nCores).select(to_json(struct(
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
    // Trades synthesized from events; encode → decode must be identity AND
    // the byte length must match the oracle's independent arithmetic over
    // the wire format (tag bytes + LEB128 varint widths + field omission),
    // so the bytes themselves are oracle-checked, not just the values.
    // Some rows exercise proto3 default omission (empty country, zero buy).
    "trade_proto_roundtrip" -> { (s, dir) =>
      import graft.functions.ProtoTrade.{proto_decode_trade, proto_encode_trade}
      val nCores = s.sparkContext.defaultParallelism
      val src = Tables.events(s, dir).repartition(nCores).select(
        col("event_id").cast("string").as("user_id"),
        upper(substring(col("event_type"), 1, 3)).as("currency_from"),
        lit("USD").as("currency_to"),
        (col("value") * lit(1e6)).cast("long").as("amount_sell_micros"),
        when(col("event_id") % 7 === 0, lit(0L))
          .otherwise((col("value") * lit(1.5) * lit(1e6)).cast("long"))
          .as("amount_buy_micros"),
        unix_millis(col("ts")).as("time_placed_ms"),
        when(col("event_id") % 10 === 0, lit(""))
          .otherwise(lit("US")).as("originating_country"))
      src
        .select(proto_encode_trade(col("user_id"), col("currency_from"),
          col("currency_to"), col("amount_sell_micros"),
          col("amount_buy_micros"), col("time_placed_ms"),
          col("originating_country")).as("pb"))
        .select(proto_decode_trade(col("pb")).as("tr"),
          length(col("pb")).cast("long").as("pb_len"))
        .select(col("tr.user_id").as("user_id"),
          col("tr.currency_from").as("currency_from"),
          col("tr.currency_to").as("currency_to"),
          col("tr.amount_sell_micros").as("amount_sell_micros"),
          col("tr.amount_buy_micros").as("amount_buy_micros"),
          col("tr.time_placed_ms").as("time_placed_ms"),
          col("tr.originating_country").as("originating_country"),
          col("pb_len"))
        .orderBy(col("user_id").cast("long"))
    }
  )

  def sql: Map[String, String] = Map(
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
    // Bottom-k median sketch reproduced hash-for-hash: same micros floor,
    // same h60 selection hash, same rank rule (keep rn ≤ 1024), same
    // linear interpolation pos = 0.5·(nk−1) over the kept sample — the
    // oracle matches the sketch's ERROR, not just its target. The
    // interpolation operands are integer micros (exact doubles), so both
    // engines produce bit-identical IEEE results.
    "trends_10min_approx" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'
        |), hashed AS (
        |  SELECT window_start, vm,
        |    ('0x' || substr(md5(CAST(vm AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM b
        |), ranked AS (
        |  SELECT window_start, vm,
        |    row_number() OVER (PARTITION BY window_start ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY window_start) AS n_all
        |  FROM hashed
        |), kept AS (
        |  SELECT window_start, vm, n_all,
        |    row_number() OVER (PARTITION BY window_start ORDER BY vm) AS vrn,
        |    count(*) OVER (PARTITION BY window_start) AS nk
        |  FROM ranked WHERE rn <= 1024
        |), med AS (
        |  SELECT window_start, max(n_all) AS n, max(nk) AS nk,
        |    max(CASE WHEN vrn = (nk - 1) // 2 + 1 THEN vm END) AS vlo,
        |    max(CASE WHEN vrn = CASE WHEN (nk - 1) // 2 + 2 > nk
        |                            THEN nk ELSE (nk - 1) // 2 + 2 END
        |        THEN vm END) AS vhi
        |  FROM kept GROUP BY window_start
        |)
        |SELECT window_start,
        |  (CAST(vlo AS DOUBLE) +
        |    (0.5 * (nk - 1) - ((nk - 1) // 2)) *
        |    (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE))) / 1000000.0
        |    AS median_approx,
        |  CAST(n AS BIGINT) AS n
        |FROM med ORDER BY window_start""".stripMargin,
    "trends_gapfill" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean, count(*) AS n
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), spine AS (
         |  SELECT unnest(generate_series(
         |    CAST(floor(epoch(TIMESTAMP '$TrendsFrom')/600)*600 AS BIGINT),
         |    CAST(floor(epoch(TIMESTAMP '$TrendsTo')/600)*600 AS BIGINT),
         |    CAST(600 AS BIGINT))) AS window_start
         |)
         |SELECT s.window_start, coalesce(a.n, 0) AS n, a.v_mean
         |FROM spine s LEFT JOIN agg a USING (window_start)
         |ORDER BY 1""".stripMargin,
    "trends_gapfill_locf" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean, count(*) AS n
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), spine AS (
         |  SELECT unnest(generate_series(
         |    CAST(floor(epoch(TIMESTAMP '$TrendsFrom')/600)*600 AS BIGINT),
         |    CAST(floor(epoch(TIMESTAMP '$TrendsTo')/600)*600 AS BIGINT),
         |    CAST(600 AS BIGINT))) AS window_start
         |)
         |SELECT window_start, n, v_mean,
         |  last_value(v_mean IGNORE NULLS) OVER (ORDER BY window_start
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM (
         |  SELECT s.window_start, coalesce(a.n, 0) AS n, a.v_mean
         |  FROM spine s LEFT JOIN agg a USING (window_start)
         |) t ORDER BY window_start""".stripMargin,
    "trends_moving_avg" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |)
         |, m AS (
         |  SELECT window_start, v_mean,
         |    CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         |      AS v_micro
         |  FROM agg)
         |SELECT window_start, v_mean,
         |  CAST(sum(v_micro) OVER w // (count(*) OVER w) AS BIGINT)
         |    AS ma_micro
         |FROM m
         |WINDOW w AS (ORDER BY window_start
         |             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |ORDER BY window_start""".stripMargin,
    // Each event belongs to exactly two overlapping 10-min/5-min windows:
    // starts floor(t/300)·300 and that minus 300.
    "trends_sliding" ->
      s"""WITH starts AS (
         |  SELECT value, unnest([
         |    CAST(floor(epoch(ts)/300)*300 AS BIGINT) - 300,
         |    CAST(floor(epoch(ts)/300)*300 AS BIGINT)
         |  ]) AS window_start
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |)
         |SELECT window_start,
         |  round(min(value), 6) AS v_min,
         |  round(max(value), 6) AS v_max,
         |  round(avg(value), 6) AS v_mean,
         |  round(median(value), 6) AS v_median,
         |  count(*) AS n
         |FROM starts GROUP BY 1 ORDER BY 1""".stripMargin,
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
    // Byte-level proto check: pb_len recomputes the proto3 size from the
    // wire-format rules — 1 tag byte + LEB128 varint width per int64
    // (negative ⇒ 10-byte varint), 1 tag + 1 length byte + bytes per
    // sub-128-byte string, proto3 defaults omitted. String fields here are
    // ASCII and < 128 bytes (single length byte), asserted by the values.
    "trade_proto_roundtrip" -> {
      // tag + varint width of a non-negative int64 v, 0 when omitted
      def vlen(v: String): String = {
        val bounds = (1 to 8).map(k => (s"CAST(${1L << (7 * k)} AS BIGINT)", k + 1))
        s"""CASE WHEN $v = 0 THEN 0 WHEN $v < 0 THEN 11
           |    ${bounds.map { case (b, w) => s"WHEN $v < $b THEN $w" }.mkString(" ")}
           |    ELSE 10 END""".stripMargin
      }
      def slen(c: String): String =
        s"CASE WHEN len($c) > 0 THEN 2 + len($c) ELSE 0 END"
      s"""WITH src AS (
         |  SELECT event_id,
         |    CAST(event_id AS VARCHAR) AS user_id,
         |    upper(substr(event_type, 1, 3)) AS currency_from,
         |    'USD' AS currency_to,
         |    CAST(trunc(value * 1e6) AS BIGINT) AS amount_sell_micros,
         |    CASE WHEN event_id % 7 = 0 THEN 0
         |         ELSE CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT)
         |    END AS amount_buy_micros,
         |    epoch_ms(ts) AS time_placed_ms,
         |    CASE WHEN event_id % 10 = 0 THEN '' ELSE 'US' END
         |      AS originating_country
         |  FROM events
         |)
         |SELECT user_id, currency_from, currency_to, amount_sell_micros,
         |  amount_buy_micros, time_placed_ms, originating_country,
         |  CAST(${slen("user_id")} + ${slen("currency_from")}
         |    + ${slen("currency_to")} + ${vlen("amount_sell_micros")}
         |    + ${vlen("amount_buy_micros")} + ${vlen("time_placed_ms")}
         |    + ${slen("originating_country")} AS BIGINT) AS pb_len
         |FROM src ORDER BY event_id""".stripMargin
    }
  )
}
