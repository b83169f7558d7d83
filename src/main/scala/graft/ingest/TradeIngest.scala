package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model

/**
 * Ingest/normalize operator chain — the consumer-service plane of the
 * reference (SURVEY.md §2.2 T1–T6), as a pure `DataFrame => DataFrame`
 * column pipeline (all built-in codegen'd functions, no UDFs).
 *
 * Reference semantics reproduced exactly:
 *  - T1 schema validation: rows failing JSON binding or timestamp parse are
 *    rejected (`consumer/http/rest/api.go:42-45,61-65` → HTTP 400).
 *  - T2 timestamp parse: layout "02-Jan-06 15:04:05", month case-INsensitive
 *    (Go's time.Parse), no zone → UTC. Go two-digit-year rule: 69-99 → 19xx,
 *    00-68 → 20xx.
 *  - T3 decimal→micros: `int64(amount * 1e6)` — double multiply then truncate
 *    toward zero (`api.go:83-85`); Spark's double→long cast matches.
 *  - T5 derived rate = double(buy_micros)/double(sell_micros), computed at
 *    import and stored (`importer/importing/service.go:150`); the wire `rate`
 *    field is ignored (`api.go:66-74`). ÷0 → Infinity/NaN, same as Go.
 *  - T6 projection camelCase → snake_case.
 */
object TradeIngest {

  /** Parse `"12-AUG-24 11:23:45"` (any month case) → UTC timestamp, null on
    * malformed input (the 400 path). Native codegen'd expression — see
    * ParseTradeTime for the Go time.Parse semantics and why the composable
    * `try_make_timestamp` form was replaced (TryEval kills codegen,
    * ~500× slower).
    */
  def parseTimePlaced(s: Column): Column =
    graft.functions.ParseTradeTime.parse_trade_time(s)

  /** T3: decimal amount → integer micros, truncating toward zero exactly like
    * Go's `int64(amount * 1_000_000)` (`api.go:83-85`). Values outside long
    * range (incl. NaN) yield null → row rejected; deviation from Go, whose
    * out-of-range conversion is platform-defined garbage — we reject rather
    * than store garbage or (ANSI) crash the job.
    */
  def toMicros(amount: Column): Column = {
    val prod = amount * lit(1e6)
    // bounds: -2^63 (exactly representable) inclusive, 2^63 exclusive;
    // NaN fails both comparisons → null
    when(prod >= lit(-9.223372036854776e18) && prod < lit(9.223372036854776e18),
      prod.cast(LongType))
  }

  /** T5: stored `rate` column (`importer/importing/service.go:150`).
    * Go float64 division semantics: x/0 → ±Infinity, 0/0 → NaN. Spark's ANSI
    * mode raises on ÷0, so the zero-divisor branches are made explicit. */
  def deriveRate(buyMicros: Column, sellMicros: Column): Column = {
    val b = buyMicros.cast(DoubleType)
    when(sellMicros =!= 0, b / sellMicros.cast(DoubleType))
      .when(b > 0, lit(Double.PositiveInfinity))
      .when(b < 0, lit(Double.NegativeInfinity))
      .otherwise(lit(Double.NaN))
  }

  /**
   * Full ingest chain over a DataFrame with a string column `json` holding
   * one wire message per row: from_json(explicit schema) → validity filter
   * (the 400 path) → timestamp parse → micros → rate → snake_case projection.
   *
   * Output schema = `model.tradeSchema`. Invalid rows (unbindable JSON,
   * missing required fields, unparseable timestamp) are dropped, mirroring
   * the reference's 400 rejection. No dedup: duplicate messages produce
   * duplicate rows (at-least-once, SURVEY.md §2.4 ST2).
   */
  def parseTrades(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    // Specialized codegen'd parser instead of from_json: JsonToStructs is
    // a CodegenFallback (interpreted Jackson boundary per row, splits the
    // codegen stage); TradeWireJson is a static call inside the stage and
    // binds strictly like Go encoding/json (wrong-typed field → reject),
    // which is the reference's actual 400 behavior.
    val parsed = raw
      .select(graft.functions.TradeWireJson.parse_trade_wire(col(jsonCol)).as("t"))
      .select(
        col("t.userId").as("user_id"),
        col("t.currencyFrom").as("currency_from"),
        col("t.currencyTo").as("currency_to"),
        toMicros(col("t.amountSell")).as("amount_sell_micros"),
        toMicros(col("t.amountBuy")).as("amount_buy_micros"),
        col("t.originatingCountry").as("originating_country"),
        parseTimePlaced(col("t.timePlaced")).as("time_placed"))
    // T1/T2 validation — reject rows the reference would 400. Expressed as
    // explode(when(valid, array(row))) rather than a Filter node: Catalyst
    // pushes filter predicates through projections by SUBSTITUTING the
    // aliased expressions, which re-evaluates the whole parse chain once
    // per isnotnull term (measured: 7 parses/row). A generator has no
    // predicate to push — parse runs exactly once per row (plan-asserted
    // in TradeIngestSpec).
    val valid =
      col("user_id").isNotNull && col("currency_from").isNotNull &&
      col("currency_to").isNotNull && col("amount_sell_micros").isNotNull &&
      col("amount_buy_micros").isNotNull && col("time_placed").isNotNull
    parsed
      .select(explode(when(valid,
        array(struct(parsed.columns.map(col).toIndexedSeq: _*)))).as("r"))
      .select(col("r.*"))
      .withColumn("rate",
        deriveRate(col("amount_buy_micros"), col("amount_sell_micros")))
      .select(model.tradeSchema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
