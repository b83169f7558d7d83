package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream EVENT-TIME join: each trade enriched with the reference
 * quotes that preceded it within a bounded horizon — the streaming
 * market-data lookup (the batch as-of join's streaming sibling,
 * `operators.AsOfJoin`).
 *
 * Semantics and scale contract:
 *  - both sides carry watermarks, and the join condition bounds
 *    `quote_ts` to a window ending at the trade's event time, so Spark
 *    can PROVE state expiry: a buffered quote is dropped once the trade
 *    watermark passes `quote_ts + horizon`, a buffered trade once the
 *    quote watermark passes its time. State is sized by rate × horizon,
 *    never by stream history — the property that keeps a 100 TB/day
 *    join from accumulating unbounded state.
 *  - inner join: a trade with no quote in its horizon is withheld until
 *    the watermark proves none can arrive, then dropped (use leftOuter
 *    for emit-with-null semantics; same state bound).
 *  - the join itself shuffles both sides by the currency-pair key into
 *    the same state store partitions — one exchange per side, then
 *    stateful symmetric hash join, the same shape at any scale.
 */
object StreamJoin {

  /** Trades ⋈ quotes on the currency pair, quote within
    * [trade time − horizon, trade time]. Inputs may be streaming or
    * batch frames with the named columns:
    * trades(user_id, currency_from, currency_to, rate, time_placed),
    * quotes(currency_from, currency_to, quote, quote_ts). */
  def tradesWithQuotes(trades: DataFrame, quotes: DataFrame,
      horizon: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val t = trades.withWatermark("time_placed", watermark).alias("t")
    val q = quotes.withWatermark("quote_ts", watermark).alias("q")
    t.join(q,
      col("t.currency_from") === col("q.currency_from") &&
        col("t.currency_to") === col("q.currency_to") &&
        col("q.quote_ts") >= col("t.time_placed") - expr(s"INTERVAL $horizon") &&
        col("q.quote_ts") <= col("t.time_placed"))
      .select(col("t.user_id"), col("t.currency_from"), col("t.currency_to"),
        col("t.rate"), col("t.time_placed"),
        col("q.quote").as("ref_quote"), col("q.quote_ts"))
  }
}
