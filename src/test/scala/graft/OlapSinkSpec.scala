package graft

import java.sql.Timestamp

import graft.store.OlapSink

/** The external-OLAP (ClickHouse-shaped) JDBC sink. No JDBC driver jar
  * exists in the offline sandbox, so the live INSERT cannot run (same
  * env limit as the Kafka endpoints — COVERAGE.md); what IS testable is
  * everything up to driver resolution: the column contract against the
  * reference DDL and that the writer is wired through Spark's built-in
  * jdbc source (a misconfigured format or column list would fail with a
  * different error than the driver-class load). */
class OlapSinkSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("u1", "EUR", "USD", 1000000L, 747100L, 0.7471, "FR",
      Timestamp.valueOf("2024-01-24 16:10:00")))
    .toDF("user_id", "currency_from", "currency_to", "amount_sell_micros",
      "amount_buy_micros", "rate", "originating_country", "time_placed")

  test("column contract matches the reference INSERT list in order") {
    // importer/importing/service.go:156-166 / db/clickhouse/init.sql
    assert(OlapSink.TradeColumns == Seq("user_id", "currency_from",
      "currency_to", "amount_sell_micros", "amount_buy_micros", "rate",
      "originating_country", "time_placed"))
    // projection resolves on a parsed-trades-shaped frame (extra columns
    // are dropped, order is imposed)
    val projected = trades.withColumn("extra",
      org.apache.spark.sql.functions.lit(1))
      .select(OlapSink.TradeColumns.map(
        org.apache.spark.sql.functions.col): _*)
    assert(projected.columns.toSeq == OlapSink.TradeColumns)
  }

  test("writer is wired to the jdbc source: fails exactly at driver load") {
    // Spark's jdbc format is built-in; the ClickHouse driver class is
    // not on the classpath. The failure mode must therefore be the
    // driver-class load — anything else (unknown format, unresolved
    // column) would surface first and mean the plumbing is wrong.
    val e = intercept[Exception] {
      OlapSink.writeBatch(trades, "jdbc:clickhouse://localhost:8123/cmp")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists {
      case _: ClassNotFoundException => true
      case t => t.getMessage != null &&
        t.getMessage.contains("com.clickhouse.jdbc.ClickHouseDriver")
    }, s"unexpected failure shape: $e")
  }
}
