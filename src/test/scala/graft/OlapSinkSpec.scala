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

  test("LIVE JDBC round-trip against embedded Derby: batch INSERT then read-back") {
    // The ClickHouse driver is env-absent, but writeBatch is generic
    // over the JDBC target — and Spark SHIPS an embeddable database
    // (Derby, the metastore backend) plus a DerbyDialect. Running the
    // identical production code path (format jdbc, batch INSERT,
    // isolationLevel=NONE) against a real driver proves everything but
    // the ClickHouse driver class itself: URL plumbing, dialect DDL,
    // column order, batched writes, type round-trip.
    val db = java.nio.file.Files.createTempDirectory("olap_derby")
      .resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    OlapSink.writeBatch(trades, url, table = "trades", driver = driver)
    // replay-safety shape: a second batch appends (at-least-once, like
    // MergeTree absorbing redelivery as duplicate rows)
    OlapSink.writeBatch(trades, url, table = "trades", driver = driver)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "trades")
      .option("driver", driver).load()
    assert(back.columns.toSeq.map(_.toLowerCase) ==
      OlapSink.TradeColumns)
    val rows = back.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5),
      r.getString(6), r.getTimestamp(7)))
    assert(rows.length == 2 && rows.distinct.length == 1)
    assert(rows.head == ("u1", "EUR", "USD", 1000000L, 747100L, 0.7471,
      "FR", Timestamp.valueOf("2024-01-24 16:10:00")))
  }

  test("LIVE streaming import plane into Derby: micro-batches land via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val db = java.nio.file.Files.createTempDirectory("olap_derby_stream")
      .resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    val ckpt = java.nio.file.Files
      .createTempDirectory("olap_derby_ckpt").toString
    val src = MemoryStream[(String, String, String, Long, Long, Double,
      String, Timestamp)]
    val q = OlapSink.startImport(
      src.toDS().toDF(OlapSink.TradeColumns: _*), url, ckpt,
      table = "trades", driver = driver)
    try {
      src.addData(("u1", "EUR", "USD", 1000000L, 747100L, 0.7471, "FR",
        Timestamp.valueOf("2024-01-24 16:10:00")))
      q.processAllAvailable()
      src.addData(("u2", "GBP", "JPY", 2000000L, 3800000L, 1.9, "UK",
        Timestamp.valueOf("2024-01-24 16:11:00")))
      q.processAllAvailable()
    } finally q.stop()
    val users = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "trades")
      .option("driver", driver).load()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(users == Seq("u1", "u2"))
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
