package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.store.TradeStore
import graft.streaming.TradeStream

/** S1 over a LIVE NETWORK endpoint — the MemoryStream harness proves the
  * transform chain; this spec proves the chain behind a real TCP
  * boundary with zero extra dependencies: Spark's built-in `socket`
  * source (a line-oriented network reader, the testing-grade stand-in
  * for the Kafka reader this sandbox cannot ship) streams the same
  * wire-JSON the reference's HTTP consumer receives, through the
  * IDENTICAL parse → validate → micros → store chain, from a socket the
  * spec itself serves on loopback. Malformed lines and invalid
  * timestamps are rejected exactly as on the in-memory path (the HTTP
  * 400 contract), and the stored rows carry the same parsed values. */
class SocketIngestSpec extends SparkSpec {

  private def trade(ts: String, rate: Double = 1.1): String =
    s"""{"userId":"u1","currencyFrom":"EUR","currencyTo":"USD",
       |"amountSell":1000,"amountBuy":${1000 * rate},
       |"timePlaced":"$ts","originatingCountry":"US"}"""
      .stripMargin.replace("\n", "")

  test("live socket ingest: wire JSON over TCP → parse → store; 400-path rejects on the wire too") {
    val dir = Files.createTempDirectory("graft-socket").toString
    val server = new java.net.ServerSocket(0)
    val lines = Seq(
      trade("12-AUG-24 11:23:45"),
      "{malformed",
      trade("12-AUG-24 11:31:00", 1.2),
      trade("BAD-TS", 9.9))
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        // hold the connection open while the query drains; daemon
        // thread dies with the suite
        Thread.sleep(60000)
        sock.close()
      } catch { case _: Throwable => () }
    })
    writer.setDaemon(true)
    writer.start()
    val stream = spark.readStream.format("socket")
      .option("host", "localhost")
      .option("port", server.getLocalPort)
      .load()
    val q = TradeStream.start(stream, "value", s"$dir/store",
      s"$dir/ckpt", trigger = Trigger.ProcessingTime("200 milliseconds"))
    def stored(): Long =
      try TradeStore.read(spark, s"$dir/store").count()
      catch { case _: Throwable => 0L }
    try {
      val deadline = System.currentTimeMillis + 90000
      while (stored() < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(300)
      assert(stored() == 2,
        "exactly the two valid trades must land from the wire")
    } finally {
      q.stop()
      server.close()
    }
    val rows = TradeStore.read(spark, s"$dir/store")
      .selectExpr("currency_from", "currency_to", "amount_sell_micros",
        "amount_buy_micros", "rate")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(rows == Set(
      ("EUR", "USD", 1000000000L, 1100000000L, 1.1),
      ("EUR", "USD", 1000000000L, 1200000000L, 1.2)),
      s"wire-parsed values must match the in-memory chain: $rows")
  }
}
