package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IngestMonitor

/** Per-batch ingest health counters: valid/reject split matches the 400
  * path, the mean rate averages admitted rows only, and an all-invalid
  * batch reports NaN (no-signal), not zero. */
class IngestMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def trade(ts: String, rate: Double): String =
    s"""{"userId":"u1","currencyFrom":"EUR","currencyTo":"USD",
       |"amountSell":1000,"amountBuy":${1000 * rate},
       |"timePlaced":"$ts","originatingCountry":"US"}"""
      .stripMargin.replace("\n", "")

  test("per-batch valid/reject counts and admitted-only mean rate") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-mon").toString
    val seen = scala.collection.mutable.ArrayBuffer[IngestMonitor.BatchStats]()
    val src = MemoryStream[String]

    src.addData(
      trade("12-AUG-24 11:23:45", 2.0),
      trade("12-AUG-24 11:24:45", 4.0),
      "{malformed", trade("BAD-TS", 9.9))
    val q1 = IngestMonitor.start(src.toDF(), "value", ckpt,
      s => seen.synchronized { seen += s }, Trigger.AvailableNow())
    q1.awaitTermination()

    assert(seen.map(s => (s.n_total, s.n_valid, s.n_invalid)).sum2 == (4L, 2L, 2L))
    val mean = seen.filter(_.n_valid > 0).map(_.mean_rate)
    assert(mean.nonEmpty && math.abs(mean.head - 3.0) < 1e-9,
      "mean rate must average the two admitted rows (2.0, 4.0) only")

    // an all-invalid wave: reject spike visible, mean is NaN not 0
    src.addData("not json at all", "{\"userId\":42}")
    val q2 = IngestMonitor.start(src.toDF(), "value", ckpt,
      s => seen.synchronized { seen += s }, Trigger.AvailableNow())
    q2.awaitTermination()

    val spike = seen.last
    assert(spike.n_total == 2 && spike.n_valid == 0 && spike.n_invalid == 2)
    assert(spike.mean_rate.isNaN, "no admitted rows must read as NaN")
  }

  private implicit class Sum2(
      xs: scala.collection.Seq[(Long, Long, Long)]) {
    def sum2: (Long, Long, Long) =
      xs.foldLeft((0L, 0L, 0L)) { case ((a, b, c), (x, y, z)) =>
        (a + x, b + y, c + z)
      }
  }
}
