package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.Trade
import graft.operators.Trends

/** SURVEY §5.1 coverage of the flagship query: window flooring (A1), bounds
  * inclusivity (T7/T8), exact median (A3), ordering (A5), absent empty
  * windows. */
class TrendsSpec extends SparkSpec {
  import spark.implicits._

  private def trade(ts: String, rate: Double, cf: String = "EUR",
      ct: String = "USD"): Trade =
    Trade("u", cf, ct, 1000000L, (rate * 1000000L).toLong, rate, "US",
      Timestamp.valueOf(ts))

  private val from = Timestamp.valueOf("2024-08-12 00:00:00")
  private val to = Timestamp.valueOf("2024-08-12 23:59:59")

  test("row exactly on a 10-min edge goes to the starting window (A1)") {
    val df = Seq(
      trade("2024-08-12 11:20:00.000", 2.0), // exactly on edge -> 11:20 window
      trade("2024-08-12 11:19:59.999", 1.0), // just before    -> 11:10 window
      trade("2024-08-12 11:29:59.999", 4.0)  // end of window  -> 11:20 window
    ).toDF()
    val got = Trends.trends(df, from, to, "EUR", "USD").collect()
    assert(got.map(_.window).toSeq == Seq(
      Timestamp.valueOf("2024-08-12 11:10:00"),
      Timestamp.valueOf("2024-08-12 11:20:00")))
    assert(got(1).min == 2.0 && got(1).max == 4.0)
  }

  test("both time bounds are inclusive (service.go:56-57)") {
    val df = Seq(
      trade("2024-08-12 00:00:00", 1.0), // == dateFrom, included
      trade("2024-08-12 23:59:59", 2.0), // == dateTo, included
      trade("2024-08-11 23:59:59.999", 9.0), // before, excluded
      trade("2024-08-13 00:00:00", 9.0)      // after, excluded
    ).toDF()
    val got = Trends.trends(df, from, to, "EUR", "USD").collect()
    assert(got.length == 2 && got.forall(s => s.min != 9.0 && s.max != 9.0))
  }

  test("currency-pair equality filter is exact (T7)") {
    val df = Seq(trade("2024-08-12 10:00:00", 1.0),
      trade("2024-08-12 10:00:00", 9.0, cf = "GBP"),
      trade("2024-08-12 10:00:00", 9.0, ct = "JPY")).toDF()
    val got = Trends.trends(df, from, to, "EUR", "USD").collect()
    assert(got.length == 1 && got.head.max == 1.0)
  }

  test("median is exact: odd/even counts, single row (A3)") {
    val df = Seq(1.0, 2.0, 10.0).zipWithIndex.map { case (r, i) =>
      trade(s"2024-08-12 10:0$i:00", r)
    }.toDF()
    val odd = Trends.trends(df, from, to, "EUR", "USD").collect().head
    assert(odd.median == 2.0 && odd.mean == 13.0 / 3)

    val df2 = Seq(1.0, 2.0, 4.0, 100.0).zipWithIndex.map { case (r, i) =>
      trade(s"2024-08-12 10:0$i:00", r)
    }.toDF()
    val even = Trends.trends(df2, from, to, "EUR", "USD").collect().head
    assert(even.median == 3.0) // interpolated midpoint, exact not approx

    val single = Trends.trends(Seq(trade("2024-08-12 10:00:00", 7.0)).toDF(),
      from, to, "EUR", "USD").collect().head
    assert(single.min == 7.0 && single.median == 7.0 && single.mean == 7.0)
  }

  test("empty windows are absent (no gap-fill) and results are time-ordered (A5)") {
    val df = Seq(trade("2024-08-12 10:05:00", 1.0),
      trade("2024-08-12 12:35:00", 2.0),
      trade("2024-08-12 11:35:00", 3.0)).toDF()
    val got = Trends.trends(df, from, to, "EUR", "USD").collect()
    assert(got.map(_.window.toString).toSeq == Seq(
      "2024-08-12 10:00:00.0", "2024-08-12 11:30:00.0", "2024-08-12 12:30:00.0"))
  }

  test("duplicate rows double-count (at-least-once visibility, ST2)") {
    val df = Seq(trade("2024-08-12 10:00:00", 2.0),
      trade("2024-08-12 10:00:00", 2.0),
      trade("2024-08-12 10:00:00", 8.0)).toDF()
    val got = Trends.trends(df, from, to, "EUR", "USD").collect().head
    assert(got.mean == 4.0 && got.median == 2.0)
  }
}
