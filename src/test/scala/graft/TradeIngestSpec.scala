package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.TradeIngest

/** SURVEY §5.1 unit coverage: T2 timestamp parse, T3 truncation, T5 rate,
  * T1 validation, at-least-once duplicate preservation (ST2). Golden row
  * from FIXTURES.md §1 (/root/reference/README.md:23-32). */
class TradeIngestSpec extends SparkSpec {
  import spark.implicits._

  private val golden =
    """{"userId":"134256","currencyFrom":"EUR","currencyTo":"USD",
      |"amountSell":1000,"amountBuy":1093.47,"rate":0.731,
      |"timePlaced":"12-AUG-24 11:23:45","originatingCountry":"US"}"""
      .stripMargin.replace("\n", "")

  private def parse(rows: String*) =
    TradeIngest.parseTrades(rows.toDF("json"))

  test("golden trade normalizes exactly (FIXTURES.md §1)") {
    val r = parse(golden).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("user_id") == "134256")
    assert(row.getAs[String]("currency_from") == "EUR")
    assert(row.getAs[String]("currency_to") == "USD")
    assert(row.getAs[Long]("amount_sell_micros") == 1000000000L)
    assert(row.getAs[Long]("amount_buy_micros") == 1093470000L)
    assert(row.getAs[Double]("rate") == 1093470000.0 / 1000000000.0)
    assert(row.getAs[String]("originating_country") == "US")
    assert(row.getAs[Timestamp]("time_placed") ==
      Timestamp.valueOf("2024-08-12 11:23:45"))
  }

  test("input rate field is ignored and recomputed (api.go:66-74)") {
    // golden carries rate=0.731; stored rate must be buy/sell micros
    val row = parse(golden).collect().head
    assert(row.getAs[Double]("rate") == 1.09347)
  }

  test("month parse is case-insensitive like Go time.Parse (api.go:61)") {
    val variants = Seq("12-aug-24 11:23:45", "12-AUG-24 11:23:45",
      "12-Aug-24 11:23:45", "12-aUg-24 11:23:45")
    val rows = variants.map(ts => golden.replace("12-AUG-24 11:23:45", ts))
    val got = parse(rows: _*).select("time_placed").as[Timestamp].collect()
    assert(got.length == 4)
    assert(got.forall(_ == Timestamp.valueOf("2024-08-12 11:23:45")))
  }

  test("Go two-digit-year rule: 69-99 -> 19xx, 00-68 -> 20xx") {
    val rows = Seq("01-Jan-69 00:00:00", "31-Dec-68 23:59:59")
      .map(ts => golden.replace("12-AUG-24 11:23:45", ts))
    val got = parse(rows: _*).select("time_placed").as[Timestamp].collect().toSet
    assert(got == Set(Timestamp.valueOf("1969-01-01 00:00:00"),
      Timestamp.valueOf("2068-12-31 23:59:59")))
  }

  test("unparseable timestamp is rejected (400 path, api.go:61-65)") {
    val bad = Seq("2024-08-12 11:23:45", "12-XXX-24 11:23:45", "garbage", "")
      .map(ts => golden.replace("12-AUG-24 11:23:45", ts))
    assert(parse(bad: _*).count() == 0)
  }

  test("missing required field is rejected; malformed JSON is rejected") {
    val noUser = golden.replace("\"userId\":\"134256\",", "")
    val notJson = "{nope"
    assert(parse(noUser, notJson).count() == 0)
  }

  test("micros conversion truncates toward zero like int64(x*1e6) (api.go:83-85)") {
    val cases = Seq( // (amount, expected int64(amount*1e6) per Go semantics)
      1093.477 -> 1093477000L, 0.0000001 -> 0L, 1e-6 -> 1L,
      123.4567891 -> 123456789L, -5.5 -> -5500000L)
    val rows = cases.map { case (amt, _) =>
      golden.replace("\"amountBuy\":1093.47", s""""amountBuy":$amt""")
    }
    val got = parse(rows: _*)
      .orderBy("amount_buy_micros").as[model.Trade].collect().map(_.amount_buy_micros)
    assert(got.sorted.toSeq == cases.map { case (a, _) => (a * 1e6).toLong }.sorted)
    // and the hand-computed expectations hold (truncation, not rounding)
    assert(cases.forall { case (a, exp) => (a * 1e6).toLong == exp })
  }

  test("amountSell=0 -> rate=Infinity, matching Go float division (service.go:150)") {
    val zeroSell = golden.replace("\"amountSell\":1000", "\"amountSell\":0")
    val row = parse(zeroSell).collect().head
    assert(row.getAs[Double]("rate").isPosInfinity)
  }

  test("duplicate messages both survive — at-least-once, no implicit dedup (ST2)") {
    assert(parse(golden, golden).count() == 2)
  }

  test("invalid calendar date is rejected, not a job failure (ANSI-safe)") {
    val feb31 = golden.replace("12-AUG-24 11:23:45", "31-Feb-24 11:23:45")
    val hour99 = golden.replace("12-AUG-24 11:23:45", "12-Aug-24 99:23:45")
    assert(parse(feb31, hour99).count() == 0)
  }

  test("amount overflowing long micros is rejected, not a job failure") {
    val huge = golden.replace("\"amountSell\":1000", "\"amountSell\":1e300")
    assert(parse(huge).count() == 0)
  }

  test("wire JSON is parsed exactly once per row (no filter-pushdown copies)") {
    // parquet-backed registered query: literal inputs constant-fold away
    val p = SparkEntry.queries("trade_ingest")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.split("TradeWireJson\\.parse").length - 1 == 1,
      "validation substituted extra parse copies into a pushed predicate")
  }

  test("output schema matches the stored DDL mapping (init.sql:3-15)") {
    assert(parse(golden).schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      model.tradeSchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
