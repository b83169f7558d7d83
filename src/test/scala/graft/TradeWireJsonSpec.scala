package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TradeWireJson.parse_trade_wire

/** Conformance of the specialized wire-JSON parser: parity with
  * from_json(wireSchema) on well-formed messages, Go-strict rejection
  * where from_json is laxer, and full escape/skip grammar coverage. */
class TradeWireJsonSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: String*): Seq[(Row, Row)] = {
    val df = rows.toDF("json").select(
      parse_trade_wire(col("json")).as("fast"),
      from_json(col("json"), model.wireSchema).as("ref"))
    df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getStruct(0),
        if (r.isNullAt(1)) null else r.getStruct(1))).toSeq
  }

  test("parity with from_json on well-formed wire messages") {
    val msgs = Seq(
      """{"userId":"134256","currencyFrom":"EUR","currencyTo":"USD","amountSell":1000,"amountBuy":1093.47,"rate":0.731,"timePlaced":"12-AUG-24 11:23:45","originatingCountry":"US"}""",
      // escapes, unicode, whitespace, scientific notation, negatives
      """ { "userId" : "a\"b\\c\/d\n\té" , "amountSell" : -1.5e3 ,
        | "amountBuy" : 0.0001 , "rate" : 2E-2 ,
        | "currencyFrom":"EUR","currencyTo":"USD",
        | "timePlaced":"01-jan-69 00:00:00","originatingCountry":"US" } """
        .stripMargin,
      // missing fields + explicit nulls
      """{"userId":null,"amountSell":5}""",
      // duplicate key: last one wins
      """{"userId":"first","userId":"second","amountSell":1,"amountBuy":2,"currencyFrom":"E","currencyTo":"U","timePlaced":"x","originatingCountry":"US"}""",
      // unknown fields of every shape are skipped
      """{"extraNum":1,"extraStr":"s","extraNull":null,"extraBool":true,
        |"extraArr":[1,{"a":[2,3]},"x"],"extraObj":{"k":{"n":[null,false]}},
        |"userId":"u","amountSell":1,"amountBuy":2,"rate":3,
        |"currencyFrom":"E","currencyTo":"U","timePlaced":"t","originatingCountry":"US"}"""
        .stripMargin.replace("\n", ""),
      """{}""")
    both(msgs: _*).zip(msgs).foreach { case ((fast, ref), m) =>
      assert(fast == ref, s"parity broken for: $m")
    }
  }

  test("malformed JSON rejects in both parsers") {
    Seq("{nope", "", "   ", "[1,2]", "42",
      """{"userId":"u",}""", """{"userId":"bad\escape"}""",
      """{"amountSell":1e}""", """{"amountSell":--5}""",
      """{"userId":"unterminated}""").foreach { m =>
      val (fast, ref) = both(m).head
      // from_json represents malformed as an all-null struct or null;
      // ours is null — both reject every required field
      assert(fast == null, s"fast parser accepted: $m")
      assert(ref == null || ref.toSeq.forall(_ == null), s"ref accepted: $m")
    }
  }

  test("Go-strict: signed \\u escapes and leading-zero numbers reject") {
    // Integer.parseInt(hex, 16) would accept a signed escape payload;
    // Go/Jackson require exactly 4 hex digits. encoding/json also rejects
    // leading zeros. (bs+"u..." keeps the Scala lexer away from \u.)
    val bs = "\\"
    Seq(s"""{"userId":"${bs}u-0af"}""", s"""{"userId":"${bs}u00g1"}""",
      s"""{"userId":"${bs}u+123"}""", """{"amountSell":01}""",
      """{"amountSell":-01.5}""", """{"amountSell":00}""").foreach { m =>
      val (fast, _) = both(m).head
      assert(fast == null, s"accepted non-Go-strict input: $m")
    }
    // the strict hex path still decodes well-formed escapes (mixed case)
    Seq(s"""{"userId":"${bs}u00e9"}""" -> "é",
      s"""{"userId":"${bs}u00E9"}""" -> "é").foreach { case (m, want) =>
      val (fast, _) = both(m).head
      assert(fast != null && fast.getString(0) == want, s"rejected valid: $m")
    }
    val (zero, _) = both("""{"amountSell":0.5}""").head
    assert(zero != null && zero.getDouble(3) == 0.5)
  }

  test("Go-strict: wrong types and trailing content reject (from_json is laxer)") {
    // encoding/json errors when binding a number into a string field, a
    // string into a float64, or on trailing content after the value — the
    // reference would 400 these messages; from_json stringifies/ignores
    Seq("""{"userId":42}""", """{"amountSell":"1000"}""",
      """{"amountSell":true}""", """{"userId":["x"]}""",
      """{"userId":"u"} trailing""").foreach { m =>
      val (fast, _) = both(m).head
      assert(fast == null, s"accepted wrong-typed field: $m")
    }
  }

  test("parser runs as a static call inside whole-stage codegen") {
    // parquet-backed input so nothing constant-folds away
    val df = Tables.table(spark, sf0001, "documents")
      .select(parse_trade_wire(col("text")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("static_invoke") || plan.contains("parse"),
      "parser not visible in the plan")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      "no whole-stage codegen stage around the parser")
  }
}
