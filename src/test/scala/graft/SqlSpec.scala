package graft

/** SQL-text dispatch parity (graft.Sql): the SQL path and the DataFrame
  * path are one plan space — same results, same pushdown. */
class SqlSpec extends SparkSpec {

  test("spark.sql over the registered views equals the DataFrame plan row-for-row") {
    val viaSql = SparkEntry.queries("q1_pricing_sql")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val viaDf = SparkEntry.queries("q1_pricing")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
  }

  test("the SQL path gets the same scan pushdown as the DataFrame path") {
    val p = SparkEntry.queries("q6_forecast_sql")(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    assert(p.contains("LessThan(l_quantity,"))
  }
}
