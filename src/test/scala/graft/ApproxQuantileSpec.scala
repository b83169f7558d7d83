package graft

import org.apache.spark.sql.functions._

import graft.functions.ApproxQuantile.approx_median_sketch

/** The custom TypedImperativeAggregate (ClickHouse-median analogue). */
class ApproxQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("exact when input fits the sketch (n <= k)") {
    val df = Seq(1.0, 2.0, 4.0, 100.0).toDF("x")
    val got = df.agg(approx_median_sketch(col("x")).as("m"),
      median(col("x")).as("exact")).collect().head
    assert(got.getDouble(0) == got.getDouble(1)) // interpolated midpoint 3.0
    assert(got.getDouble(0) == 3.0)
  }

  test("deterministic across partitioning (unlike a reservoir)") {
    val xs = (1 to 20000).map(i => math.sin(i.toDouble) * 1000 + i * 0.01)
    val one = xs.toDF("x").repartition(1)
      .agg(approx_median_sketch(col("x"), k = 512)).collect().head.getDouble(0)
    val many = xs.toDF("x").repartition(32)
      .agg(approx_median_sketch(col("x"), k = 512)).collect().head.getDouble(0)
    val again = xs.reverse.toDF("x").repartition(7)
      .agg(approx_median_sketch(col("x"), k = 512)).collect().head.getDouble(0)
    assert(one == many && many == again) // bit-identical: min-k of a hash
  }

  test("approximation lands near the exact median on large input") {
    val xs = (1 to 50000).map(i => (i * 2654435761L % 100003).toDouble)
    val df = xs.toDF("x")
    val got = df.agg(approx_median_sketch(col("x"), k = 1024).as("m"),
      median(col("x")).as("exact")).collect().head
    val rel = math.abs(got.getDouble(0) - got.getDouble(1)) / got.getDouble(1)
    assert(rel < 0.1, s"approx=${got.getDouble(0)} exact=${got.getDouble(1)}")
  }

  test("grouped aggregation and null/empty handling") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None))
      .toDF("g", "x")
    val got = df.groupBy("g").agg(approx_median_sketch(col("x")).as("m"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a") == Some(2.0))
    assert(got("b").isEmpty) // all-null group -> null, not a crash
  }
}
