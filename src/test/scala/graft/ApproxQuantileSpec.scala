package graft

import org.apache.spark.sql.functions._

import graft.functions.ApproxQuantile.{approx_median_sketch, keyed_median_sketch}

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

  // ── keyed variant (oracle-reproducible selection hash) ──

  test("keyed sketch equals a scalar bottom-k-by-h60 reference") {
    import graft.functions.PortableHash.{h60, h60String}
    // overflow the sketch (n > k) so the selection path is exercised
    val vms = (1 to 5000).map(i => (i * 2654435761L % 100003L))
    val got = vms.toDF("vm")
      .withColumn("h", h60(col("vm").cast("string")))
      .agg(keyed_median_sketch(col("h"), col("vm").cast("double"), k = 256))
      .collect().head.getDouble(0)
    // driver-side twin of the oracle SQL: rank by h60, keep rn <= k,
    // linear-interpolate pos = 0.5*(nk-1) over the kept sample
    val kept = vms.sortBy(v => h60String(v.toString)).take(256)
      .map(_.toDouble).sorted
    val pos = 0.5 * (kept.length - 1)
    val lo = pos.toInt; val hi = math.min(lo + 1, kept.length - 1)
    val want = kept(lo) + (pos - lo) * (kept(hi) - kept(lo))
    assert(got == want) // bit-identical, not approximately
  }

  test("keyed sketch deterministic across partitioning") {
    import graft.functions.PortableHash.h60
    def run(parts: Int, xs: Seq[Long]): Double =
      xs.toDF("vm").repartition(parts)
        .withColumn("h", h60(col("vm").cast("string")))
        .agg(keyed_median_sketch(col("h"), col("vm").cast("double"), k = 128))
        .collect().head.getDouble(0)
    val xs = (1 to 3000).map(i => (i * 40503L % 65521L))
    assert(run(1, xs) == run(32, xs) && run(32, xs) == run(7, xs.reverse))
  }
}
