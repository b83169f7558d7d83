package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregate equals direct aggregate on skewed data") {
    // 90% of rows share one hot key
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"key${i % 7}" else "HOT"
      (k, i.toLong, i * 0.5)
    }
    val df = rows.toDF("k", "id", "v")
    val direct = df.groupBy("k")
      .agg(sum(decOf("v")).cast("double").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(
      df.withColumn("v", decOf("v")), Seq("k"), "v", Seq("id"), salts = 16)
      .select(col("k"), col("sum_value").cast("double"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salting actually spreads the hot key over multiple partial groups") {
    val rows = (1 to 1000).map(i => ("HOT", i.toLong))
    val df = rows.toDF("k", "id").withColumn("__salt",
      pmod(xxhash64(col("id")), lit(8)))
    val saltCount = df.select("__salt").distinct().count()
    assert(saltCount == 8) // all 8 salt lanes used
  }

  private def decOf(c: String) =
    col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))
}
