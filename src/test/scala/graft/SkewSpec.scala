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

  test("AQE splits a skewed join partition at runtime (the no-salt path)") {
    // the claim the scale docs make — "AQE skew handling applies" — made
    // observable: a join with one hot key re-plans into skew-split reads.
    // Thresholds are sized for clusters; lower them to demonstrate.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = (1 to 20000).map { i =>
        (if (i % 100 == 0) s"k${i % 7}" else "HOT", i.toLong)
      }.toDF("k", "id")
      // right side key-UNIQUE: skew detection reads the left's shuffle
      // partition sizes, and a 1:N join keeps the output driver-sized
      val right = ("HOT" +: (0 until 7).map(i => s"k$i"))
        .zipWithIndex.map { case (k, i) => (k, i * 1.0) }.toDF("k", "w")
      val joined = left.join(right, "k")
      joined.collect() // execute THIS QueryExecution so its AQE plan finalizes
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew="),
        s"AQE produced no skew-split join:\n${finalPlan.take(800)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def decOf(c: String) =
    col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))
}
