package graft

import org.apache.spark.sql.functions._

/** Scale evidence for co-located joins (SURVEY §2.5 D2/D3): bucketing both
  * join sides on the key removes the shuffle from the join entirely —
  * at 100 TB this is the difference between re-shuffling the fact table on
  * every join and reading pre-placed buckets. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume bucketed scans directly: the only
      // exchange allowed in the plan is the one for the final groupBy
      val joinSection = plan.substring(0, plan.indexOf("Scan"))
      assert(plan.contains("SortMergeJoin"))
      val exchangesBeforeAgg = "Exchange".r.findAllIn(plan).size
      assert(exchangesBeforeAgg == 1, s"expected only the aggregate exchange:\n$plan")
      assert(joinSection != null) // plan parsed
      // and it computes the same thing as the shuffled join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
