package graft

import org.apache.spark.sql.functions._

import graft.operators.EventsOps

/** KMV bottom-k distinct sketch: estimator accuracy, sub-k exactness,
  * partitioning invariance. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within the bottom-k error envelope; exact under k") {
    val e = Tables.events(spark, sf001)
    val est = EventsOps.kmvDistinct(e, k = 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val (kept, v) = est(t)
      if (n < 64) {
        assert(kept == n && v == n.toDouble, s"$t: sub-k groups must be exact")
      } else {
        assert(kept == 64)
        // standard bottom-k relative error ~1/√k = 12.5%; allow 3σ
        assert(math.abs(v / n - 1.0) < 0.375,
          s"$t: est $v vs exact $n out of envelope")
      }
    }
  }

  test("sketch is partitioning-invariant (same hashes, ranks, estimate)") {
    val e = Tables.events(spark, sf0001)
    val a = EventsOps.kmvDistinct(e, k = 32).collect().toSeq
    val b = EventsOps.kmvDistinct(e.repartition(17, col("user_id")), k = 32)
      .collect().toSeq
    assert(a == b)
  }
}
