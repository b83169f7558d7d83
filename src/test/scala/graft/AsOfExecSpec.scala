package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinPhysical

/** The native sort-merge as-of operator (logical node + strategy +
  * physical merge) must agree with the declarative union-window
  * formulation row-for-row, plan through the custom exec (no Window),
  * and honor inclusive-<= tie semantics. */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: inclusive at-or-before, per-key state, unmatched nulls") {
    val left = Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 25L, 3L),
      ("b", 5L, 4L),  // no b quote at or before 5
      ("b", 30L, 5L))
      .toDF("k", "ts", "row_id")
    val right = Seq(
      ("a", 10L, 100L), ("a", 21L, 101L), // ts=10 matches left ts=10 (<=)
      ("b", 6L, 200L), ("b", 30L, 201L))  // ts=30 matches left ts=30
      .toDF("k", "ts", "q")
    val got = AsOfJoinPhysical.asOf(left, right, "k", "ts", "ts", "q", "m")
      .orderBy("row_id").collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq(1L -> 100L, 2L -> 100L, 3L -> 101L,
      4L -> -1L, 5L -> 201L))
  }

  test("native exec equals the declarative window form on sf0.001 events") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val leftSide = ev.select(col("event_id"), col("user_id"), col("ts"))
    val native = AsOfJoinPhysical.asOf(leftSide, purchases, "user_id",
      "ts", "ts", "purchase_id", "last_purchase_id")
      .select(col("event_id"), col("last_purchase_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val declarative = AsOfJoin.asOf(leftSide, purchases, "user_id",
      "ts", "ts", "purchase_id", "last_purchase_id")
      .select(col("event_id"), col("last_purchase_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native.nonEmpty && native == declarative)
  }

  test("plans through AsOfJoinExec with no Window operator") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val df = AsOfJoinPhysical.asOf(
      ev.select(col("event_id"), col("user_id"), col("ts")), purchases,
      "user_id", "ts", "ts", "purchase_id", "m")
    val p = df.queryExecution.executedPlan.toString
    // physical nodes print with the Exec suffix stripped
    assert(p.contains("AsOfJoin "), s"native exec not planned:\n$p")
    assert(!p.contains("Window"), s"window formulation leaked in:\n$p")
  }

  test("bucketed sweep/carry as-of equals the window form on sf0.001 events") {
    import graft.operators.AsOfJoin
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val leftSide = ev.select(col("event_id"), col("user_id"), col("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("last_purchase_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1).toSeq
    val window = canon(AsOfJoin.asOf(leftSide, purchases, "user_id",
      "ts", "ts", "purchase_id", "last_purchase_id"))
    // a small bucket forces real carry chains across many empty buckets
    for (bucketSec <- Seq(600L, 21600L, 7 * 86400L)) {
      val bucketed = canon(AsOfJoin.asOfBucketed(leftSide, purchases,
        "user_id", "ts", "ts", "purchase_id", "last_purchase_id",
        bucketSec))
      assert(bucketed == window, s"bucketSec=$bucketSec diverged")
    }
  }

  test("bucketed FORWARD as-of equals the reversed-window form across bucket widths") {
    import graft.operators.AsOfJoin
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val leftSide = ev.select(col("event_id"), col("user_id"), col("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("next_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).sortBy(_._1).toSeq
    val window = canon(AsOfJoin.asOfForward(leftSide, purchases, "user_id",
      "ts", "ts", "purchase_id", "next_id"))
    for (bucketSec <- Seq(600L, 21600L, 7 * 86400L)) {
      val bucketed = canon(AsOfJoin.asOfForwardBucketed(leftSide,
        purchases, "user_id", "ts", "ts", "purchase_id", "next_id",
        bucketSec))
      assert(bucketed == window, s"forward bucketSec=$bucketSec diverged")
    }
  }

  test("bucketed as-of: no window partitioned by the bare key over raw rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = SparkEntry.queries("asof_bucketed")(spark, sf0001)
      .queryExecution.optimizedPlan
    val bad = plan.collect {
      // every window must carry the bucket in its partition spec or ride
      // an aggregate-bounded input (the spine/carry relation)
      case w: LWindow
        if !w.partitionSpec.exists(_.toString.contains("__b")) &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"key-wide window in the bucketed plan: $bad")
  }

  test("mismatched key dtypes fail fast at construction, not mid-merge") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "ts", "row_id")
    val right = Seq(("1", 10L, 100L)).toDF("k", "ts", "q")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPhysical.asOf(left, right, "k", "ts", "ts", "q", "m")
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("result is invariant under repartitioned inputs") {
    val ev = Tables.events(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame) = {
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      AsOfJoinPhysical.asOf(
        e.select(col("event_id"), col("user_id"), col("ts")), purchases,
        "user_id", "ts", "ts", "purchase_id", "m")
        .orderBy("event_id").collect().toSeq
    }
    assert(run(ev) == run(ev.repartition(13)))
  }
}
