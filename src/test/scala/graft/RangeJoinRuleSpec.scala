package graft

import org.apache.spark.sql.SparkSession

import graft.operators.RangeJoin
import graft.plans.BinnedRangeJoinRule

/** The BinnedRangeJoinRule optimizer rewrite: the naive inequality join
  * plans as a nested loop without it, as a bin-bucketed equi-join with it,
  * and the rewritten plan returns bit-identical results. */
class RangeJoinRuleSpec extends SparkSpec {

  private def events = Tables.events(spark, sf0001)

  private def withRule[A](s: SparkSession)(body: => A): A = {
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ BinnedRangeJoinRule
    try body
    finally s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filterNot(_ == BinnedRangeJoinRule)
  }

  /** Keyless trailing-window join — the shape Spark can only nested-loop.
    * Negative timestamps included: bin 0 spans (-W, W) under `div`
    * truncation and the two-probe cover must still hold. */
  import org.apache.spark.sql.functions.col

  private def keylessPair = {
    import spark.implicits._
    val l = Seq((1L, -15L), (2L, -1L), (3L, 0L), (4L, 9L), (5L, 23L))
      .toDF("lid", "lts")
    val r = Seq((10L, -24L), (11L, -10L), (12L, -5L), (13L, 0L), (14L, 8L),
      (15L, 15L), (16L, 30L)).toDF("rid", "rts")
    l.join(r, col("rts") > col("lts") - 10L && col("rts") <= col("lts"))
  }

  test("keyless range join nested-loops WITHOUT the rule, equi-joins with it") {
    val naive = keylessPair
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "expected the keyless naive plan to demonstrate the BNLJ problem")
    val baseline = naive.collect().map(_.toString).sorted.toSeq
    withRule(spark) {
      val df = keylessPair
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        "rule did not rewrite the keyless inequality join")
      assert(phys.contains("__bin_graft"), "bin columns missing from the plan")
      assert(df.collect().map(_.toString).sorted.toSeq == baseline,
        "rewritten keyless join changed results (negative-ts bins?)")
    }
  }

  test("keyed attribution join: range becomes a co-key, results identical") {
    // without the rule the equi key carries the join and the range runs
    // as a residual — every per-user (purchase, click) pair materializes
    val naive = RangeJoin.purchaseClickCountsNaive(events)
    val noRule = naive.queryExecution.executedPlan.toString
    assert(noRule.contains("Join [user_id") || noRule.contains("user_id#"),
      "expected a key-only join before the rewrite")
    assert(!noRule.contains("__bin_graft"))
    val baseline = naive.collect().map(_.toString).sorted.toSeq
    withRule(spark) {
      val df = RangeJoin.purchaseClickCountsNaive(events)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"))
      assert(!phys.contains("CartesianProduct"))
      assert(phys.contains("__bin_graft"), "bin columns missing from the plan")
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == baseline, "rewritten join changed the results")
    }
  }

  test("rule is idempotent: already-binned plans (its own and RangeJoin's) untouched") {
    withRule(spark) {
      // the hand-built bin join keeps exactly one explode (2 probe bins);
      // a second rewrite layer would show as nested __bin columns
      val p = RangeJoin.purchaseClickCounts(events)
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__bin_graft"),
        "rule rewrote the already-binned RangeJoin form")
      // and re-optimizing the rewritten naive plan is stable
      val df = RangeJoin.purchaseClickCountsNaive(events)
      val opt = df.queryExecution.optimizedPlan
      assert(BinnedRangeJoinRule(opt).fastEquals(opt),
        "second rule application changed an already-rewritten plan")
    }
  }

  test("SparkSessionExtensions entry point installs the rule in a fresh session") {
    // `spark.sql.extensions` is a STATIC conf — it only applies when the
    // SparkContext is created with it, so on the shared test context the
    // builder's withExtensions hook is the honest way to exercise the
    // GraftExtensions injector.
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        val phys = RangeJoin.purchaseClickCountsNaive(Tables.events(fresh, sf0001))
          .queryExecution.executedPlan.toString
        assert(!phys.contains("BroadcastNestedLoopJoin") &&
          phys.contains("__bin_graft"),
          "extension-built session did not apply the rewrite")
      } finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
