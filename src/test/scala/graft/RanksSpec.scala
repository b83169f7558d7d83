package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** [[Ranks.withNtileBucket]] must assign EXACTLY the bucket
  * `ntile(k).over(Window.orderBy(...))` assigns, for any N/k shape —
  * the closed form is only allowed to change the plan, never a value. */
class RanksSpec extends SparkSpec {

  private def check(n: Int, k: Int, value: Int => Long,
      cells: Int = 4096): Unit = {
    import spark.implicits._
    val df = (1 to n).map(i => (i.toLong, value(i))).toDF("id", "v")
    val expected = df.withColumn("b",
      ntile(k).over(Window.orderBy(col("v"), col("id"))))
    val got = Ranks.withNtileBucket(df, k, col("v"), Seq(col("id")), "b",
      cells)
    val mismatches = expected.alias("e")
      .join(got.alias("g"), Seq("id", "v"))
      .filter(col("e.b") =!= col("g.b"))
      .count()
    assert(mismatches == 0, s"n=$n k=$k: $mismatches bucket mismatches")
    assert(got.count() == n)
  }

  test("unique values, n not divisible by k (front-loaded remainder)") {
    check(37, 10, i => i * 7L)
  }

  test("n < k: every row its own bucket, no division by zero") {
    check(5, 10, i => i.toLong)
  }

  test("heavy ties resolved by the tiebreak column") {
    check(40, 4, i => (i % 3).toLong)
  }

  test("all values equal: one cell, tiebreak drives the whole order") {
    check(24, 5, _ => 42L)
  }

  test("negative and mixed-sign values") {
    check(31, 4, i => i.toLong - 16L)
  }

  test("k = 1 puts everything in bucket 1") {
    check(12, 1, i => i.toLong)
  }

  test("value range far wider than the cell count") {
    check(50, 7, i => i * 1000000007L, cells = 8)
  }

  test("more cells than rows degenerates gracefully") {
    check(9, 3, i => i.toLong, cells = 4096)
  }

  test("tie-skew path: small-domain primary over many rows still matches ntile") {
    // range 9 < cells → width-1 value cells subdivide by the tiebreak
    // image; ranks must be identical to the window form
    check(5000, 7, i => (i % 10).toLong)
  }

  test("partitioned buckets equal ntile over a partitioned window") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, s"g${i % 3}", (i * 13 % 7).toLong))
      .toDF("id", "g", "v")
    val expected = df.withColumn("b",
      ntile(4).over(Window.partitionBy(col("g"))
        .orderBy(col("v"), col("id"))))
    val got = Ranks.withNtileBucket(df, 4, col("v"), Seq(col("id")), "b",
      partition = Seq("g"))
    val mismatches = expected.alias("e").join(got.alias("g2"), Seq("id"))
      .filter(col("e.b") =!= col("g2.b")).count()
    assert(mismatches == 0)
  }

  test("decimal primary: within-cell order follows the full value, not its long image") {
    import spark.implicits._
    // 100.25 < 100.75 share the truncated long image 100 (one cell);
    // rank must still follow the cents
    val df = Seq((1L, "100.75"), (2L, "100.25"), (3L, "99.10"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("decimal(12,2)").as("v"))
    val got = Ranks.withRankStats(df, Nil, col("v"), Seq(col("id")),
      "r", "n")
      .select(col("id"), col("r")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 2L, 1L -> 3L), s"got $got")
  }

  test("rank/n stats match row_number and group counts") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i.toLong, s"g${i % 2}", (i * 7 % 5).toLong))
      .toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
    val got = Ranks.withRankStats(df, Seq("g"), col("v"),
      Seq(col("id")), "r", "n")
    val mismatches = expected.alias("e")
      .join(got.alias("g2"), Seq("id"))
      .filter(col("e.r") =!= col("g2.r") || col("e.n") =!= col("g2.n"))
      .count()
    assert(mismatches == 0)
  }

  test("multi-axis buckets equal three independent ntile windows") {
    import spark.implicits._
    val df = (1 to 80).map(i =>
      (i.toLong, (i * 13 % 17).toLong, (i % 5).toLong, (i * 7 % 23).toLong))
      .toDF("id", "a", "b", "c")
    def nt(c: String) = ntile(4).over(Window.orderBy(col(c), col("id")))
    val expected = df.withColumn("ba", nt("a")).withColumn("bb", nt("b"))
      .withColumn("bc", nt("c"))
    val got = Ranks.withNtileBuckets(df, Seq(
      (4, col("a"), Seq(col("id")), "ba"),
      (4, col("b"), Seq(col("id")), "bb"),
      (4, col("c"), Seq(col("id")), "bc")))
    val mismatches = expected.alias("e").join(got.alias("g2"), Seq("id"))
      .filter(col("e.ba") =!= col("g2.ba") || col("e.bb") =!= col("g2.bb") ||
        col("e.bc") =!= col("g2.bc")).count()
    assert(mismatches == 0)
    assert(got.count() == 80)
  }

  test("null partition values and null primaries follow Spark window semantics") {
    import spark.implicits._
    // group null is a group; null v sorts FIRST (Spark nulls-first asc)
    val df = Seq(
      (1L, Some("g1"), Some(5L)), (2L, None, Some(3L)),
      (3L, Some("g1"), None), (4L, None, None),
      (5L, Some("g1"), Some(1L)), (6L, None, Some(9L)))
      .toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("b", ntile(2).over(w))
      .withColumn("r", row_number().over(w).cast("long"))
    val got = Ranks.withRankStats(df, Seq("g"), col("v"),
      Seq(col("id")), "r", "n")
      .withColumn("b", Ranks.ntileFromRank("r", "n", 2))
    val bad = expected.alias("e").join(got.alias("x"), Seq("id"))
      .filter(col("e.b") =!= col("x.b") || col("e.r") =!= col("x.r"))
      .count()
    assert(bad == 0)
    assert(got.count() == 6, "null-keyed rows must not be dropped")
  }

  test("a group whose ordering values are ALL NULL must not trip the " +
      "overflow guard") {
    import spark.implicits._
    // regression: NULL group stats make try_subtract(__mx, __mn) NULL
    // with no overflow — the guard must not raise; the rows ride the
    // documented sentinel-cell path (rank by tiebreak, nulls first)
    val df = Seq(
      (1L, "dead", None: Option[Long]), (2L, "dead", None),
      (3L, "live", Some(7L)), (4L, "live", Some(2L)))
      .toDF("id", "g", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
    val got = Ranks.withRankStats(df, Seq("g"), col("v"),
      Seq(col("id")), "r", "n")
    val bad = expected.alias("e").join(got.alias("x"), Seq("id"))
      .filter(col("e.r") =!= col("x.r")).count()
    assert(bad == 0)
    assert(got.count() == 4)
  }

  test("prefix sum equals the running-window form, grouped and global") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      (i.toLong, s"g${i % 4}", (i * 31 % 100).toLong)).toDF("id", "g", "w")
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("pre",
      coalesce(sum(col("w")).over(w), lit(0L)))
    val got = Ranks.withPrefixSum(df, Seq("g"), col("id"), Nil,
      col("w"), "pre")
    val mismatches = expected.alias("e").join(got.alias("g2"), Seq("id"))
      .filter(col("e.pre") =!= col("g2.pre")).count()
    assert(mismatches == 0)
    // global (unpartitioned) form
    val wg = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val eg = df.withColumn("pre", coalesce(sum(col("w")).over(wg), lit(0L)))
    val gg = Ranks.withPrefixSum(df, Nil, col("id"), Nil, col("w"), "pre")
    assert(eg.alias("e").join(gg.alias("g2"), Seq("id"))
      .filter(col("e.pre") =!= col("g2.pre")).count() == 0)
  }

  test("bucket column is INT, matching ntile's type") {
    import spark.implicits._
    val df = (1 to 4).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val got = Ranks.withNtileBucket(df, 2, col("v"), Seq(col("id")), "b")
    assert(got.schema("b").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("group count past maxGroups fails loudly, pointing at keyed windows") {
    import spark.implicits._
    // 100 groups of one row each — a per-key ranking, exactly what the
    // closed form is NOT for (its stats side would shuffle+broadcast a
    // data-sized relation); the guard must name the alternative
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("g", "v")
    val ex = intercept[Exception] {
      Ranks.withNtileBucket(df, 2, col("v"), Nil, "b",
        partition = Seq("g"), maxGroups = 10L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("broadcastable bound"), msgs(ex).take(500))
    assert(msgs(ex).contains("keyed"), msgs(ex).take(500))
  }

  test("primary long image spanning more than 2^63 fails loudly") {
    import spark.implicits._
    val df = Seq((1L, Long.MinValue), (2L, Long.MaxValue)).toDF("id", "v")
    val ex = intercept[Exception] {
      Ranks.withNtileBucket(df, 2, col("v"), Seq(col("id")), "b").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("spans"), msgs(ex).take(500))
  }

  test("non-integral tiebreak skips the subdivision but ranks stay exact") {
    import spark.implicits._
    // width-1 trigger (constant primary) with a STRING tiebreak whose
    // long image is NOT monotone in its sort order ('10' sorts before
    // '9' lexicographically but images larger) — the subdivision must
    // decline (sub = 1) or it would bin numerically and mis-rank
    val df = (1 to 120).map(i => (i.toString, 1L)).toDF("s", "v")
    val w = Window.orderBy(col("v"), col("s"))
    val expected = df.withColumn("b", ntile(7).over(w))
    val got = Ranks.withNtileBucket(df, 7, col("v"), Seq(col("s")), "b")
    assert(expected.alias("e").join(got.alias("g"), Seq("s"))
      .filter(col("e.b") =!= col("g.b")).count() == 0)
  }

  test("no unpartitioned window over a data-sized input in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val plan = Ranks.withNtileBucket(df, 10, col("v"), Seq(col("id")), "b")
      .queryExecution.optimizedPlan
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty,
      "unpartitioned Window whose input is not aggregate-bounded: " + bad)
  }
}
