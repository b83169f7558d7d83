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

  test("bucket column is INT, matching ntile's type") {
    import spark.implicits._
    val df = (1 to 4).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val got = Ranks.withNtileBucket(df, 2, col("v"), Seq(col("id")), "b")
    assert(got.schema("b").dataType ==
      org.apache.spark.sql.types.IntegerType)
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
