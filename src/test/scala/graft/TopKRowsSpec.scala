package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKRows.topk_rows

/** Bounded-heap per-group top-k aggregate: correctness vs a window-sort
  * scalar reference, partitioning invariance (partial/merge path), and the
  * scale property that motivates it — map-side partials carry ≤ k entries. */
class TopKRowsSpec extends SparkSpec {

  private def reference(rows: Seq[(String, Long, Long)], k: Int) =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }
        .take(k).zipWithIndex
        .map { case ((s, i), r) => (g, r + 1L, i, s) }
    }.sortBy(t => (t._1, t._2))

  test("matches the window-sort reference, ties broken by id") {
    import spark.implicits._
    // deliberate score ties across ids, including a tie at the k-boundary
    val rows = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 10L, 3L), ("a", 10L, 4L),
      ("a", 9L, 5L), ("b", 1L, 6L), ("b", 2L, 7L),
      ("c", 5L, 8L))
    val got = rows.toDF("g", "s", "id")
      .groupBy($"g").agg(topk_rows($"s", $"id", 3).as("top"))
      .select($"g", posexplode($"top").as(Seq("idx", "t")))
      .select($"g", ($"idx" + 1).cast("long"), $"t.id", $"t.score")
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    assert(got == reference(rows, 3))
  }

  test("partitioning-invariant: 1 vs 32 partitions agree") {
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      (s"g${i % 7}", (i * 37 % 101).toLong, i.toLong)
    }
    def run(parts: Int) = rows.toDF("g", "s", "id").repartition(parts)
      .groupBy($"g").agg(topk_rows($"s", $"id", 5).as("top"))
      .select($"g", $"top").as[(String, Seq[(Long, Long)])]
      .collect().sortBy(_._1).toSeq
    assert(run(1) == run(32))
    assert(run(32) == rows.groupBy(_._1).toSeq.map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }
        .take(5)
    }.sortBy(_._1))
  }

  test("aggregate plans with a partial (map-side) stage, no window sort") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("g", "s", "id")
      .groupBy($"g").agg(topk_rows($"s", $"id", 3).as("top"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("ObjectHashAggregate") || phys.contains("SortAggregate"),
      s"expected an aggregate exec, got:\n$phys")
    assert(!phys.contains("Window"), "top-k must not plan a window sort")
    // two aggregate stages (partial + final) around one exchange: the
    // shuffle carries ≤ k entries per (group × partition), the property
    // that beats row_number() at 100 TB
    val aggs = "Aggregate".r.findAllIn(phys).length
    assert(aggs >= 2, s"expected partial+final aggregate stages:\n$phys")
  }
}
