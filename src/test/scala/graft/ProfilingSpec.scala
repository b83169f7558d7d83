package graft

import graft.operators.Profiling

/** Schema-generic profiler: exact null/distinct counts from one scan. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, distincts, and rows per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (None, Some("b")),
      (Some(3), Some("a"))).toDF("x", "s")
    val r = Profiling.profile(df).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3))).toMap
    assert(r("x") == (1L, 2L, 4L)) // one null, distinct {1,3}
    assert(r("s") == (1L, 2L, 4L)) // one null, distinct {a,b}
  }

  test("profile is schema-generic and single-scan over any table") {
    val docs = Tables.documents(spark, sf0001)
    val r = Profiling.profile(docs).collect()
    assert(r.map(_.getString(0)).sorted.toSeq ==
      docs.schema.fieldNames.sorted.toSeq)
    // exactly one parquet scan in the physical plan — the whole point
    val plan = Profiling.profile(docs).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"profiler must read the table once:\n$plan")
  }
}
