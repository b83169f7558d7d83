package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Properties of the deterministic sampling/packing operators (their exact
  * values are oracle-gated; these are the structural invariants). */
class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic and a subset of the corpus") {
    val d = Tables.documents(spark, sf0001)
    val a = Sampling.hashSample(d).collect().map(_.getLong(0)).toSeq
    val b = Sampling.hashSample(d.repartition(7)).collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample changed under repartitioning")
    assert(a.nonEmpty && a.length < 500)
  }

  test("source quota never exceeds the cap and keeps lowest ids") {
    val got = Sampling.sourceQuota(Tables.documents(spark, sf0001), quota = 10)
      .collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 10))
    assert(got.forall(_.getAs[Int]("rank_in_source") <= 10))
  }

  test("sequence packing: offsets stay under budget, layout is gap-free per shard") {
    val budget = 512L
    val got = Sampling.packSequences(Tables.documents(spark, sf0001),
      budgetTokens = budget).collect()
    assert(got.length == 500)
    got.foreach { r =>
      assert(r.getAs[Long]("offset_in_seq") >= 0 &&
        r.getAs[Long]("offset_in_seq") < budget)
    }
    // within a shard, walking docs in id order reproduces the offsets:
    // each doc starts exactly where the previous one ended (mod budget)
    got.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("offset_in_seq") == cum % budget,
          s"gap in shard $shard at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_id") == shard * 1000000L + cum / budget)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }
}
