package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Fuzzy chunk-level dedup: near-dup paragraphs the digest-exact
  * chunk_dedup cannot see — cross-doc only, threshold respected, the
  * df-cut guard live, exact-collapse feeding the banding, and no
  * cartesian in the plan. */
class ChunkFuzzySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val reps = Dedup.chunkReps(docs)
  private lazy val pairsRaw = Dedup.chunkMinhashPairsRaw(reps)

  test("pairs are cross-document, above threshold, with real signal") {
    val rows = Dedup.chunkMinhashDecode(pairsRaw).collect()
    assert(rows.nonEmpty, "testdata's edited near-dups must yield pairs")
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(2),
        "same-doc stride overlap must never pair")
      assert(r.getDouble(4) >= 0.6 - 1e-9)
    }
  }

  test("exact-duplicate chunk contents collapse before banding") {
    // representatives are one per distinct content, keyed by min cid
    val n = reps.count()
    assert(n == reps.select(md5(col("text"))).distinct().count())
    // and every rep cid decodes into a real (doc, idx) coordinate
    val base = 100000L
    val docIds = docs.select("doc_id").as[Long].collect().toSet
    reps.select("doc_id").as[Long].collect()
      .foreach(cid => assert(docIds.contains(cid / base)))
  }

  test("df-cut guard is live: maxDf = 0 cuts every shingle and every pair") {
    assert(Dedup.chunkMinhashPairsRaw(reps, maxDf = 0L).count() == 0L)
    assert(pairsRaw.count() > 0L)
  }

  test("audit rollup is consistent with the pair relation") {
    val audit = Dedup.chunkFuzzyAuditFrom(reps, pairsRaw).collect()
    val victims = pairsRaw.select(col("id_b")).distinct().count()
    assert(audit.map(_.getLong(2)).sum == victims,
      "n_fuzzy_dup must total the distinct victim chunks")
    assert(audit.map(_.getLong(1)).sum == reps.count(),
      "n_rep_chunks must total the representative census")
    audit.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("no cartesian product anywhere in the chunk-fuzzy plans") {
    for (q <- Seq("chunk_minhash_pairs", "chunk_fuzzy_audit")) {
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
  }
}
