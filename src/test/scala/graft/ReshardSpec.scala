package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Re-shard movement audit: the rendezvous minimal-movement property
  * (no doc ever moves between two OLD shards), both schemes' measured
  * fractions against theory, and exact agreement with an off-Spark
  * replica of the hash arithmetic. */
class ReshardSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("rendezvous never moves between old shards; fractions and counts match replica") {
    val n = 2000
    // off-Spark replica over the same ids
    var rdvMoved = 0
    var modMoved = 0
    (0 until n).foreach { id =>
      val w = (0 until 20).map(s => h60(s"$id:$s"))
      val oldShard = (0 until 16).maxBy(w)
      val newShard = (0 until 20).maxBy(w)
      if (oldShard != newShard) {
        // THE property: adding candidates can only move a doc TO a new
        // shard — the winner among the old 16 cannot change
        assert(newShard >= 16, s"doc $id moved old->old: $oldShard -> $newShard")
        rdvMoved += 1
      }
      val h = h60(id.toString)
      if (h % 16 != h % 20) modMoved += 1
    }
    // theory: rendezvous ≈ 4/20 = 0.20; mod ≈ 1 − 16/80 = 0.80
    assert(math.abs(rdvMoved.toDouble / n - 0.20) < 0.04)
    assert(math.abs(modMoved.toDouble / n - 0.80) < 0.04)

    // the operator reproduces the replica exactly
    val got = Sampling.reshardPlan(
      spark.range(n.toLong).select(col("id").as("doc_id"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("mod") == (n.toLong, modMoved.toLong))
    assert(got("rendezvous") == (n.toLong, rdvMoved.toLong))
  }

  test("growing by one shard moves ~1/new of the corpus under rendezvous") {
    val got = Sampling.reshardPlan(
      spark.range(3000L).select(col("id").as("doc_id")),
      oldShards = 9, newShards = 10).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // ≈ 100000 micro (1/10), the incremental-growth sweet spot
    assert(math.abs(got("rendezvous") - 100000L) < 25000L)
    // mod reshuffles the large majority (1 − 1/lcm-aligned stay mass)
    assert(got("mod") > 800000L)
  }
}
