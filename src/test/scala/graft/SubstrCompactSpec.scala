package graft

import org.apache.spark.sql.functions._

import graft.store.SubstrStore
import graft.streaming.StreamSubstrCheck

/** Census compaction (`SubstrStore.compactWindowCensus`): probe results
  * are invariant under compaction, duplicate appends actually shrink,
  * and the swap's crash window recovers without data loss — the
  * maintenance contract the append-only store documents. */
class SubstrCompactSpec extends SparkSpec {
  import spark.implicits._

  private val L = 4

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def probeSet(batch: org.apache.spark.sql.DataFrame,
      path: String): Set[(Long, Long, Long, Long)] =
    StreamSubstrCheck.probe(spark, batch, path, minLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("probe results identical before/after compaction; census shrinks") {
    val docs = Tables.documents(spark, sf001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))

    val path = tmp("graft_compact_census")
    SubstrStore.writeWindowCensus(corp, path, minLen = L)
    // admission appends re-add windows the census already holds (plus a
    // straight double-append) — the duplicate accumulation compaction
    // exists to reclaim
    SubstrStore.appendWindowCensus(corp.limit(200), path, minLen = L)
    SubstrStore.appendWindowCensus(corp.limit(200), path, minLen = L)

    val before = probeSet(batch, path)
    assert(before.nonEmpty) // the check has teeth only on real flags
    val nBefore = SubstrStore.readWindowCensus(spark, path).count()
    val nDistinct = SubstrStore.readWindowCensus(spark, path)
      .select(col("h")).distinct().count()
    assert(nBefore > nDistinct, "appends must have created duplicates")

    val out = tmp("graft_compact_out")
    // overwrite mode created the dir; the swap's rename needs it absent
    java.nio.file.Files.delete(java.nio.file.Paths.get(out))
    SubstrStore.compactWindowCensus(spark, path, out)
    SubstrStore.swapCompacted(path, out)

    assert(SubstrStore.readWindowCensus(spark, path).count() == nDistinct)
    assert(probeSet(batch, path) == before,
      "compaction must not change any probe outcome")
    // per-bucket integrity: every h still lands in its own hb partition
    assert(SubstrStore.readWindowCensus(spark, path)
      .filter(pmod(col("h"), lit(SubstrStore.Buckets)).cast("int")
        =!= col("hb")).count() == 0)
  }

  test("compaction is idempotent and a crash between the swap renames recovers") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))

    val path = tmp("graft_crash_census")
    SubstrStore.writeWindowCensus(corp, path, minLen = L)
    SubstrStore.appendWindowCensus(corp.limit(50), path, minLen = L)
    val before = probeSet(batch, path)

    // crash BEFORE the swap: the half-written compacted output is
    // irrelevant — re-running overwrites it (pure function of source)
    val out = tmp("graft_crash_out")
    SubstrStore.compactWindowCensus(spark, path, out)
    val n1 = spark.read.parquet(out).count()
    SubstrStore.compactWindowCensus(spark, path, out) // replay
    assert(spark.read.parquet(out).count() == n1)
    assert(probeSet(batch, path) == before, "live census untouched")

    // crash BETWEEN the renames: live name gone, retired holds the old
    // census in full — recoverSwap restores it, probes resume
    val live = java.nio.file.Paths.get(path)
    val retired = java.nio.file.Paths.get(path + ".retired")
    java.nio.file.Files.move(live, retired) // = swap step 1, then crash
    SubstrStore.recoverSwap(path)
    assert(java.nio.file.Files.exists(live) &&
      !java.nio.file.Files.exists(retired))
    assert(probeSet(batch, path) == before)

    // recoverSwap is a no-op when the live census exists
    SubstrStore.recoverSwap(path)
    assert(probeSet(batch, path) == before)

    // the interrupted compaction output is still valid to swap in
    // (recompute into the same path — mode overwrite)
    SubstrStore.compactWindowCensus(spark, path, out)
    SubstrStore.swapCompacted(path, out)
    assert(probeSet(batch, path) == before)
  }
}
