package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.store.ChunkStore
import graft.streaming.StreamChunkFuzzyCheck

/** Streaming fuzzy-chunk ingest check: store-backed probe ≡ the batch
  * operator bit-for-bit, the admission loop flags batch-N content in
  * batch N+1, and index compaction is probe-invariant with duplicate
  * (redelivered) appends absorbed. */
class StreamChunkFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

  test("store-backed probe equals the recompute-everything batch operator") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))

    val path = tmp("graft_chunkstore")
    ChunkStore.writeBandIndex(corp, path)
    val fromStore = rows(StreamChunkFuzzyCheck.probe(spark, batch, path))
    val direct = rows(Dedup.chunkDedupAgainst(batch, corp))
    assert(fromStore == direct, "persisted state must replay the batch op")
    assert(fromStore.nonEmpty, "testdata near-dups must trip the check")
  }

  test("streamed per-batch probe ≡ batch; admitted chunks flag later batches") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(col("doc_id") >= 100)
    val path = tmp("graft_chunkstore_admit")
    ChunkStore.writeBandIndex(corp, path)

    // a doc whose chunks are novel vs the corpus split; batch 1 re-sends
    // the identical text under a new id — only the admission append can
    // flag it (the write-time index never saw it)
    val d7 = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Long, Double)]]
    val q = StreamChunkFuzzyCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = rows(df))
    try {
      src.addData(d7); q.processAllAvailable()
      src.addData((7007L, d7._2)); q.processAllAvailable()
    } finally q.stop()

    assert(got(1L).exists { case (nd, _, cd, _, j) =>
      nd == 7007L && cd == 7L && j == 1.0 },
      "batch 0's admitted chunks must flag the identical re-send at 1.0")
  }

  test("crash replay: a batch re-probed after its own append decides identically") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
    val path = tmp("graft_chunkstore_replay")
    ChunkStore.writeBandIndex(corp, path)
    val original = rows(StreamChunkFuzzyCheck.probe(spark, batch, path))
    // the at-least-once crash point: the pre-crash run appended the
    // batch's own chunks to the index, then the stream checkpoint
    // commit was lost — the replay probes an index already holding them
    ChunkStore.appendBandIndex(batch, path)
    val replayed = rows(StreamChunkFuzzyCheck.probe(spark, batch, path))
    assert(replayed == original,
      "a replayed batch must not self-flag against its own admitted chunks")
  }

  test("compaction: redelivered appends absorbed, probe invariant, crash recovers") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))

    val path = tmp("graft_chunkstore_compact")
    ChunkStore.writeBandIndex(corp, path)
    val before = rows(StreamChunkFuzzyCheck.probe(spark, batch, path))
    val nSigs = ChunkStore.readSigs(spark, path).count()
    val nPosts = ChunkStore.readPosts(spark, path).count()

    // redelivery: an already-indexed slice re-appends byte-identically
    // (twice) — rows duplicate, but the probe's set-semantic verify is
    // invariant (the SubstrStore probe-harmless contract); only
    // storage grows until compaction
    val extra = corp.filter(col("doc_id") < 50)
    ChunkStore.appendBandIndex(extra, path)
    ChunkStore.appendBandIndex(extra, path)
    assert(ChunkStore.readSigs(spark, path).count() > nSigs,
      "redelivery must have created duplicate rows")
    assert(rows(StreamChunkFuzzyCheck.probe(spark, batch, path)) == before,
      "the probe must be invariant even over the duplicated index")

    val out = path.stripSuffix("/") + ".compact"
    ChunkStore.compactBandIndex(spark, path, out)
    ChunkStore.swapCompacted(path, out)
    assert(ChunkStore.readSigs(spark, path).count() == nSigs)
    assert(ChunkStore.readPosts(spark, path).count() == nPosts)
    assert(rows(StreamChunkFuzzyCheck.probe(spark, batch, path)) == before,
      "compaction must not change any probe outcome")

    // crash between the swap renames → recover restores the whole index
    val live = java.nio.file.Paths.get(path)
    java.nio.file.Files.move(live,
      java.nio.file.Paths.get(path + ".retired"))
    ChunkStore.recoverSwap(path)
    assert(java.nio.file.Files.exists(live))
    assert(rows(StreamChunkFuzzyCheck.probe(spark, batch, path)) == before)
  }

  test("admission loop with compactEvery=1: index stays distinct, gate unchanged") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(col("doc_id") >= 100)
    val path = tmp("graft_chunkstore_loop")
    ChunkStore.writeBandIndex(corp, path)

    val d7 = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Long, Double)]]
    val q = StreamChunkFuzzyCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = rows(df),
      compactEvery = 1)
    try {
      src.addData(d7); q.processAllAvailable()
      src.addData((7007L, d7._2)); q.processAllAvailable()
    } finally q.stop()

    assert(got(1L).exists { case (nd, _, cd, _, _) =>
      nd == 7007L && cd == 7L })
    val sigs = ChunkStore.readSigs(spark, path)
    assert(sigs.count() == sigs.distinct().count())
  }
}
