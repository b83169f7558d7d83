package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.store.{EmbeddingStore, MediaStore}
import graft.streaming.{StreamMediaCheck, StreamSemanticCheck}

/** Band-index compaction (`EmbeddingStore.compactBanded` /
  * `MediaStore.compactPhashIndex`): probe results invariant, duplicate
  * (redelivered) appends absorbed, index row counts shrinking, and the
  * swap's crash window recovering — the maintenance contract the
  * append-only stores documented but (pre-r13) did not ship, cloned
  * from the SubstrStore census precedent. */
class BandedCompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // multiset view: duplicate vec rows DUPLICATE flagged pairs in the
  // semantic probe (the vecs join is row-level) — a Set would hide the
  // exact damage compaction exists to absorb
  private def probeRows(batch: org.apache.spark.sql.DataFrame,
      path: String): Map[(Long, Long, Double), Int] =
    StreamSemanticCheck.probe(spark, batch, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(identity).map { case (k, v) => (k, v.size) }

  test("embedding index: duplicate appends duplicate flags; compaction absorbs them") {
    val emb = Tables.embeddings(spark, sf001)
    val corp = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"), col("embedding"))

    val path = tmp("graft_banded_compact")
    EmbeddingStore.writeBanded(corp, path)
    val pristine = probeRows(batch, path)
    assert(pristine.nonEmpty, "the check has teeth only on real flags")
    val nSigs = EmbeddingStore.readBandedSigs(spark, path).count()
    val nVecs = EmbeddingStore.readBandedVecs(spark, path).count()

    // at-least-once redelivery: the same slice re-appends twice
    EmbeddingStore.appendBanded(corp.limit(200), path)
    EmbeddingStore.appendBanded(corp.limit(200), path)
    val dup = probeRows(batch, path)
    assert(EmbeddingStore.readBandedVecs(spark, path).count() > nVecs)
    assert(dup.keySet == pristine.keySet,
      "redelivery must not invent or lose pairs, only duplicate them")
    assert(dup.values.sum > pristine.values.sum,
      "duplicate vec rows must visibly duplicate flagged pairs")

    val out = path.stripSuffix("/") + ".compact"
    EmbeddingStore.compactBanded(spark, path, out)
    EmbeddingStore.swapBanded(path, out)
    assert(EmbeddingStore.readBandedSigs(spark, path).count() == nSigs)
    assert(EmbeddingStore.readBandedVecs(spark, path).count() == nVecs)
    assert(probeRows(batch, path) == pristine,
      "compaction must restore the exactly-once probe, multiset-exact")
  }

  test("embedding index: compaction re-runs idempotently; crash between renames recovers") {
    val emb = Tables.embeddings(spark, sf0001)
    val corp = emb.filter(col("vec_id") >= 50)
    val batch = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))

    val path = tmp("graft_banded_crash")
    EmbeddingStore.writeBanded(corp, path)
    EmbeddingStore.appendBanded(corp.limit(40), path)
    val before = probeRows(batch, path)

    // crash BEFORE the swap: half-written output is irrelevant —
    // re-running overwrites it (pure function of the live index)
    val out = path.stripSuffix("/") + ".compact"
    EmbeddingStore.compactBanded(spark, path, out)
    val n1 = spark.read.parquet(s"$out/sigs").count()
    EmbeddingStore.compactBanded(spark, path, out) // replay
    assert(spark.read.parquet(s"$out/sigs").count() == n1)
    assert(probeRows(batch, path) == before, "live index untouched")

    // crash BETWEEN the renames: live name gone, retired holds the
    // whole old index (both halves — one directory swap covers them)
    val live = java.nio.file.Paths.get(path)
    val retired = java.nio.file.Paths.get(path + ".retired")
    java.nio.file.Files.move(live, retired) // = swap step 1, then crash
    EmbeddingStore.recoverBanded(path)
    assert(java.nio.file.Files.exists(live) &&
      !java.nio.file.Files.exists(retired))
    assert(probeRows(batch, path) == before)

    // recover is a no-op when live exists; the swap then completes
    EmbeddingStore.recoverBanded(path)
    EmbeddingStore.compactBanded(spark, path, out)
    EmbeddingStore.swapBanded(path, out)
    assert(probeRows(batch, path).keySet == before.keySet)
  }

  test("media index: compaction shrinks the index, probe set invariant, crash recovers") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
    def probeSet() = StreamMediaCheck.probe(spark, batch, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    lazy val path = tmp("graft_phash_compact")
    MediaStore.writePhashIndex(corp, path)
    val pristine = probeSet()
    assert(pristine.nonEmpty, "planted near-dups should trip the check")
    val nRows = MediaStore.readPhashIndex(spark, path).count()

    MediaStore.appendPhashIndex(corp.limit(100), path)
    MediaStore.appendPhashIndex(corp.limit(100), path)
    assert(MediaStore.readPhashIndex(spark, path).count() > nRows,
      "appends must have created duplicate index rows")
    // the media probe's trailing DISTINCT keeps its OUTPUT stable even
    // over a duplicated index — the cost is scan growth, which is what
    // compaction reclaims
    assert(probeSet() == pristine)

    val out = path.stripSuffix("/") + ".compact"
    MediaStore.compactPhashIndex(spark, path, out)
    MediaStore.swapCompacted(path, out)
    assert(MediaStore.readPhashIndex(spark, path).count() == nRows)
    assert(probeSet() == pristine,
      "compaction must not change any probe outcome")

    // crash between the renames → recover restores the old index
    val live = java.nio.file.Paths.get(path)
    java.nio.file.Files.move(live, java.nio.file.Paths.get(path + ".retired"))
    MediaStore.recoverSwap(path)
    assert(java.nio.file.Files.exists(live))
    assert(probeSet() == pristine)
  }

  test("semantic admission loop with compactEvery=1: index stays distinct, gates unchanged") {
    val emb = Tables.embeddings(spark, sf0001)
    val corp = emb.filter(col("vec_id") >= 100)
    val path = tmp("graft_sem_compact_loop")
    EmbeddingStore.writeBanded(corp, path)

    val v7 = emb.filter(col("vec_id") === 7L)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = StreamSemanticCheck.startAdmitting(
      src.toDF().toDF("vec_id", "embedding"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      compactEvery = 1) // compact after EVERY admit
    try {
      src.addData(v7); q.processAllAvailable()
      src.addData((7007L, v7._2)); q.processAllAvailable()
    } finally q.stop()

    // the census-append gate still works across the mid-stream swaps:
    // batch 0 admitted vector 7, batch 1's identical re-send flags it
    assert(got(1L).contains((7007L, 7L)))
    // and the admitted index is DISTINCT — vec 7 and 7007 appended
    // once each on top of the corpus, nothing duplicated by the loop
    val vecs = EmbeddingStore.readBandedVecs(spark, path)
    assert(vecs.count() == vecs.select("vec_id").distinct().count())
    assert(vecs.filter(col("vec_id").isin(7L, 7007L)).count() == 2L)
  }

  test("media admission loop with compactEvery=1: index stays distinct, gates unchanged") {
    val docs = Tables.documents(spark, sf0001)
    val corp = docs.filter(col("doc_id") >= 100)
    val path = tmp("graft_media_compact_loop")
    MediaStore.writePhashIndex(corp, path)

    val d7 = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val q = StreamMediaCheck.startAdmitting(
      src.toDF().toDF("doc_id", "text"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      compactEvery = 1)
    try {
      src.addData(d7); q.processAllAvailable()
      src.addData((7007L, d7._2)); q.processAllAvailable()
    } finally q.stop()

    assert(got(1L).contains((7007L, 7L)))
    val idx = MediaStore.readPhashIndex(spark, path)
    assert(idx.count() == idx.distinct().count())
  }
}
