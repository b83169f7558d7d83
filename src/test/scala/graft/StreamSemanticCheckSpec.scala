package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.store.EmbeddingStore
import graft.streaming.StreamSemanticCheck

/** Streaming semantic ingest check: per-batch probe of the persisted
  * banded index, streamed ≡ batch by construction. */
class StreamSemanticCheckSpec extends SparkSpec {
  import spark.implicits._

  test("streamed probe flags per batch exactly what the batch operator flags") {
    val emb = Tables.embeddings(spark, sf001)
    val corp = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_sem_spec").toString
    EmbeddingStore.writeBanded(corp, path)

    val newRows = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = newRows.splitAt(newRows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Double)]]
    val q = StreamSemanticCheck.start(
      src.toDF().toDF("vec_id", "embedding"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def batchProbe(rows: Seq[(Long, Array[Float])]) =
      StreamSemanticCheck.probe(spark,
        rows.toDF("vec_id", "embedding"), path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // per-batch equality (bit-identical cos6 — same code path), and the
    // stream saw both batches
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == batchProbe(b1))
    assert(got(1L) == batchProbe(b2))
    // the union equals one batch pass over all new vectors: flagging is
    // per-vector, so batch boundaries cannot change the outcome
    assert(got.values.flatten.toSet == batchProbe(newRows))
    assert(got.values.flatten.nonEmpty)
  }

  test("admission loop: batch N's vectors flag an exact re-send in batch N+1") {
    val emb = Tables.embeddings(spark, sf0001)
    val corp = emb.filter(col("vec_id") >= 100)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sem_admit_spec").toString
    EmbeddingStore.writeBanded(corp, path)

    // batch 0 admits vector 7 (novel vs the corpus split); batch 1
    // re-sends the IDENTICAL embedding under a new id — without the
    // census-style append it could not flag (the write-time index never
    // saw it); with it, the pair (7007 -> 7) must appear at cos ≈ 1
    val v7 = emb.filter(col("vec_id") === 7L)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().head
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long)]]
    val q = StreamSemanticCheck.startAdmitting(
      src.toDF().toDF("vec_id", "embedding"), path,
      (df, id) => got(id) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    try {
      src.addData(v7); q.processAllAvailable()
      src.addData((7007L, v7._2)); q.processAllAvailable()
    } finally q.stop()
    assert(!got(0L).exists(_._2 == 7L),
      "vector 7 was novel in batch 0 — the index had not seen it")
    assert(got(1L).contains((7007L, 7L)),
      "batch 1's re-send must flag against batch 0's appended signatures")
    // the appended state is readable store state, not a side effect:
    // a cold batch probe sees the admitted vectors too
    assert(StreamSemanticCheck.probe(spark,
        Seq((9009L, v7._2)).toDF("vec_id", "embedding"), path)
      .filter(col("corpus_id") === 7L).count() == 1L)
  }

  test("crash replay: a batch re-probed after its own append decides identically") {
    val emb = Tables.embeddings(spark, sf0001)
    val corp = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"), col("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_sem_replay_spec").toString
    EmbeddingStore.writeBanded(corp, path)
    def probe() = StreamSemanticCheck.probe(spark, batch, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val original = probe()
    // the at-least-once crash point: the pre-crash run appended the
    // batch's own signatures, then the stream checkpoint commit was
    // lost — the replay probes an index already holding them
    EmbeddingStore.appendBanded(batch, path)
    assert(probe() == original,
      "a replayed batch must not self-flag at cos 1.0 against itself")
  }
}
