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
}
