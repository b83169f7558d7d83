package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.store.EmbeddingStore
import graft.streaming.StreamIvfIngest

/** Streaming IVF ingest: per-batch map-side cell assignment appended to
  * the clustered layout, streamed ≡ batch by shared code path. */
class StreamIvfIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed appends equal the batch clustering; probes prune; counts exact") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = Similarity.kmeansCentroids(emb)
    val path = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf_spec").toString

    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val counts = scala.collection.mutable.Map.empty[Long, Map[Int, Long]]
    val q = StreamIvfIngest.start(
      src.toDF().toDF("vec_id", "embedding"), path, cents,
      (df, id) => counts(id) = df.collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // store contents = the one-shot batch clustering of the full corpus
    val streamed = EmbeddingStore.read(spark, path)
      .select(col("vec_id"), col("c_id").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = StreamIvfIngest.assign(
      emb.select(col("vec_id"), col("embedding")), cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(streamed == batch, "streamed cell assignment must equal batch")

    // per-batch counts are exact and sum-mergeable to the corpus census
    assert(counts.keySet == Set(0L, 1L))
    val merged = (counts(0L).keySet ++ counts(1L).keySet).map { c =>
      c -> (counts(0L).getOrElse(c, 0L) + counts(1L).getOrElse(c, 0L))
    }.toMap
    val census = batch.values.groupBy(identity).map { case (c, v) =>
      c -> v.size.toLong
    }
    assert(merged == census)

    // the probed read only touches the probed cells
    val probed = EmbeddingStore.readProbed(spark, path, Seq(0, 1))
      .select(col("c_id").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(probed.subsetOf(Set(0, 1)))
  }
}
