package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.streaming.StreamDiversitySample

/** Streaming stratified sample: per-cell bottom-quota state is
  * min-union mergeable, so shuffled waves AND redelivery converge to
  * the batch operator; state stays cells·quota-bounded. */
class StreamDiversitySampleSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves + a redelivered wave converge to the batch sample") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = Similarity.kmeansCentroids(emb)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // adversarial arrival: stripe by id mod, reverse within stripes
    val shuffled = rows.sortBy(r => (r._1 % 7, -r._1))
    val src = MemoryStream[(Long, Array[Float])]
    val table = new StreamDiversitySample.DiversityTable(spark, centroids)
    val q = StreamDiversitySample.start(
      src.toDS().toDF("vec_id", "embedding"), table)
    try {
      val waves = shuffled.grouped(120).toSeq
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        // redeliver the first wave mid-stream: bottom-k state must be
        // idempotent under at-least-once duplication (same row ⇒ same
        // priority ⇒ the distinct absorbs it)
        if (i == 2) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.sample.collect().map(_.toSeq).toSeq
    val batch = Similarity.diversitySample(emb, centroids)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed stratified sample diverged from batch")
    assert(table.state.count() <= centroids.length.toLong * 10)
  }
}
