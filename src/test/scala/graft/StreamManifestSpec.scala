package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Sampling
import graft.streaming.StreamManifest

/** Streaming shard manifest: the per-shard XOR/ADD/MIN/MAX fold converges
  * to the batch manifest under any arrival order and batch slicing; state
  * stays shard-cardinality-bounded. */
class StreamManifestSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves converge to the batch manifest; state is nShards rows") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    // adversarial order: interleave shards, reverse ids
    val shuffled = docs.sortBy(d => (d._1 % 7, -d._1))
    val src = MemoryStream[(Long, String, Long)]
    val table = new StreamManifest.ManifestTable(spark)
    val q = StreamManifest.start(
      src.toDS().toDF("doc_id", "text", "n_chars"), table)
    try {
      shuffled.grouped(77).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.manifest.collect().map(_.toSeq).toSeq
    val batch = Sampling.shardManifest(Tables.documents(spark, sf0001))
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed manifest diverged from batch")
    assert(table.state.count() <= 16)
  }
}
