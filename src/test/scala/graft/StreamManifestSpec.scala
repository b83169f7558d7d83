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

  test("redelivery double-counts ADDs and CANCELS the XOR fingerprint; dedup gate restores batch") {
    // The nastiest face of the additive contract: a redelivered wave
    // inflates n_docs/chars (visible) but the XOR fingerprint of every
    // redelivered doc cancels ITSELF OUT (silent — the receipt then
    // matches a corpus the export never shipped). Both asserted, then
    // the documented identity gate restores the true batch manifest.
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    val waves = docs.grouped(77).toSeq
    val cols = Seq("doc_id", "text", "n_chars")
    val batch = Sampling.shardManifest(Tables.documents(spark, sf0001))
      .collect().map(_.toSeq).toSeq

    val ungated = new StreamManifest.ManifestTable(spark)
    waves.foreach(w => ungated.fold(w.toDF(cols: _*)))
    ungated.fold(waves.head.toDF(cols: _*))
    // every column behaves as the multiset manifest over docs ++ wave0:
    // ADD columns double-count, XOR columns cancel the wave-0 docs
    val expected = Sampling
      .shardManifest((docs ++ waves.head).toDF(cols: _*))
      .collect().map(_.toSeq).toSeq
    assert(ungated.manifest.collect().map(_.toSeq).toSeq == expected,
      "ungated fold must equal the multiset manifest (every delivery counted)")
    assert(expected != batch, "redelivery must be visible in the manifest")
    // the silent half, spelled out: shards with redelivered docs carry
    // the fingerprint of the corpus WITHOUT those docs
    val without = Sampling
      .shardManifest(docs.diff(waves.head).toDF(cols: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    val gotFp = ungated.manifest.collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    without.foreach { case (shard, fp) =>
      assert(gotFp(shard) == fp,
        s"shard $shard: redelivered fingerprints must cancel to the without-wave0 receipt")
    }

    val src = MemoryStream[(Long, String, Long)]
    val gated = new StreamManifest.ManifestTable(spark)
    val q = StreamManifest.start(
      src.toDS().toDF(cols: _*).dropDuplicates("doc_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gated.manifest.collect().map(_.toSeq).toSeq == batch,
      "dedup-gated chain must match the batch manifest under redelivery")
  }
}
