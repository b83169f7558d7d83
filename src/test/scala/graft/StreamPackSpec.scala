package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Sampling
import graft.streaming.StreamPack

/** Streaming packing ledger: any arrival order and at-least-once replay
  * converge to the batch packing of the same corpus. */
class StreamPackSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "shard", "n_tokens", "seq_id", "offset_in_seq")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("shuffled waves + duplicate replay converge to the batch packing") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // adversarial arrival: interleave high and low doc_ids so every wave
    // reflows earlier assignments in its shard
    val shuffled = docs.sortBy(d => (d._1 % 7, -d._1))
    val src = MemoryStream[(Long, String)]
    val table = new StreamPack.PackTable(spark, budgetTokens = 256L)
    val q = StreamPack.start(src.toDS().toDF("doc_id", "text"), table)
    try {
      shuffled.grouped(120).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
      // at-least-once: replay one full wave; the ledger must not move
      val before = canon(table.packed)
      src.addData(shuffled.take(120): _*)
      q.processAllAvailable()
      assert(canon(table.packed) == before,
        "duplicate delivery shifted packing assignments")
    } finally q.stop()
    val batch = canon(Sampling.packSequences(
      Tables.documents(spark, sf0001), budgetTokens = 256L))
    assert(canon(table.packed) == batch,
      "streamed packing diverged from the batch layout")
    // state is metadata-only: one row per doc, no text column
    assert(table.meta.columns.toSeq ==
      Seq("doc_id", "shard", "n_tokens"))
    assert(table.meta.count() == docs.length)
  }
}
