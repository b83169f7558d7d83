package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Drift
import graft.streaming.StreamDrift

/** Streamed drift ≡ batch: a reference histogram frozen from the early
  * wall-clock half plus a live stream of the late half must reproduce
  * the batch [[Drift.valueDrift]] statistic EXACTLY — counts are
  * sum-mergeable, so micro-batch boundaries cannot perturb a bin, and
  * the statistic itself is assembled by the shared [[Drift.chiSquare]]. */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  test("frozen reference vs streamed live half equals batch valueDrift") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
    val mid = ev.agg(
      expr("(min(ts_ns div 1000) + max(ts_ns div 1000)) div 2").as("mid"))
      .collect()(0).getLong(0)
    val late = ev.filter(expr(s"ts_ns div 1000 > ${mid}L"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

    val table = new StreamDrift.DriftTable(spark,
      StreamDrift.histogram(ev.filter(expr(s"ts_ns div 1000 <= ${mid}L"))))
    val src = MemoryStream[(String, Double)]
    val q = StreamDrift.start(src.toDS().toDF("event_type", "value"), table)
    try {
      // uneven waves: bin counts must fold identically whatever the cuts
      late.grouped(701).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = table.stat.collect().map(_.toSeq)
    val batch = Drift.valueDrift(ev).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // the PSI read on the SAME folded counts equals batch psiDrift too
    val streamedPsi = table.psiStat.collect().map(_.toSeq)
    val batchPsi = Drift.psiDrift(ev).collect().map(_.toSeq)
    assert(streamedPsi.nonEmpty && streamedPsi.toSeq == batchPsi.toSeq)
  }

  test("frozen centroid state vs streamed vectors equals batch embeddingDrift") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamEmbeddingDrift
    val emb = Tables.embeddings(spark, sf0001)
    val mid = emb.agg(expr("(min(vec_id) + max(vec_id)) div 2"))
      .collect()(0).getLong(0)
    val late = emb.filter(col("vec_id") > mid)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq

    val table = new StreamEmbeddingDrift.CentroidTable(spark,
      StreamEmbeddingDrift.sums(emb.filter(col("vec_id") <= mid)))
    val src = MemoryStream[(Long, Seq[Float], Int)]
    val q = StreamEmbeddingDrift.start(
      src.toDS().toDF("vec_id", "embedding", "label"), table)
    try {
      late.grouped(7).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = table.stat.collect().map(_.toSeq)
    val batch = Drift.embeddingDrift(emb).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // state bounded at labels × dims, not vectors streamed
    assert(table.liveSums.count() <= 10L * 64L)
  }

  test("frozen BQ-code marginals vs streamed vectors equals batch bqBitDrift") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamBqBitDrift
    val emb = Tables.embeddings(spark, sf0001)
    val mid = emb.agg(expr("(min(vec_id) + max(vec_id)) div 2"))
      .collect()(0).getLong(0)
    val late = emb.filter(col("vec_id") > mid)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq

    val table = new StreamBqBitDrift.BitTable(spark,
      Drift.bqBitSums(emb.filter(col("vec_id") <= mid)))
    val src = MemoryStream[(Long, Seq[Float], Int)]
    val q = StreamBqBitDrift.start(
      src.toDS().toDF("vec_id", "embedding", "label"), table)
    try {
      late.grouped(7).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = table.stat.collect().map(_.toSeq)
    val batch = Drift.bqBitDrift(emb).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // state bounded at 64 bits, not vectors streamed
    assert(table.liveSums.count() <= 64L)
  }

  test("state stays bounded at types × bins across folds") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Double)]
    val table = new StreamDrift.DriftTable(spark,
      StreamDrift.histogram(Seq(("a", 5.0), ("a", 15.0), ("b", 5.0))
        .toDF("event_type", "value")))
    val q = StreamDrift.start(src.toDS().toDF("event_type", "value"), table)
    try {
      // 300 rows, but only 2 types × 2 bins of live state
      (1 to 3).foreach { _ =>
        src.addData((1 to 100).map(i =>
          (if (i % 2 == 0) "a" else "b", (i % 20).toDouble)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val s = table.stat.collect().map(_.toSeq)
    assert(s.length == 2) // one row per type, both types present
    // live state bounded by distinct (type, bin) — 2×2 — not the 300 rows
    assert(table.liveHistogram.count() <= 4)
  }
}
