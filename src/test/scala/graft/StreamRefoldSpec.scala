package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Drift, TextAnalysis}
import graft.streaming.{StreamCms, StreamDrift, StreamEmbeddingDrift}

/** Executable redelivery contracts for the remaining ADDITIVE streaming
  * folds (CMS cells, drift histograms, embedding-centroid sums) — the
  * StreamBenford/LengthDeciles/Manifest pattern: a sum-folded census
  * counts EVERY delivery, so an at-least-once transport visibly
  * diverges, and the documented remedy (a StreamDedup-style identity
  * gate upstream) restores the batch answer under the same redelivery.
  * Contrast set (idempotent folds that absorb redelivery with no gate):
  * StreamKmv/bottom-k, StreamHll register-max, StreamSurvival min/max —
  * each asserted in its own spec. */
class StreamRefoldSpec extends SparkSpec {
  import spark.implicits._

  test("CMS cells: refold inflates the sketch; doc_id dedup gate restores batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val waves = docs.grouped(40).toSeq
    def cellSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batch = cellSet(TextAnalysis.cmsCells(
      docs.toDF("doc_id", "text"), 16384, 4)
      .select(col("seed").cast("int"), col("pos").cast("long"), col("cnt")))
    def mass(s: Set[(Int, Long, Long)]) = s.toSeq.map(_._3).sum

    // ungated fold with wave 0 delivered twice: total cell mass gains
    // exactly wave 0's mass, and the sketch diverges
    val ungated = new StreamCms.SketchTable(spark)
    waves.foreach(w => ungated.fold(w.toDF("doc_id", "text")))
    ungated.fold(waves.head.toDF("doc_id", "text"))
    val w0Mass = mass(cellSet(TextAnalysis.cmsCells(
      waves.head.toDF("doc_id", "text"), 16384, 4)
      .select(col("seed").cast("int"), col("pos").cast("long"), col("cnt"))))
    val folded = cellSet(ungated.cells)
    assert(mass(folded) == mass(batch) + w0Mass,
      "cell mass must count every delivery")
    assert(folded != batch, "refold must be visible in the sketch")

    // the remedy: identity dedup upstream, same redelivery, batch back
    val src = MemoryStream[(Long, String)]
    val gated = new StreamCms.SketchTable(spark)
    val q = StreamCms.start(
      src.toDS().toDF("doc_id", "text").dropDuplicates("doc_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(cellSet(gated.cells) == batch,
      "dedup-gated CMS must match the batch sketch under redelivery")
  }

  test("drift histogram: refold moves chi-square/PSI; event_id gate restores batch") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
    val mid = ev.agg(
      expr("(min(ts_ns div 1000) + max(ts_ns div 1000)) div 2").as("mid"))
      .collect()(0).getLong(0)
    val refHist = StreamDrift.histogram(
      ev.filter(expr(s"ts_ns div 1000 <= ${mid}L")))
    val late = ev.filter(expr(s"ts_ns div 1000 > ${mid}L"))
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val waves = late.grouped(150).toSeq
    val batch = Drift.valueDrift(ev).collect().map(_.toSeq).toSeq

    val ungated = new StreamDrift.DriftTable(spark, refHist)
    waves.foreach(w =>
      ungated.fold(w.toDF("event_id", "event_type", "value")))
    ungated.fold(waves.head.toDF("event_id", "event_type", "value"))
    assert(ungated.stat.collect().map(_.toSeq).toSeq != batch,
      "redelivered wave must move the ungated chi-square")

    val src = MemoryStream[(Long, String, Double)]
    val gated = new StreamDrift.DriftTable(spark, refHist)
    val q = StreamDrift.start(
      src.toDS().toDF("event_id", "event_type", "value")
        .dropDuplicates("event_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gated.stat.collect().map(_.toSeq).toSeq == batch,
      "dedup-gated drift must match batch valueDrift under redelivery")
    assert(gated.psiStat.collect().map(_.toSeq).toSeq ==
      Drift.psiDrift(ev).collect().map(_.toSeq).toSeq,
      "dedup-gated PSI must match batch psiDrift under redelivery")
  }

  test("centroid sums: refold shifts the live centroid; vec_id gate restores batch") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf0001)
    val mid = emb.agg(expr("(min(vec_id) + max(vec_id)) div 2"))
      .collect()(0).getLong(0)
    val refSums = StreamEmbeddingDrift.sums(emb.filter(col("vec_id") <= mid))
    val late = emb.filter(col("vec_id") > mid)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
    val waves = late.grouped(60).toSeq
    val batch = Drift.embeddingDrift(emb).collect().map(_.toSeq).toSeq

    val ungated = new StreamEmbeddingDrift.CentroidTable(spark, refSums)
    waves.foreach(w =>
      ungated.fold(w.toDF("vec_id", "embedding", "label")))
    ungated.fold(waves.head.toDF("vec_id", "embedding", "label"))
    assert(ungated.stat.collect().map(_.toSeq).toSeq != batch,
      "redelivered wave must shift the ungated centroid state")

    val src = MemoryStream[(Long, Seq[Float], Int)]
    val gated = new StreamEmbeddingDrift.CentroidTable(spark, refSums)
    val q = StreamEmbeddingDrift.start(
      src.toDS().toDF("vec_id", "embedding", "label")
        .dropDuplicates("vec_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gated.stat.collect().map(_.toSeq).toSeq == batch,
      "dedup-gated centroid state must match batch embeddingDrift under redelivery")
  }
}
