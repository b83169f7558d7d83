package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.EventsOps
import graft.streaming.StreamBenford

/** Streaming Benford: additive census state converges to the batch audit
  * under any arrival order; state stays 9·types-bounded. */
class StreamBenfordSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled waves converge to the batch audit; state is digit-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val shuffled = ev.sortBy(e => (e._2, e._1))
    val src = MemoryStream[(String, Double)]
    val table = new StreamBenford.BenfordTable(spark)
    val q = StreamBenford.start(src.toDS().toDF("event_type", "value"), table)
    try {
      shuffled.grouped(500).foreach { wave =>
        src.addData(wave: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = table.audit.collect().map(_.toSeq).toSeq
    val batch = EventsOps.benfordValues(
      Tables.events(spark, sf0001)).collect().map(_.toSeq).toSeq
    assert(streamed == batch, "streamed Benford audit diverged from batch")
    val nTypes = ev.map(_._1).distinct.size
    assert(table.counts.count() <= 9L * nTypes)
  }

  test("redelivery inflates the additive census; a keyed dedup gate restores batch") {
    // The documented delivery contract, made executable: addition counts
    // EVERY delivery, so an at-least-once transport diverges — and the
    // documented remedy (a StreamDedup-style identity gate upstream)
    // converges again. Contrast: StreamSurvival's min/max fold absorbs
    // the same redelivery with no gate (its own spec).
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val waves = ev.grouped(500).toSeq
    def mass(rows: Seq[(Long, String, Double)]): Long =
      EventsOps.benfordCounts(
        rows.toDF("event_id", "event_type", "value"))
        .agg(org.apache.spark.sql.functions.sum(col("n"))).collect()(0)
        .getLong(0)
    val batch = EventsOps.benfordValues(
      Tables.events(spark, sf0001)).collect().map(_.toSeq).toSeq

    // ungated fold, wave 0 delivered twice: census mass double-counts
    // exactly wave 0's digit rows, and the audit diverges
    val ungated = new StreamBenford.BenfordTable(spark)
    waves.foreach(w =>
      ungated.fold(w.toDF("event_id", "event_type", "value")))
    ungated.fold(waves.head.toDF("event_id", "event_type", "value"))
    val foldedMass = ungated.counts
      .agg(org.apache.spark.sql.functions.sum(col("n"))).collect()(0)
      .getLong(0)
    assert(foldedMass == mass(ev) + mass(waves.head),
      "census mass must count every delivery")
    assert(ungated.audit.collect().map(_.toSeq).toSeq != batch,
      "redelivered wave must be visible in the ungated audit")

    // the remedy: identity dedup upstream of the fold (at-least-once
    // transport → exactly-once folds), same redelivery, batch restored
    val src = MemoryStream[(Long, String, Double)]
    val gated = new StreamBenford.BenfordTable(spark)
    val q = StreamBenford.start(
      src.toDS().toDF("event_id", "event_type", "value")
        .dropDuplicates("event_id"), gated)
    try {
      waves.zipWithIndex.foreach { case (wave, i) =>
        src.addData(wave: _*)
        if (i == 1) src.addData(waves.head: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(gated.audit.collect().map(_.toSeq).toSeq == batch,
      "dedup-gated chain must match the batch audit under redelivery")
  }
}
