package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.StreamDpCounts

/** Streaming DP release: exact cell counts sum-folded, PRF noise at
  * readout — streamed ≡ batch bit-for-bit, and repeated readouts of the
  * same snapshot re-draw the SAME noise (the budget-safety property). */
class StreamDpCountsSpec extends SparkSpec {
  import spark.implicits._

  test("release off the folded counts equals the batch release exactly") {
    val rows = (0L until 30L).map(i =>
      (i, "t", s"l${i % 3}", s"s${i % 4}"))
    val (b1, b2) = rows.splitAt(11)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String, String)]
    val table = new StreamDpCounts.CellTable(spark)
    val q = StreamDpCounts.start(
      src.toDF().toDF("doc_id", "text", "lang", "source"), table)
    val mid = try {
      src.addData(b1: _*); q.processAllAvailable()
      val midRelease = table.release().collect().toSeq
      src.addData(b2: _*); q.processAllAvailable()
      midRelease
    } finally q.stop()

    val streamed = table.release().collect().toSeq
    val batch = TextAnalysis.dpCounts(
      rows.toDF("doc_id", "text", "lang", "source")).collect().toSeq
    assert(streamed == batch)
    // the mid-stream read was itself a valid release of the prefix
    val prefix = TextAnalysis.dpCounts(
      b1.toDF("doc_id", "text", "lang", "source")).collect().toSeq
    assert(mid == prefix)
    // budget safety: a second readout re-draws the SAME noise
    assert(table.release().collect().toSeq == streamed)
    // and state is the bounded exact grid, not per-doc rows
    assert(table.cells.count() == 12L)
  }

  test("save/load: a resumed table's release equals the uninterrupted one") {
    val r1 = (0L until 10L).map(i => (i, "t", s"l${i % 2}", "sA"))
    val r2 = (10L until 25L).map(i => (i, "t", s"l${i % 2}", "sB"))
    val snap = java.nio.file.Files.createTempDirectory("dp_snap")
      .resolve("cells").toString
    val a = new StreamDpCounts.CellTable(spark)
    a.fold(r1.toDF("doc_id", "text", "lang", "source"))
    a.save(snap)
    val b = new StreamDpCounts.CellTable(spark)
    b.load(snap)
    b.fold(r2.toDF("doc_id", "text", "lang", "source"))
    val batch = TextAnalysis.dpCounts(
      (r1 ++ r2).toDF("doc_id", "text", "lang", "source")).collect().toSeq
    assert(b.release().collect().toSeq == batch)
  }
}
