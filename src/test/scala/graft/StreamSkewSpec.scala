package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.streaming.StreamJoinSize

/** Streaming skew audit: the salt-factor readout over the SAME standing
  * per-key count table StreamJoinSize already maintains — the
  * planner-audit family closes for free (one more readout, zero new
  * state), and the SideState snapshot/resume contract (atomic two-part
  * snapshot, batchId-idempotent folds) is exercised here too. */
class StreamSkewSpec extends SparkSpec {
  import spark.implicits._

  test("streamed skew audit equals the batch skew_audit bit-for-bit") {
    val ev = Tables.events(spark, sf0001)
    val rows = ev.select(col("user_id").cast("string"))
      .as[String].collect().toSeq
    val waves = rows.grouped((rows.length / 3).max(1)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val state = new StreamJoinSize.SideState(spark)
    val q = StreamJoinSize.start(src.toDF().toDF("user_id"),
      "user_id", state)
    try {
      waves.foreach { w => src.addData(w: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = StreamJoinSize.skewAudit(state).collect()
    val batch = Profiling.skewAudit(ev, "user_id").collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head == batch.head,
      s"streamed ${streamed.head} != batch ${batch.head}")
  }

  test("SideState resume: replayed batch folds once; both readouts match uninterrupted") {
    val ev = Tables.events(spark, sf0001)
    val rows = ev.select(col("user_id").cast("string"))
      .as[String].collect().toSeq
    val (w0, w1) = rows.splitAt(rows.length / 2)
    def df(w: Seq[String]) = w.toDF("k")

    val a = new StreamJoinSize.SideState(spark)
    a.fold(df(w0), 0L)
    val snap = java.nio.file.Files.createTempDirectory("skew_snap")
      .resolve("side").toString
    a.save(snap)

    val b = new StreamJoinSize.SideState(spark)
    b.load(snap)
    assert(b.lastFolded == 0L)
    b.fold(df(w0), 0L) // the crash replay: must be skipped
    b.fold(df(w1), 1L)

    val u = new StreamJoinSize.SideState(spark)
    u.fold(df(w0), 0L); u.fold(df(w1), 1L)
    def keyset(s: StreamJoinSize.SideState) = s.keys.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def cellset(s: StreamJoinSize.SideState) = s.cells.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(keyset(b) == keyset(u), "replay must not double-count keys")
    assert(cellset(b) == cellset(u), "replay must not inflate the CMS")
    assert(StreamJoinSize.skewAudit(b).collect().toSeq ==
      StreamJoinSize.skewAudit(u).collect().toSeq)
  }
}
