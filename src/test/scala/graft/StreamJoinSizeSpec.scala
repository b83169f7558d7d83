package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.streaming.StreamJoinSize

/** Streaming join-size audit: per-batch sum-folds of the per-key count
  * and CMS cell tables, readout = the batch arithmetic verbatim —
  * streamed ≡ batch EXACTLY (integer merges commute), including the
  * gated query's own (views ⋈ purchases on user_id) shape. */
class StreamJoinSizeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed standing state reproduces the batch audit bit-for-bit") {
    val ev = Tables.events(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
    val purchases = ev.filter(col("event_type") === "purchase")

    val lRows = views.select(col("user_id").cast("string"))
      .as[String].collect().toSeq
    val rRows = purchases.select(col("user_id").cast("string"))
      .as[String].collect().toSeq
    val (l1, l2) = lRows.splitAt(lRows.length / 2)
    val (r1, r2) = rRows.splitAt(rRows.length / 3) // uneven on purpose

    implicit val sqlCtx = spark.sqlContext
    val lSrc = MemoryStream[String]
    val rSrc = MemoryStream[String]
    val lState = new StreamJoinSize.SideState(spark)
    val rState = new StreamJoinSize.SideState(spark)
    val lq = StreamJoinSize.start(
      lSrc.toDF().toDF("user_id"), "user_id", lState)
    val rq = StreamJoinSize.start(
      rSrc.toDF().toDF("user_id"), "user_id", rState)
    try {
      lSrc.addData(l1: _*); lq.processAllAvailable()
      rSrc.addData(r1: _*); rq.processAllAvailable()
      lSrc.addData(l2: _*); lq.processAllAvailable()
      rSrc.addData(r2: _*); rq.processAllAvailable()
    } finally { lq.stop(); rq.stop() }

    val streamed = StreamJoinSize.audit(lState, rState).collect()
    val batch = Profiling.joinSizeAudit(views, purchases, "user_id")
      .collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head == batch.head,
      s"streamed ${streamed.head} != batch ${batch.head}")

    // the distributive claim itself: the folded cell table equals the
    // one built from the full per-key table in one shot
    def cellSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = Profiling.keyCells(
      views.groupBy(col("user_id").cast("string").as("k"))
        .agg(count(lit(1)).as("cnt")))
    assert(cellSet(lState.cells) == cellSet(oneShot))

    // mid-stream readout is valid state too: fold MORE rows and the
    // audit moves (monotone in appends — both sides only grow)
    // state hygiene: repeated folds must not accumulate checkpoint
    // blocks (a long-running stream's storage bound) — block count is
    // flat across extra folds
    val blocksAt = () => spark.sparkContext.getPersistentRDDs.size
    lState.fold(Seq("zz1", "zz2").toDF("k"))
    val afterOne = blocksAt()
    (1 to 3).foreach(_ => lState.fold(Seq("zz3").toDF("k")))
    assert(blocksAt() <= afterOne,
      "fold must release batch-scratch and superseded state blocks")

    val before = streamed.head.getLong(2)
    lState.fold(Seq(rRows.head).toDF("k")) // a key that joins for sure
    val after = StreamJoinSize.audit(lState, rState)
      .collect().head.getLong(2)
    assert(after > before)
  }

  test("giniAudit over standing counts ≡ the batch user_gini, bit-for-bit") {
    val ev = Tables.events(spark, sf0001)
    val rows = ev.select(col("user_id").cast("string"))
      .as[String].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 3) // uneven on purpose

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val state = new StreamJoinSize.SideState(spark)
    val q = StreamJoinSize.start(
      src.toDF().toDF("user_id"), "user_id", state)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // the continuous concentration monitor reads the SAME standing
    // key-count relation the join/skew audits read — zero new state —
    // through the batch giniFrom verbatim: streamed ≡ batch exactly
    // (giniFrom's stats are rank-RANGE functions, so the string-cast
    // key of the state cannot move a tie)
    val streamed = StreamJoinSize.giniAudit(state).collect()
    val batch = graft.operators.EventsOps.userGini(ev).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head == batch.head,
      s"streamed ${streamed.head} != batch ${batch.head}")
  }
}
