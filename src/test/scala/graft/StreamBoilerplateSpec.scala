package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.StreamBoilerplate

/** Streaming boilerplate census: per-batch raw censuses sum-folded —
  * streamed ≡ batch exactly under any split, the threshold readout is
  * the batch code path, and a block crosses the flag threshold
  * mid-stream exactly when its cumulative distinct-doc count does. */
class StreamBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val B = "all rights reserved click here to unsubscribe now"

  test("two-batch fold equals the one-shot census; readout shares the batch path") {
    val rows = Seq(
      (1L, B + " x1 x2", "s1"),
      (2L, B + " y1", "s1"),
      (3L, B, "s1"),
      (4L, B, "s2"),
      (5L, "free text here only", "s2"),
      (6L, B + " " + B + " tail", "s1")) // twice in ONE doc: one vote
    val (b1, b2) = rows.splitAt(2)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val table = new StreamBoilerplate.CensusTable(spark)
    // delta-count: the suite shares one SparkContext, so other suites'
    // pinned memo blocks are alive — hygiene is judged on OUR blocks
    val blocksBefore = spark.sparkContext.getPersistentRDDs.keySet
    val q = StreamBoilerplate.start(
      src.toDF().toDF("doc_id", "text", "source"), table)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      // mid-stream: only two s1 docs so far — B not yet flagged at 3
      assert(table.flagged(3L).collect().isEmpty)
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val streamed = rowsOf(table.flagged(3L))
    val batch = rowsOf(Dedup.boilerplateCensus(
      rows.toDF("doc_id", "text", "source"), minDocs = 3L))
    assert(streamed == batch)
    // teeth: s1's header crossed the threshold (4 distinct docs), s2's
    // single carrier did not
    assert(streamed == Seq(("s1", B, 4L)))
    // scratch hygiene: of the blocks THIS stream created, only the one
    // standing census checkpoint survives
    assert((spark.sparkContext.getPersistentRDDs.keySet
      -- blocksBefore).size <= 1)
  }

  test("admission loop: batch N+1 is stripped by chrome batch N flagged") {
    val hdr = B
    def md5Hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // batch 1 pushes the header over the threshold; batch 2's docs must
    // arrive already stripped of it
    val b1 = Seq((1L, hdr + " a1", "s1"), (2L, hdr + " a2", "s1"),
      (3L, hdr + " a3", "s1"))
    val b2 = Seq((4L, hdr + " b1 b2 b3 b4 b5 b6 b7 b8", "s1"),
      (5L, "clean doc here", "s1"))

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val table = new StreamBoilerplate.CensusTable(spark)
    val out = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    val q = StreamBoilerplate.startAdmitting(
      src.toDF().toDF("doc_id", "text", "source"), table,
      (df, _) => df.collect().foreach(r => out(r.getLong(0)) =
        (r.getLong(1), r.getLong(2), r.getString(3))))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch 1 predates the flag: nothing stripped (census was empty)
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L && out(3L)._2 == 0L)
    // batch 2: the header block is now chrome — stripped at admission
    assert(out(4L) == (2L, 1L, md5Hex("b1 b2 b3 b4 b5 b6 b7 b8")))
    assert(out(5L) == (1L, 0L, md5Hex("clean doc here")))
    // and batch 2's own votes folded AFTER the strip: census sees 4 docs
    assert(table.flagged(3L).collect().map(_.getLong(2)).toSeq == Seq(4L))
  }

  test("save/load: fold-after-resume equals the uninterrupted run") {
    val rows1 = Seq((1L, B + " a", "s1"), (2L, B + " b", "s1"))
    val rows2 = Seq((3L, B + " c", "s1"), (4L, "plain text", "s2"))
    def census(t: StreamBoilerplate.CensusTable) = t.census.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2)).toSeq

    val snap = java.nio.file.Files.createTempDirectory("bp_snap")
      .resolve("census").toString
    val a = new StreamBoilerplate.CensusTable(spark)
    a.fold(rows1.toDF("doc_id", "text", "source"))
    a.save(snap)
    // crash here; a NEW table resumes from the snapshot
    val b = new StreamBoilerplate.CensusTable(spark)
    b.load(snap)
    b.fold(rows2.toDF("doc_id", "text", "source"))

    val c = new StreamBoilerplate.CensusTable(spark)
    c.fold(rows1.toDF("doc_id", "text", "source"))
    c.fold(rows2.toDF("doc_id", "text", "source"))
    assert(census(b) == census(c))
    // a second save over the same path swap-commits (no wedge, no mix)
    b.save(snap)
    val d = new StreamBoilerplate.CensusTable(spark)
    d.load(snap)
    assert(census(d) == census(b))
  }

  test("the table's block width is carried into the admission strip") {
    // width-4 table: the census votes AND the strip must both run at 4
    // tokens — a default-width strip would miss the flagged block
    val hdr4 = "all rights reserved now"
    val b1 = Seq((1L, hdr4 + " a1 a2 a3 a4", "s1"),
      (2L, hdr4 + " b1 b2 b3 b4", "s1"), (3L, hdr4, "s1"))
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val table = new StreamBoilerplate.CensusTable(spark, blockTokens = 4)
    val out = scala.collection.mutable.Map[Long, Long]()
    val q = StreamBoilerplate.startAdmitting(
      src.toDF().toDF("doc_id", "text", "source"), table,
      (df, _) => df.collect().foreach(r => out(r.getLong(0)) = r.getLong(2)))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData((4L, hdr4 + " c1 c2 c3 c4", "s1")); q.processAllAvailable()
    } finally q.stop()
    assert(out(4L) == 1L, s"width-4 chrome not stripped: $out")
  }

  test("fold is split-invariant: 1-, 2- and 3-batch ingests agree") {
    val rows = (0L until 9L).map(i =>
      (i, if (i % 3 == 0) B + s" u$i" else s"plain text $i", s"s${i % 2}"))
    def ingest(splits: Seq[Seq[(Long, String, String)]]) = {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, String, String)]
      val table = new StreamBoilerplate.CensusTable(spark)
      val q = StreamBoilerplate.start(
        src.toDF().toDF("doc_id", "text", "source"), table)
      try splits.foreach { s => src.addData(s: _*); q.processAllAvailable() }
      finally q.stop()
      table.census.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    }
    val one = ingest(Seq(rows))
    val two = ingest(Seq(rows.take(4), rows.drop(4)))
    val three = ingest(Seq(rows.take(2), rows.slice(2, 7), rows.drop(7)))
    assert(one == two && two == three)
  }
}
