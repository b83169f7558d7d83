package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamEncodingAudit

/** Streaming encoding census: per-batch batch-operator runs folded by
  * sum — streamed ≡ batch exactly over any batch split (all eight
  * counters are per-doc sums). */
class StreamEncodingAuditSpec extends SparkSpec {
  import spark.implicits._

  test("two-batch fold equals the one-shot batch census exactly") {
    val rows = Seq(
      (1L, "cafÃ© â€™ broken feed", "a"),
      (2L, "clean text here", "a"),
      (3L, "bad�bytes and !!!!???? runs", "b"),
      (4L, "abcdef", "b"),
      (5L, "日本語 text", "c"),
      (6L, "more clean", "a"))
    val (b1, b2) = rows.splitAt(3)

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, String)]
    val table = new StreamEncodingAudit.CensusTable(spark)
    val q = StreamEncodingAudit.start(
      src.toDF().toDF("doc_id", "text", "source"), table)
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (1 to 8).map(r.getLong).toVector).toMap
    val streamed = asMap(table.census)
    val batch = asMap(TextAnalysis.encodingAudit(
      rows.toDF("doc_id", "text", "source")))
    assert(streamed == batch)
    assert(streamed.keySet == Set("a", "b", "c"))
    // the artifacts actually registered (teeth)
    assert(streamed("a")(2) > 0) // mojibake leads in source a
    assert(streamed("b")(3) > 0 && streamed("b")(6) > 0) // repl + runs
  }
}
