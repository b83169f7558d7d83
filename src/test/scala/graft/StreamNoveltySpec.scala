package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{StreamNovelty, StreamSourceSketch}

/** Streaming ingest-novelty: per-batch verdict ≡ the batch operator
  * over everything admitted before that batch (min-union mergeability
  * makes the standing sketch equal the one-shot sketch), and novelty
  * collapses when duplicate traffic arrives. */
class StreamNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).head

  test("per-batch streamed novelty ≡ batch operator; duplicates collapse it") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val seed = docs.filter(_._1 % 5 != 0)
    val fresh = docs.filter(d => d._1 % 5 == 0 && d._1 % 2 == 0)
    val dupes = seed.take(20).map { case (id, t) => (id + 100000L, t) }

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val table = new StreamSourceSketch.SketchTable(spark)
    // seed the corpus sketch (warm state, positionless fold)
    table.fold(seed.toDF("doc_id", "text")
      .select(lit("corpus").as("source"), col("text")))

    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Long, Long, Long)]
    val q = StreamNovelty.startAdmitting(
      src.toDF().toDF("doc_id", "text"), table,
      (df, id) => got(id) = row(df))
    try {
      src.addData(fresh: _*); q.processAllAvailable()
      src.addData(dupes: _*); q.processAllAvailable()
    } finally q.stop()

    // batch 0 ≡ the batch operator over (fresh, seed)
    val b0 = row(Dedup.ingestNoveltyKmv(
      fresh.toDF("doc_id", "text"), seed.toDF("doc_id", "text")))
    assert(got(0L) == b0, s"streamed ${got(0L)} != batch $b0")
    // batch 1 ≡ the batch operator over (dupes, seed ∪ fresh) — the
    // standing sketch after batch 0's fold IS the union sketch
    val b1 = row(Dedup.ingestNoveltyKmv(
      dupes.toDF("doc_id", "text"),
      (seed ++ fresh).toDF("doc_id", "text")))
    assert(got(1L) == b1, s"streamed ${got(1L)} != batch $b1")
    // the dupes batch is byte-identical re-traffic: novelty must be 0
    assert(got(1L)._5 == 0L, s"duplicate traffic novelty: ${got(1L)}")
    // and the fresh batch carried real new mass
    assert(got(0L)._5 > 0L, s"fresh batch novelty: ${got(0L)}")
  }
}
