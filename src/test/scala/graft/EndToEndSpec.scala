package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Sampling, TextAnalysis, Trends}
import graft.serving.{TrendsCache, TrendsPage}
import graft.store.TradeStore
import graft.streaming.TradeStream

/** Capstone: the reference's full three-service flow in one test —
  * POST /api/trade (wire JSON, mixed-case months, junk requests) →
  * consumer validate/normalize → importer micro-batch → columnar store →
  * GET /api/trends through the 60s result cache → JSON response page.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("wire JSON in → cached trends JSON page out, exactly like the reference stack") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-e2e").toString

    // ── ingest plane: three users posting trades, one junk request ──
    def msg(user: String, ts: String, sell: Double, buy: Double) =
      s"""{"userId":"$user","currencyFrom":"EUR","currencyTo":"USD",
         |"amountSell":$sell,"amountBuy":$buy,"rate":0.99,
         |"timePlaced":"$ts","originatingCountry":"US"}"""
        .stripMargin.replace("\n", "")
    val src = MemoryStream[String]
    src.addData(
      msg("134256", "12-AUG-24 11:03:45", 1000, 1093.47),
      msg("134257", "12-aug-24 11:07:00", 500, 545.00), // lowercase month
      msg("134258", "12-AUG-24 11:14:30", 200, 222.00),
      """{"broken""", // consumer's 400 path
      msg("134256", "31-FEB-24 11:00:00", 1, 1)) // impossible date → 400
    val q = TradeStream.start(src.toDF(), "value", s"$dir/store", s"$dir/ckpt",
      trigger = Trigger.AvailableNow(), idempotent = true)
    q.awaitTermination()

    // ── store plane: 3 valid rows landed, columnar, rate derived ──
    val stored = TradeStore.readBatched(spark, s"$dir/store")
    assert(stored.count() == 3)

    // ── query plane: trends through the result cache, twice ──
    val from = Timestamp.valueOf("2024-08-12 00:00:00")
    val to = Timestamp.valueOf("2024-08-12 23:59:59")
    val cache = new TrendsCache()
    var computes = 0
    def compute() = {
      computes += 1
      Trends.trends(stored, from, to, "EUR", "USD").collect()
    }
    val stats = cache.get(from, to, "EUR", "USD")(compute())
    val statsAgain = cache.get(from, to, "EUR", "USD")(compute())
    assert(computes == 1 && (stats sameElements statsAgain))

    // two 10-minute windows: 11:00 (two trades) and 11:10 (one)
    assert(stats.map(_.window.toString).toSeq ==
      Seq("2024-08-12 11:00:00.0", "2024-08-12 11:10:00.0"))
    val w1100 = stats.head
    assert(w1100.min == 1.09 && w1100.max == 1.09347)
    assert(math.abs(w1100.mean - (1.09347 + 1.09) / 2) < 1e-12)
    assert(math.abs(w1100.median - (1.09347 + 1.09) / 2) < 1e-12) // exact median, even count
    assert(stats(1).min == 1.11 && stats(1).max == 1.11)

    // ── serving plane: the reference's JSON page shape ──
    val json = TrendsPage.toJson("2024-08-12T00:00:00Z", "2024-08-13T00:00:00Z",
      "EUR", "USD", stats.toSeq)
    assert(json.startsWith("""{"dateFrom":"2024-08-12T00:00:00Z""""))
    assert(json.contains(""""median":1.11"""))
  }

  test("training-data pipeline: curate → sample → pack composes end-to-end") {
    val docs = Tables.documents(spark, sf001)
    val total = docs.count()

    // stage 1: language/quality curation + exact dedup (keep lowest id)
    val curated = TextAnalysis.curate(docs) // (doc_id, n_copies, quality)
    val curatedN = curated.count()
    assert(curatedN > 0 && curatedN < total)
    val keptDocs = docs.join(curated.select("doc_id"), "doc_id")

    // stage 2: deterministic 10% hash sample of the curated set
    val sampled = Sampling.hashSample(keptDocs, permille = 100)
    val sampledIds = sampled.collect().map(_.getLong(0)).toSet
    val curatedIds = curated.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(sampledIds.nonEmpty && sampledIds.subsetOf(curatedIds))

    // stage 3: pack the curated set into 512-token training sequences
    val packed = Sampling.packSequences(keptDocs, budgetTokens = 512)
    val rows = packed.collect()
    assert(rows.length == curatedN) // every curated doc lands in a sequence
    assert(rows.forall(r => r.getAs[Long]("offset_in_seq") < 512))
    // sequences hold more than one doc on average (packing, not 1:1)
    val nSeqs = rows.map(_.getAs[Long]("seq_id")).distinct.length
    assert(nSeqs < rows.length)
  }
}
