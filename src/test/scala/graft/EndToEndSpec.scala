package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
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

  test("training-data pipeline: decontaminate → curate → mix → pack composes end-to-end") {
    val docs = Tables.documents(spark, sf001)
    val total = docs.count()

    // stage 0: benchmark decontamination — drop training docs overlapping
    // the held-out eval slice
    val contaminated = TextAnalysis.decontaminate(docs, minHits = 3)
      .select("doc_id")
    val clean = docs.join(contaminated, Seq("doc_id"), "left_anti")
    val cleanN = clean.count()
    assert(cleanN > 0 && cleanN < total)

    // stage 1: language/quality curation + exact dedup (keep lowest id),
    // with the repetition rule stacked on top
    val curated = TextAnalysis.curate(clean) // (doc_id, n_copies, quality)
    val lowRep = TextAnalysis.repetitionScore(clean)
      .filter(col("dup_ratio") <= lit(0.5)).select("doc_id")
    val keptDocs = docs
      .join(curated.select("doc_id"), "doc_id")
      .join(lowRep, "doc_id")
    val curatedN = keptDocs.count()
    assert(curatedN > 0 && curatedN < total)

    // stage 2: temperature mixing over the curated set — exact budget out
    val budget = math.min(100L, curatedN)
    val mixed = Sampling.temperatureMix(keptDocs, budget)
    val mixedIds = mixed.collect().map(_.getLong(0)).toSet
    assert(mixedIds.size == budget)
    val curatedIds = keptDocs.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(mixedIds.subsetOf(curatedIds))

    // stage 3: pack the mixed selection into 512-token sequence SPANS —
    // full coverage, exactly-full non-final sequences
    val selection = docs.join(mixed.select("doc_id"), "doc_id")
    val spans = Sampling.packSequenceSpans(selection, budgetTokens = 512)
      .collect()
    assert(spans.map(_.getAs[Long]("doc_id")).toSet.subsetOf(mixedIds))
    val bySeq = spans.groupBy(_.getAs[Long]("seq_id")).map { case (s, rs) =>
      s -> rs.map(r => r.getAs[Long]("end_tok") - r.getAs[Long]("start_tok")).sum
    }
    val lastPerShard = bySeq.keys.groupBy(_ >> 40).values.map(_.max).toSet
    bySeq.foreach { case (s, tot) =>
      assert(tot <= 512 && (lastPerShard(s) || tot == 512))
    }
  }

  test("embedding pipeline: rnn precision monotone in k; MMR picks inside ANN candidates and less redundant") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    // reciprocal pairs are monotone in k: mutual-at-1 ⇒ mutual-at-3
    def pairs(k: Int) = Similarity.mutualKnn(emb, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(1); val p3 = pairs(3)
    assert(p1.nonEmpty && p1.subsetOf(p3))
    // MMR: step 1 is the pure-relevance top hit; every pick comes from
    // the ANN top-20 candidate window
    val ann = Similarity.annBruteForce(emb, queryIds = Seq(0L), k = 20)
      .collect().map(_.getLong(2))
    val mmr = Similarity.mmrRerank(emb, queryId = 0L, n = 20, k = 5)
      .collect().map(_.getLong(1))
    assert(mmr.head == ann.head)
    assert(mmr.toSet.subsetOf(ann.toSet))
    // and the diversified set is less internally redundant than the
    // pure top-5 (the property MMR exists to buy)
    val vecs = emb.filter(col("vec_id")
        .isin((mmr ++ ann.take(5)).distinct: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def meanPairCos(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size) yield {
        val (a, b) = (vecs(ids(i)), vecs(ids(j)))
        val d = math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum)
        a.zip(b).map(p => p._1 * p._2).sum / d
      }
      ps.sum / ps.size
    }
    assert(meanPairCos(mmr.toSeq) <= meanPairCos(ann.take(5).toSeq))
  }
}
