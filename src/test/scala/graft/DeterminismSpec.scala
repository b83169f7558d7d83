package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Distributed-determinism guarantees: sketch outputs must be identical
  * regardless of partitioning and row order — the property that makes
  * them safe under retries, speculation, and cluster re-planning. */
class DeterminismSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("minhash signatures are invariant under repartitioning and row order") {
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignatures(df, k = 16).collect()
        .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq)
        .toMap
    val a = sigs(docs)
    val b = sigs(docs.repartition(13))
    val c = sigs(docs.orderBy(col("doc_id").desc))
    assert(a == b && b == c)
  }

  test("simhash fingerprints are invariant under repartitioning") {
    def fps(df: org.apache.spark.sql.DataFrame) =
      Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(docs) == fps(docs.repartition(7)))
  }

  test("dedup groups are invariant under repartitioning (min-label CC)") {
    def groups(df: org.apache.spark.sql.DataFrame) =
      Dedup.dedupGroups(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = groups(docs)
    val b = groups(docs.repartition(11))
    assert(a.nonEmpty && a == b)
  }

  test("decontamination and mixing selections are invariant under repartitioning") {
    import graft.operators.{Sampling, TextAnalysis}
    def decon(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.decontaminate(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decon(docs) == decon(docs.repartition(9)))
    def mix(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(df, budget = 100).collect()
        .map(_.getLong(0)).sorted.toSeq
    assert(mix(docs) == mix(docs.orderBy(col("doc_id").desc)))
  }

  test("market stats are invariant under repartitioning (no float sums)") {
    import graft.operators.MarketStats
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      MarketStats.ohlcBars(df).collect().toSeq,
      MarketStats.vwap(df).collect().toSeq,
      MarketStats.realizedVariation(df).collect().toSeq,
      MarketStats.pairCorrelation(df).collect().toSeq)
    assert(run(ev) == run(ev.repartition(17)))
  }

  test("round-6 microstructure/risk stats are invariant under repartitioning") {
    import graft.operators.MarketStats
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      MarketStats.rangeVolatility(df).collect().toSeq,
      MarketStats.varianceRatio(df).collect().toSeq,
      MarketStats.marketBeta(df).collect().toSeq,
      MarketStats.vpinBuckets(df).collect().toSeq,
      MarketStats.rollSpread(df).collect().toSeq,
      MarketStats.volSignature(df).collect().toSeq,
      MarketStats.retAcf(df).collect().toSeq,
      MarketStats.hurstRs(df).collect().toSeq,
      MarketStats.markoutCurve(df).collect().toSeq,
      MarketStats.theilSenTrend(df).collect().toSeq,
      MarketStats.drawdownDurations(df).collect().toSeq)
    assert(run(ev) == run(ev.repartition(19)))
  }

  test("round-5 moment/flow stats are invariant under repartitioning") {
    import graft.operators.MarketStats
    val ev = Tables.events(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      MarketStats.kyleLambda(df).collect().toSeq,
      MarketStats.retMoments(df).collect().toSeq,
      MarketStats.leadLagCorr(df).collect().toSeq,
      MarketStats.moneyFlowIndex(df).collect().toSeq,
      MarketStats.chaikinAd(df).collect().toSeq,
      MarketStats.ulcerIndex(df).collect().toSeq,
      MarketStats.tickBurstiness(df).collect().toSeq)
    assert(run(ev) == run(ev.repartition(17)))
  }

  test("drift statistics are invariant under repartitioning") {
    import graft.operators.Drift
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame) = Seq(
      Drift.valueDrift(e).collect().toSeq,
      Drift.ksDrift(e).collect().toSeq,
      Drift.vocabJaccard(d).collect().toSeq,
      Drift.embeddingDrift(m).collect().toSeq)
    assert(run(ev, docs, emb) ==
      run(ev.repartition(17), docs.repartition(13), emb.repartition(11)))
  }

  test("round-6 statistics are invariant under repartitioning") {
    import graft.operators.{Drift, EventsOps, MarketStats, Similarity, TextAnalysis}
    val ev = Tables.events(spark, sf0001)
    val d = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame,
        dd: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame) = Seq(
      Drift.psiDrift(e).collect().toSeq,
      Drift.sourceKl(dd).collect().toSeq,
      TextAnalysis.zipfSlope(dd).collect().toSeq,
      TextAnalysis.dupSpans(dd).collect().toSeq,
      TextAnalysis.langConfusion(dd).collect().toSeq,
      EventsOps.anomalyMad(e).collect().toSeq,
      EventsOps.rfmSegments(e).collect().toSeq,
      EventsOps.userPathTopK(e).collect().toSeq,
      MarketStats.ewmaDaily(e).collect().toSeq,
      Similarity.knnClassify(m).collect().toSeq)
    assert(run(ev, d, emb) ==
      run(ev.repartition(17), d.repartition(13), emb.repartition(11)))
  }

  test("session additions (rnn/mmr/shard/k-anon/funnel-window/concurrency) are invariant under repartitioning") {
    import graft.operators.{EventsOps, Sampling, Similarity, TextAnalysis}
    val ev = Tables.events(spark, sf0001)
    val d = docs
    val emb = Tables.embeddings(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame,
        dd: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame) = Seq(
      Similarity.mutualKnn(m, k = 3).collect().toSeq,
      Similarity.mmrRerank(m).collect().toSeq,
      Sampling.shardBalance(dd).collect().toSeq,
      TextAnalysis.kAnonymity(dd).collect().toSeq,
      EventsOps.funnelWindow(e).collect().toSeq,
      EventsOps.maxConcurrency(e).collect().toSeq)
    assert(run(ev, d, emb) ==
      run(ev.repartition(17), d.repartition(13), emb.repartition(11)))
  }

  test("late-session additions (asof-nearest/skipgram/calibration/label-sim/macd) are invariant under repartitioning") {
    import graft.operators.{Drift, MarketStats, TextAnalysis}
    val ev = Tables.events(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    def nearest(e: org.apache.spark.sql.DataFrame) = {
      import graft.operators.AsOfJoin
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(org.apache.spark.sql.functions.max(col("event_id"))
          .as("purchase_id"))
        .select(col("user_id"), col("ts"),
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.unix_micros(col("ts")).as("pus"),
            col("purchase_id").as("pid")).as("p"))
      AsOfJoin.asOfNearest(
        e.select(col("event_id"), col("user_id"), col("ts")),
        purchases, "user_id", "ts", "ts", "p", "pus", "m")
        .select(col("event_id"), col("m.pid"), col("m.pus"))
        .orderBy(col("event_id"))
    }
    def run(e: org.apache.spark.sql.DataFrame,
        dd: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame) = Seq(
      nearest(e).collect().toSeq,
      TextAnalysis.skipgramCooc(dd, minCount = 1L).collect().toSeq,
      TextAnalysis.qualityCalibration(dd).collect().toSeq,
      Drift.labelSimMatrix(m).collect().toSeq,
      MarketStats.macdDaily(e).collect().toSeq)
    assert(run(ev, docs, emb) ==
      run(ev.repartition(17), docs.repartition(13), emb.repartition(11)))
  }

  test("round-7 closed-form ranking family is invariant under repartitioning") {
    import graft.operators.{AsOfJoin, EventsOps, Relational, Sampling, TextAnalysis}
    val ev = Tables.events(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    def bucketed(e: org.apache.spark.sql.DataFrame) = {
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      AsOfJoin.asOfBucketed(
        e.select(col("event_id"), col("user_id"), col("ts")), purchases,
        "user_id", "ts", "ts", "purchase_id", "lp", 21600L)
        .select(col("event_id"), col("lp")).orderBy(col("event_id"))
    }
    def run(e: org.apache.spark.sql.DataFrame,
        o: org.apache.spark.sql.DataFrame,
        dd: org.apache.spark.sql.DataFrame) = Seq(
      EventsOps.rfmSegments(e).collect().toSeq,
      EventsOps.equidepthHistogram(e).collect().toSeq,
      EventsOps.quantilesDiscByType(e).collect().toSeq,
      Relational.rankBands(o).collect().toSeq,
      Relational.customerValueDeciles(o).collect().toSeq,
      Sampling.packSequences(dd).collect().toSeq,
      TextAnalysis.contaminationDeciles(dd).collect().toSeq,
      bucketed(e).collect().toSeq)
    assert(run(ev, ord, docs) ==
      run(ev.repartition(17), ord.repartition(13), docs.repartition(11)))
  }

  test("approximate count-distinct lands within tolerance of exact") {
    val orders = Tables.orders(spark, sf0001)
    val r = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
