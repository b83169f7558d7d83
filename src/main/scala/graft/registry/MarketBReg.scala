package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Market family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object MarketBReg {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "user_type_gini" -> ((s, dir) =>
      EventsOps.userTypeGini(Tables.events(s, dir))),
    "lexical_richness" -> ((s, dir) => TextAnalysis.lexicalRichness(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "mad_by_type" -> ((s, dir) => EventsOps.madByType(Tables.events(s, dir))),
    "anomaly_mad" -> ((s, dir) => EventsOps.anomalyMad(Tables.events(s, dir))),
    "rfm_segments" -> ((s, dir) => EventsOps.rfmSegments(Tables.events(s, dir))),
    "user_path_topk" -> ((s, dir) =>
      EventsOps.userPathTopK(Tables.events(s, dir))),
    "sliding_active_users" -> ((s, dir) =>
      EventsOps.slidingActiveUsers(Tables.events(s, dir))),
    "log2_histogram" -> ((s, dir) =>
      EventsOps.log2Histogram(Tables.events(s, dir))),
    "session_ohlc" -> ((s, dir) => MarketStats.sessionOhlc(Tables.events(s, dir))),
    "hourly_seasonality" -> ((s, dir) =>
      MarketStats.hourlySeasonality(Tables.events(s, dir))),
    "volume_profile" -> ((s, dir) =>
      MarketStats.volumeProfile(Tables.events(s, dir))),
    "dup_triangles" -> ((s, dir) =>
      Dedup.dupTriangles(Tables.embeddings(s, dir))),
    "dup_degrees" -> ((s, dir) =>
      Dedup.dupDegrees(Tables.embeddings(s, dir))),
    "ewma_daily" -> ((s, dir) =>
      MarketStats.ewmaDaily(Tables.events(s, dir))),
    "macd_daily" -> ((s, dir) =>
      MarketStats.macdDaily(Tables.events(s, dir))),
    "dup_spans" -> ((s, dir) =>
      TextAnalysis.dupSpans(Tables.documents(s, dir),
        postings = Some(postingsFor(s, dir)),
        positions = Some(positionsFor(s, dir)))),
    "knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(Tables.embeddings(s, dir))),
    "daily_returns" -> ((s, dir) =>
      MarketStats.dailyCloseReturns(Tables.events(s, dir))),
    "cusum_drift" -> ((s, dir) => MarketStats.cusumDrift(Tables.events(s, dir))),
    "session_overlaps" -> ((s, dir) =>
      graft.operators.RangeJoin.sessionOverlapCounts(Tables.events(s, dir))),
    "bollinger_bands" -> ((s, dir) =>
      MarketStats.bollingerBands(Tables.events(s, dir))),
    "candle_patterns" -> ((s, dir) =>
      MarketStats.candlePatterns(Tables.events(s, dir))),
    "rsi_daily" -> ((s, dir) => MarketStats.rsi(Tables.events(s, dir))),
    "donchian_channels" -> ((s, dir) =>
      MarketStats.donchianChannels(Tables.events(s, dir))),
    "atr_bars" -> ((s, dir) => MarketStats.atr(Tables.events(s, dir))),
    "order_flow_imbalance" -> ((s, dir) =>
      MarketStats.orderFlowImbalance(Tables.events(s, dir))),
    "amihud_illiquidity" -> ((s, dir) =>
      MarketStats.amihudIlliquidity(Tables.events(s, dir))),
    "markout_30s" -> ((s, dir) => MarketStats.markout(Tables.events(s, dir))),
    "session_attribution" -> ((s, dir) =>
      EventsOps.sessionAttribution(Tables.events(s, dir))),
    "conversion_rate_1h" -> ((s, dir) =>
      EventsOps.clickConversionRate(Tables.events(s, dir))),
    // both lineitem profiles read the MEMOIZED distinct-value census
    // (Memo.lineitemCensusFor) instead of each re-paying the 11-way
    // per-row explode — outputs identical to the direct operators
    // (ProfilingSpec pins both), oracles unchanged
    "profile_lineitem" -> ((s, dir) =>
      Profiling.profileFromCensus(lineitemCensusFor(s, dir),
        Tables.lineitem(s, dir).schema.fieldNames.toIndexedSeq)),
    // the scale path demonstrated AND oracle-gated: the register-exact
    // portable-HLL profile — sketch state is h60 registers the oracle
    // rebuilds from the raw data, so hash_match replaces the old
    // rows-only gate (Spark's HLL++ stays as the spec-gated built-in
    // alternative in ProfilingSpec: one scan, no Expand, error envelope)
    "profile_lineitem_approx" -> ((s, dir) =>
      Profiling.profilePortableFromCensus(lineitemCensusFor(s, dir),
        Tables.lineitem(s, dir).schema.fieldNames.toIndexedSeq)),
    // same operator, different schema — the generic claim gated thrice
    "profile_documents" -> ((s, dir) =>
      Profiling.profile(Tables.table(s, dir, "documents"))),
    "profile_events" -> ((s, dir) =>
      Profiling.profile(Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))),
    // the distributive-sketch law gated directly: per-shard portable-HLL
    // registers built independently, corpus sketch = per-bucket max —
    // the merge a 1000-shard profiling job runs instead of a re-scan
    "hll_shard_merge" -> ((s, dir) =>
      Profiling.hllShardMerge(Tables.events(s, dir))),
    // the KMV twin of the law: bottom-k sets merge by bottom-k-of-union
    // EXACTLY, so the merged row equals the direct re-sketch row
    "kmv_shard_merge" -> ((s, dir) =>
      Profiling.kmvShardMerge(Tables.events(s, dir))),
    // the shuffle-pricing companion of join_size_audit: hottest-key
    // share + the ceil(max/avg) salt factor, all integer arithmetic
    "skew_audit" -> ((s, dir) =>
      Profiling.skewAudit(Tables.events(s, dir), "user_id")),
    // the OR-merge law completing the mergeable-sketch trio (HLL max,
    // KMV bottom-k, Bloom OR): merged bit set ≡ direct build
    "bloom_shard_merge" -> ((s, dir) =>
      Profiling.bloomShardMerge(Tables.events(s, dir))),
    // join-size prediction WITHOUT the join: exact Σ cnt_l·cnt_r from
    // the per-key count tables beside the CMS inner-product estimate
    // (Cormode–Muthukrishnan) — the pre-join explosion check
    "join_size_audit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Profiling.joinSizeAudit(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), "user_id")
    }),
    // reads the memoized corpus score relation (Memo.bm25For — shared
    // with hybrid_rrf's lexical list); output identical to the direct
    // operator, oracle unchanged
    "bm25_scores" -> ((s, dir) => bm25For(s, dir).orderBy(col("doc_id"))),
    "unpivot_metrics" -> ((s, dir) =>
      Relational.unpivotLineitemMetrics(Tables.lineitem(s, dir))),
    "order_backlog" -> ((s, dir) =>
      Relational.orderBacklog(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    // support 3: the corpus' basket-pair ceiling is 5, so the cut keeps
    // a real 63-candidate pool ahead of the top-50
    "basket_pairs" -> ((s, dir) =>
      Relational.basketPairs(Tables.lineitem(s, dir), minSupport = 3L)),
    // Skew-safe two-phase aggregation over the 5 hot event_type keys;
    // the oracle is the plain GROUP BY — salting must be invisible in
    // results (DECIMAL sums, so partial/final split can't perturb floats).
    "salted_hot_agg" -> { (s, dir) =>
      import graft.operators.Skew
      Skew.saltedSumCount(
        Tables.events(s, dir).withColumn("value",
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
        keys = Seq("event_type"), valueCol = "value",
        saltFrom = Seq("event_id"), salts = 16)
        .select(col("event_type"), col("sum_value").cast("double"), col("n"))
        .orderBy(col("event_type"))
    },
    "asof_last_purchase" -> ((s, dir) => AsOfJoin.lastPurchaseBefore(Tables.events(s, dir))),
    // the same semantics through the NATIVE sort-merge operator
    // (logical node + strategy + SparkPlan — plans.AsOfJoinPhysical)
    "asof_exec" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      graft.plans.AsOfJoinPhysical.asOf(
        ev.select(col("event_id"), col("user_id"), col("ts")), purchases,
        "user_id", "ts", "ts", "purchase_id", "last_purchase_id")
        .select(col("event_id"), col("user_id"), col("last_purchase_id"))
        .orderBy(col("event_id"))
    },
    // the same semantics AGAIN through the time-bucketed sweep/carry
    // form — the plan shape for COARSE as-of keys (no per-key window
    // over the full stream; every window bounded by bucket or spine)
    "asof_bucketed" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      AsOfJoin.asOfBucketed(
        ev.select(col("event_id"), col("user_id"), col("ts")), purchases,
        "user_id", "ts", "ts", "purchase_id", "last_purchase_id",
        bucketSec = 21600L)
        .select(col("event_id"), col("user_id"), col("last_purchase_id"))
        .orderBy(col("event_id"))
    },
    "asof_within" -> ((s, dir) => AsOfJoin.lastPurchaseWithin(Tables.events(s, dir))),
    "asof_next_purchase" -> ((s, dir) => AsOfJoin.nextPurchaseAfter(Tables.events(s, dir))),
    "asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
        .select(col("user_id"), col("ts"),
          struct(unix_micros(col("ts")).as("pus"),
            col("purchase_id").as("pid")).as("p"))
      AsOfJoin.asOfNearest(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        purchases, "user_id", "ts", "ts", "p", "pus", "m")
        .select(col("event_id"), col("user_id"),
          col("m.pid").as("nearest_purchase_id"),
          (col("m.pus") - unix_micros(col("ts"))).as("delta_us"))
        .orderBy(col("event_id"))
    }),
    "asof_interpolated" -> ((s, dir) => AsOfJoin.asOfInterpolated(Tables.events(s, dir))),
    "range_join_counts" -> ((s, dir) =>
      graft.operators.RangeJoin.purchaseClickCounts(Tables.events(s, dir))),
    // the NAIVE inequality-join formulation, planned scale-safe by the
    // BinnedRangeJoinRule optimizer rewrite (installed here once per
    // session; idempotent, and guarded off every already-binned plan)
    "range_join_auto" -> { (s, dir) =>
      val rule = graft.plans.BinnedRangeJoinRule
      // synchronized: the install is a read-modify-write on a plain Seq,
      // and Bench's warmup pass constructs queries concurrently
      s.experimental.synchronized {
        if (!s.experimental.extraOptimizations.contains(rule))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ rule
      }
      graft.operators.RangeJoin.purchaseClickCountsNaive(Tables.events(s, dir))
    },
    // Exact interpolated quantiles per group (A3 extension: the multi-
    // quantile shape analytics actually asks for; Spark `percentile` and
    // DuckDB `quantile_cont` both interpolate linearly on sorted values).
    "quantiles_by_type" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.25)), 6).as("p25"),
          round(percentile(col("value"), lit(0.5)), 6).as("p50"),
          round(percentile(col("value"), lit(0.75)), 6).as("p75"),
          round(percentile(col("value"), lit(0.95)), 6).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")))
  )

  def sql: Map[String, String] = Map(
    // lag/cumsum session numbering (the events_sessionize convention) +
    // the OHLC rn picks, both on the (epoch_ns, event_id) tick order
    "session_ohlc" ->
      """WITH o AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id, value,
        |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w >= 1800000000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY event_type
        |    ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, sid
        |      ORDER BY tns, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, sid
        |      ORDER BY tns DESC, event_id DESC) AS rn_d
        |  FROM s
        |)
        |SELECT event_type, min(tns) // 1000 AS session_start_us,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks,
        |  max(tns) // 1000 - min(tns) // 1000 AS duration_us
        |FROM r GROUP BY event_type, sid
        |ORDER BY event_type, session_start_us""".stripMargin,
    "hourly_seasonality" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 % 24 AS hour_utc,
        |  count(*) AS n_ticks,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS volume,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(8,2))) * 1000000 AS HUGEINT) //
        |    count(*) AS BIGINT) AS mean_micro
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "volume_profile" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS volume,
        |  count(*) AS n_ticks
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // triangle closure over the exact near-dup pair relation (id ordering
    // makes each triangle count once); pairs reuse the embedding_dups CTE
    "dup_triangles" ->
      """WITH elems AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b
        |    ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM dots
        |  JOIN norms na ON na.vec_id = id_a
        |  JOIN norms nb ON nb.vec_id = id_b
        |  WHERE dot/(na.nrm*nb.nrm) >= 0.3
        |)
        |SELECT l.label, count(*) AS n_triangles
        |FROM pairs p1
        |JOIN pairs p2 ON p1.id_b = p2.id_a
        |JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
        |JOIN embeddings l ON l.vec_id = p1.id_a
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // degree histogram over the same exact pair relation (each endpoint
    // of each undirected pair counts once)
    "dup_degrees" ->
      """WITH elems AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b
        |    ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM dots
        |  JOIN norms na ON na.vec_id = id_a
        |  JOIN norms nb ON nb.vec_id = id_b
        |  WHERE dot/(na.nrm*nb.nrm) >= 0.3
        |), deg AS (
        |  SELECT id, count(*) AS degree FROM (
        |    SELECT id_a AS id FROM pairs
        |    UNION ALL SELECT id_b FROM pairs) u
        |  GROUP BY 1
        |)
        |SELECT degree, count(*) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin,
    // The α=1/2 EWMA recurrence replayed verbatim as a recursive CTE
    // over the daily-bar relation; `//` TRUNCATES toward zero (verified:
    // (-7)//2 = -3), and the operator's fold uses Scala Long `/` (also
    // truncating) to match on every sign — the market_beta convention.
    "ewma_daily" ->
      """WITH RECURSIVE raw AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value,
        |    row_number() OVER (
        |      PARTITION BY event_type, epoch_ns(ts) // 86400000000000
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |), bars AS (
        |  SELECT event_type, day,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
        |  FROM raw WHERE rn = 1
        |), e AS (
        |  SELECT event_type, day, cents, k, cents * 1000000 AS ewma_microcents
        |  FROM bars WHERE k = 1
        |  UNION ALL
        |  SELECT b.event_type, b.day, b.cents, b.k,
        |    (e.ewma_microcents + b.cents * 1000000) // 2
        |  FROM bars b JOIN e ON b.event_type = e.event_type AND b.k = e.k + 1
        |)
        |SELECT event_type, day, cents, ewma_microcents FROM e
        |ORDER BY 1, 2""".stripMargin,
    // three-EMA MACD replayed in ONE recursive CTE; every recurrence is
    // the increment form m + trunc(2(x−m)/(n+1)) — TOWARD-ZERO division
    // on either sign (DuckDB // truncates, Scala Long / truncates; the
    // market_beta convention). The signal step inlines the fresh
    // fast/slow values (a recursive SELECT cannot reference its own new
    // columns).
    "macd_daily" ->
      """WITH RECURSIVE raw AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value,
        |    row_number() OVER (
        |      PARTITION BY event_type, epoch_ns(ts) // 86400000000000
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |), bars AS (
        |  SELECT event_type, day,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
        |  FROM raw WHERE rn = 1
        |), e AS (
        |  SELECT event_type, day, cents, k,
        |    cents * 1000000 AS mf, cents * 1000000 AS ms,
        |    CAST(0 AS BIGINT) AS sg
        |  FROM bars WHERE k = 1
        |  UNION ALL
        |  SELECT b.event_type, b.day, b.cents, b.k,
        |    e.mf + (2 * (b.cents * 1000000 - e.mf)) // 13,
        |    e.ms + (2 * (b.cents * 1000000 - e.ms)) // 27,
        |    e.sg + (2 * (((e.mf + (2 * (b.cents * 1000000 - e.mf)) // 13)
        |                - (e.ms + (2 * (b.cents * 1000000 - e.ms)) // 27))
        |                - e.sg)) // 10
        |  FROM bars b JOIN e ON b.event_type = e.event_type AND b.k = e.k + 1
        |)
        |SELECT event_type, day, cents, mf - ms AS macd_microcents,
        |  sg AS signal_microcents, mf - ms - sg AS hist_microcents
        |FROM e ORDER BY 1, 2""".stripMargin,
    // Interval-union span coverage over duplicated trigrams: sorted-gap
    // identity (first span 3, then min(3, gap)), exact BIGINTs.
    "dup_spans" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), wl AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w
        |  FROM norm
        |), raw AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w) - 2),
        |         j -> {'j': j, 'sh': w[j] || ' ' || w[j+1] || ' ' || w[j+2]})
        |    ELSE [] END) AS u
        |  FROM wl
        |), tri AS (
        |  SELECT doc_id, u.j AS j, u.sh AS sh FROM raw
        |), dup AS (
        |  SELECT sh FROM (
        |    SELECT sh, count(DISTINCT doc_id) AS nd FROM tri GROUP BY 1)
        |  WHERE nd >= 2
        |), g AS (
        |  SELECT doc_id, j, j - lag(j) OVER (
        |    PARTITION BY doc_id ORDER BY j) AS d
        |  FROM tri WHERE sh IN (SELECT sh FROM dup)
        |), cov AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_pos,
        |    CAST(sum(CASE WHEN d IS NULL THEN 3 ELSE least(3, d) END)
        |      AS BIGINT) AS covered
        |  FROM g GROUP BY 1
        |)
        |SELECT wl.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  coalesce(cov.n_dup_pos, 0) AS n_dup_pos,
        |  coalesce(cov.covered, 0) AS covered,
        |  CAST(CASE WHEN len(w) > 0
        |    THEN coalesce(cov.covered, 0) * 1000000 // len(w)
        |    ELSE 0 END AS BIGINT) AS dup_cov_micro
        |FROM wl LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Same dot/norm CTE shape as ann_topk; holdout = vec_id ≡ 0 (mod
    // 10), k = 5 votes, majority with ties to the smallest label.
    "knn_classify" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |    AND a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), ranked AS (
        |  SELECT query_id, cand_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |), votes AS (
        |  SELECT query_id, l.label, count(*) AS v
        |  FROM ranked JOIN embeddings l ON l.vec_id = ranked.cand_id
        |  WHERE rank <= 5 GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id, label, v, row_number() OVER (
        |    PARTITION BY query_id ORDER BY v DESC, label) AS rn
        |  FROM votes
        |)
        |SELECT p.query_id, q.label AS true_label, p.label AS pred_label,
        |  CAST(p.v AS BIGINT) AS votes,
        |  CAST(CASE WHEN p.label = q.label THEN 1 ELSE 0 END AS BIGINT)
        |    AS correct
        |FROM pred p JOIN embeddings q ON q.vec_id = p.query_id
        |WHERE p.rn = 1 ORDER BY p.query_id""".stripMargin,
    // floor() of the double quotient (not // or div): returns go
    // negative, and FLOOR semantics is wanted there — both engines'
    // integral division truncates toward zero, so the shared
    // floor(double) path (exact at these magnitudes) carries the floor
    "daily_returns" ->
      """SELECT event_type, day, close,
        |  CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |    AS ret_micro
        |FROM (
        |  SELECT event_type, day, close, cents,
        |    lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      value AS close,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |) l ORDER BY event_type, day""".stripMargin,
    // Cutler RSI on integer cent diffs of the deterministic daily
    // closes; micro-percent floor surrogate — no float path
    "rsi_daily" ->
      """WITH closes AS (
        |  SELECT event_type, day,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1
        |), diffs AS (
        |  SELECT event_type, day,
        |    cents - lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS d
        |  FROM closes
        |), rolled AS (
        |  SELECT event_type, day,
        |    sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER wr AS g,
        |    sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER wr AS l,
        |    count(d) OVER wr AS n_win
        |  FROM diffs
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CASE WHEN g + l <> 0
        |    THEN CAST(CAST(g AS HUGEINT) * 100000000 // (g + l) AS BIGINT)
        |    END AS rsi_micro
        |FROM rolled WHERE n_win = 14
        |ORDER BY event_type, day""".stripMargin,
    // pure max/min comparisons over the PRECEDING-n frame — no
    // arithmetic, bit-portable by construction
    "donchian_channels" ->
      """SELECT event_type, event_id, value, ch_high, ch_low,
        |  value > ch_high AS breakout_up,
        |  value < ch_low AS breakout_dn
        |FROM (
        |  SELECT event_type, event_id, value,
        |    max(value) OVER w AS ch_high,
        |    min(value) OVER w AS ch_low,
        |    count(value) OVER w AS n_win
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) t
        |WHERE n_win = 20
        |ORDER BY event_type, event_id""".stripMargin,
    // true range on exact DECIMAL bar extremes (bars = the ohlc_bars
    // oracle as a CTE); ATR is the trailing-14 micro-int floor mean
    "atr_bars" ->
      """WITH bars AS (
        |  SELECT event_type, window_start,
        |    max(value) AS high, min(value) AS low,
        |    max(CASE WHEN rn_d = 1 THEN value END) AS close
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |      value,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 600000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, window_start
        |), tr AS (
        |  SELECT event_type, window_start,
        |    CASE WHEN prev_close IS NULL
        |      THEN CAST(high AS DECIMAL(8,2)) - CAST(low AS DECIMAL(8,2))
        |      ELSE greatest(
        |        CAST(high AS DECIMAL(8,2)) - CAST(low AS DECIMAL(8,2)),
        |        abs(CAST(high AS DECIMAL(8,2)) - prev_close),
        |        abs(CAST(low AS DECIMAL(8,2)) - prev_close)) END AS tr
        |  FROM (
        |    SELECT *, lag(CAST(close AS DECIMAL(8,2))) OVER
        |      (PARTITION BY event_type ORDER BY window_start) AS prev_close
        |    FROM bars) b
        |)
        |SELECT event_type, window_start,
        |  CAST(CAST(s_tr * 1000000 AS HUGEINT) // n_bars AS BIGINT) AS atr_micro,
        |  n_bars
        |FROM (
        |  SELECT event_type, window_start,
        |    sum(tr) OVER wr AS s_tr, count(tr) OVER wr AS n_bars
        |  FROM tr
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY window_start
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) x
        |ORDER BY event_type, window_start""".stripMargin,
    // tick-rule trade signing (zero-ticks inherit the last nonzero
    // change sign via last_value ignore nulls); integer signed volume
    "order_flow_imbalance" ->
      """SELECT event_type, window_start,
        |  CAST(sum(sign * size) AS BIGINT) AS imbalance,
        |  CAST(sum(CASE WHEN sign = 1 THEN size ELSE 0 END) AS BIGINT) AS buy_vol,
        |  CAST(sum(CASE WHEN sign = -1 THEN size ELSE 0 END) AS BIGINT) AS sell_vol,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type,
        |    epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |    coalesce(last_value(chg_sign IGNORE NULLS) OVER wc, 0) AS sign
        |  FROM (
        |    SELECT event_type, ts, event_id, props,
        |      CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END AS chg_sign
        |    FROM (
        |      SELECT event_type, ts, event_id, props,
        |        CAST(value AS DECIMAL(8,2)) -
        |          lag(CAST(value AS DECIMAL(8,2))) OVER
        |            (PARTITION BY event_type
        |             ORDER BY epoch_ns(ts), event_id) AS d
        |      FROM events) a
        |  ) b
        |  WINDOW wc AS (PARTITION BY event_type
        |    ORDER BY epoch_ns(ts), event_id ROWS UNBOUNDED PRECEDING)
        |) c
        |GROUP BY event_type, window_start
        |ORDER BY event_type, window_start""".stripMargin,
    // bounded funnel KPI: forward ASOF to the next purchase, horizon
    // CASE, exact micro-int rate
    "conversion_rate_1h" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'
        |), conv AS (
        |  SELECT c.event_id,
        |    CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |      THEN 1 ELSE 0 END AS converted
        |  FROM clicks c
        |  ASOF LEFT JOIN purchases p
        |    ON c.user_id = p.user_id AND p.ts >= c.ts
        |)
        |SELECT count(*) AS n_clicks,
        |  CAST(sum(converted) AS BIGINT) AS n_converted,
        |  CASE WHEN count(*) > 0
        |    THEN CAST(sum(converted) AS BIGINT) * 1000000 // count(*)
        |    END AS rate_micro
        |FROM conv""".stripMargin,
    "markout_30s" ->
      """WITH t AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |)
        |SELECT e.event_id, e.event_type, e.cents,
        |  f.cents AS future_cents,
        |  f.cents - e.cents AS markout_cents
        |FROM t e
        |ASOF LEFT JOIN t f
        |  ON e.event_type = f.event_type
        |  AND f.ts >= e.ts + INTERVAL 30 SECOND
        |ORDER BY e.event_id""".stripMargin,
    // first-touch attribution: purchases credited to the session's
    // earliest click; the arg-min id is recovered via a μs-equality
    // join (μs instants are collision-free, spec-asserted)
    "session_attribution" ->
      """WITH o AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, event_type, us, sid,
        |    min(CASE WHEN event_type = 'click' THEN us END) OVER ws AS fc_us,
        |    min(us) OVER ws AS session_start_us
        |  FROM s
        |  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT p.purchase_id, p.user_id,
        |  c.event_id AS first_click_id, p.session_start_us
        |FROM p LEFT JOIN s c
        |  ON c.user_id = p.user_id AND c.us = p.fc_us
        |  AND c.event_type = 'click'
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.purchase_id""".stripMargin,
    // |daily return| per unit size — both inputs are this family's
    // integer surrogates, so the impact ratio is one floor division
    "amihud_illiquidity" ->
      """WITH rets AS (
        |  SELECT event_type, day,
        |    CAST(floor((cents - p_cents) * 1000000.0 / p_cents) AS BIGINT)
        |      AS ret_micro
        |  FROM (
        |    SELECT event_type, day, cents,
        |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS p_cents
        |    FROM (
        |      SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |        CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |    WHERE rn = 1) l
        |), vols AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |      AS volume
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT r.event_type, r.day, r.ret_micro, v.volume,
        |  CASE WHEN r.ret_micro IS NOT NULL AND v.volume <> 0
        |    THEN abs(r.ret_micro) * 1000 // v.volume END AS amihud_nano
        |FROM rets r JOIN vols v
        |  ON r.event_type = v.event_type AND r.day = v.day
        |ORDER BY r.event_type, r.day""".stripMargin,
    // the CUSUM recursion telescoped to prefix-min windows on exact
    // integer cents (X_i = cents − i·k) — see MarketStats.cusumDrift
    "cusum_drift" ->
      """SELECT event_type, day,
        |  max(x_up - m_up) AS max_s_up,
        |  max(x_dn - m_dn) AS max_s_dn,
        |  CAST(sum(CASE WHEN x_up - m_up > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_up,
        |  CAST(sum(CASE WHEN x_dn - m_dn > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_dn
        |FROM (
        |  SELECT event_type, day, x_up, x_dn,
        |    min(x_up) OVER wr AS m_up, min(x_dn) OVER wr AS m_dn
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      epoch_ns(ts) AS tns, event_id,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) -
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts), event_id) * 50 AS x_up,
        |      -CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) -
        |        row_number() OVER (PARTITION BY event_type,
        |          epoch_ns(ts) // 86400000000000
        |          ORDER BY epoch_ns(ts), event_id) * 50 AS x_dn
        |    FROM events) b
        |  WINDOW wr AS (PARTITION BY event_type, day ORDER BY tns, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |) t GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    // the oracle states overlap DIRECTLY as the inequality join the
    // operator's bin-bucketed plan must reproduce pair-for-pair
    "session_overlaps" ->
      """WITH o AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w >= 1800000000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY event_type
        |    ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), iv AS (
        |  SELECT event_type, min(tns) // 1000 AS s_us, max(tns) // 1000 AS e_us
        |  FROM s GROUP BY event_type, sid
        |)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_overlaps
        |FROM iv a JOIN iv b
        |  ON a.event_type < b.event_type
        |  AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // rolling-window sums are exact DECIMALs; mean is the micro-int
    // surrogate, σ is irrational (safe to round), and the band flags
    // compare the SAME doubles both engines compute from those sums
    "bollinger_bands" ->
      """SELECT event_type, event_id,
        |  CAST(CAST(s * 1000000 AS HUGEINT) // cnt AS BIGINT) AS mean_micro,
        |  round(sqrt(greatest(CAST(cnt AS DOUBLE) * CAST(ss AS DOUBLE) -
        |      CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0)) /
        |    CAST(cnt AS DOUBLE), 6) AS sd,
        |  value > CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) +
        |    2.0 * (sqrt(greatest(CAST(cnt AS DOUBLE) * CAST(ss AS DOUBLE) -
        |        CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0)) /
        |      CAST(cnt AS DOUBLE)) AS above,
        |  value < CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) -
        |    2.0 * (sqrt(greatest(CAST(cnt AS DOUBLE) * CAST(ss AS DOUBLE) -
        |        CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0)) /
        |      CAST(cnt AS DOUBLE)) AS below
        |FROM (
        |  SELECT event_type, event_id, value,
        |    count(*) OVER w AS cnt,
        |    sum(CAST(value AS DECIMAL(8,2))) OVER w AS s,
        |    sum(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2)))
        |      OVER w AS ss
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type
        |    ORDER BY epoch_ns(ts), event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |) t ORDER BY event_type, event_id""".stripMargin,
    "candle_patterns" ->
      """WITH bars AS (
        |  SELECT event_type, window_start,
        |    max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |    max(value) AS high, min(value) AS low,
        |    max(CASE WHEN rn_d = 1 THEN value END) AS close
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |      value,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 600000000000
        |        ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 600000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, window_start
        |), lagged AS (
        |  SELECT *,
        |    lag(open) OVER (PARTITION BY event_type ORDER BY window_start)
        |      AS p_open,
        |    lag(close) OVER (PARTITION BY event_type ORDER BY window_start)
        |      AS p_close
        |  FROM bars
        |)
        |SELECT event_type, window_start,
        |  abs(close - open) * 10.0 <= high - low AS doji,
        |  (p_close < p_open AND close > open AND open <= p_close AND
        |    close >= p_open) AS bullish_engulfing,
        |  (p_close > p_open AND close < open AND open >= p_close AND
        |    close <= p_open) AS bearish_engulfing
        |FROM lagged ORDER BY event_type, window_start""".stripMargin,
    "profile_lineitem" -> profileOracle("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")),
    "profile_lineitem_approx" -> portableProfileOracle("lineitem",
      Seq("l_orderkey" -> "", "l_partkey" -> "", "l_suppkey" -> "",
        "l_linenumber" -> "", "l_quantity" -> "dbl",
        "l_extendedprice" -> "dbl", "l_discount" -> "dbl",
        "l_tax" -> "dbl", "l_returnflag" -> "", "l_linestatus" -> "",
        "l_shipdate" -> "ts")),
    "profile_documents" -> profileOracle("documents",
      Seq("doc_id", "text", "lang", "source", "n_chars")),
    // ts distinct-counts agree across engines because μs instants are
    // collision-free (MarketStatsSpec asserts it)
    "profile_events" -> profileOracle("events",
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
    // Join-size audit: both levels integer-replayed — per-key count
    // tables for the exact product sum, the 2-universal CMS cells and
    // per-seed inner products for the estimate (vocab_cms's seed-table
    // idiom); a missing seed row means a zero inner product, so < d
    // seeds forces the estimate to 0 exactly as the engine does.
    "join_size_audit" -> {
      val p = graft.functions.PortableHash.MinhashP
      val seeds = graft.functions.PortableHash.minhashParams(4).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH l AS (
         |  SELECT user_id FROM events WHERE event_type = 'view'
         |), r AS (
         |  SELECT user_id FROM events WHERE event_type = 'purchase'
         |), seeds(seed, a, b) AS (VALUES $seeds
         |), lh AS (
         |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |    % $p AS h1 FROM l
         |), rh AS (
         |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |    % $p AS h1 FROM r
         |), lc AS (
         |  SELECT seed, (a * h1 + b) % $p % 1024 AS pos, count(*) AS cnt
         |  FROM lh, seeds GROUP BY 1, 2
         |), rc AS (
         |  SELECT seed, (a * h1 + b) % $p % 1024 AS pos, count(*) AS cnt
         |  FROM rh, seeds GROUP BY 1, 2
         |), ip AS (
         |  SELECT a.seed, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS ip
         |  FROM lc a JOIN rc b ON b.seed = a.seed AND b.pos = a.pos
         |  GROUP BY 1
         |), est AS (
         |  SELECT CAST(CASE WHEN count(*) < 4 THEN 0 ELSE min(ip) END
         |    AS BIGINT) AS cms_est_pairs FROM ip
         |), ex AS (
         |  SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS exact_pairs
         |  FROM (SELECT user_id, count(*) AS c FROM l GROUP BY 1) a
         |  JOIN (SELECT user_id, count(*) AS c FROM r GROUP BY 1) b
         |    USING (user_id)
         |), nl AS (SELECT count(*) AS n_left FROM l
         |), nr AS (SELECT count(*) AS n_right FROM r)
         |SELECT CAST(n_left AS BIGINT) AS n_left,
         |  CAST(n_right AS BIGINT) AS n_right, exact_pairs, cms_est_pairs
         |FROM nl, nr, ex, est""".stripMargin
    },
    // Shard-merge HLL algebra: per-shard registers AND the per-bucket
    // max merge replayed from raw data; assembly = the portable-HLL
    // oracle's register CTEs with `shard` in place of `col`.
    "hll_shard_merge" ->
      """WITH h AS (
        |  SELECT CAST(event_id % 4 AS VARCHAR) AS shard,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM events
        |), shard_regs AS (
        |  SELECT shard, h % 64 AS bucket,
        |    max(CASE WHEN h // 64 = 0 THEN 55
        |        ELSE 55 - length(bin(h // 64)) END) AS reg
        |  FROM h GROUP BY 1, 2
        |), regs AS (
        |  SELECT shard, bucket, reg FROM shard_regs
        |  UNION ALL
        |  SELECT 'merged' AS shard, bucket, max(reg) AS reg
        |  FROM shard_regs GROUP BY 2
        |), per AS (
        |  SELECT shard, count(*) AS n_used, max(reg) AS max_reg
        |  FROM regs GROUP BY 1
        |), asm AS (
        |  SELECT r.shard, p.n_used, p.max_reg,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(p.max_reg - r.reg AS INT))
        |      AS BIGINT) AS s_present
        |  FROM regs r JOIN per p USING (shard)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT shard,
        |  CAST(64 - n_used AS BIGINT) AS v_zero,
        |  max_reg,
        |  s_present + (64 - n_used) *
        |    (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS s_num,
        |  round(0.709 * 64 * 64 * pow(2.0, max_reg) /
        |    CAST(s_present + (64 - n_used) *
        |      (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS DOUBLE), 6)
        |    AS hll_est
        |FROM asm
        |ORDER BY shard""".stripMargin,
    // Bloom OR-merge law: shard position sets union to exactly the
    // direct build's set; fpp = the integral micro floor of fill^4
    // through HUGEINT (n_set^4 passes BIGINT at m = 2^20)
    "bloom_shard_merge" -> {
      val p = graft.functions.PortableHash.MinhashP
      val seeds = graft.functions.PortableHash.minhashParams(4)
        .map { case (a, b) => s"($a, $b)" }.mkString(", ")
      s"""WITH hashed AS (
         |  SELECT CAST(event_id % 4 AS VARCHAR) AS shard,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
         |      AS h
         |  FROM events
         |), seeds(a, b) AS (VALUES $seeds
         |), pos AS (
         |  SELECT shard, (a * (h % $p) + b) % $p % 1048576 AS pos
         |  FROM hashed, seeds
         |), shard_bits AS (
         |  SELECT DISTINCT shard, pos FROM pos
         |), lvl AS (
         |  SELECT DISTINCT shard, pos FROM (
         |    SELECT shard, pos FROM shard_bits
         |    UNION ALL SELECT 'merged' AS shard, pos FROM shard_bits
         |    UNION ALL SELECT 'direct' AS shard, pos FROM pos) u
         |)
         |SELECT shard, count(*) AS n_set, bit_xor(pos) AS pos_xor,
         |  CAST(count(*) * 1000000 // 1048576 AS BIGINT) AS fill_micro,
         |  CAST(CAST(count(*) AS HUGEINT) * count(*) * count(*)
         |    * count(*) * 1000000 // (CAST(1048576 AS HUGEINT)
         |    * 1048576 * 1048576 * 1048576) AS BIGINT) AS fpp_micro
         |FROM lvl GROUP BY shard ORDER BY shard""".stripMargin
    },
    // hottest-key share and ceil(max/avg) salt factor as exact integer
    // arithmetic over the per-key count table
    "skew_audit" ->
      """WITH c AS (
        |  SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1
        |)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  CAST(max(cnt) * 1000000 // sum(cnt) AS BIGINT)
        |    AS top_share_micro,
        |  CAST((max(cnt) * count(*) + sum(cnt) - 1) // sum(cnt) AS BIGINT)
        |    AS salt_factor
        |FROM c""".stripMargin,
    // KMV shard-merge law: shard bottom-64 tables, merged = bottom-64
    // of their union, direct = re-sketch from raw — same estimate CASE
    // as kmv_distinct; merged and direct rows are equal by the law
    "kmv_shard_merge" ->
      """WITH hashed AS (
        |  SELECT DISTINCT CAST(event_id % 4 AS VARCHAR) AS shard,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM events
        |), shard_tops AS (
        |  SELECT shard, h FROM (
        |    SELECT shard, h,
        |      row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
        |    FROM hashed) t WHERE rn <= 64
        |), lvl AS (
        |  SELECT shard, h FROM shard_tops
        |  UNION ALL SELECT 'merged' AS shard, h FROM shard_tops
        |  UNION ALL SELECT DISTINCT 'direct' AS shard, h FROM hashed
        |), ranked AS (
        |  SELECT shard, h,
        |    row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
        |  FROM (SELECT DISTINCT shard, h FROM lvl) d
        |)
        |SELECT shard, count(*) AS n_kept, max(h) AS kth_min,
        |  CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |       WHEN max(h) > 0
        |       THEN round(63.0 * (1152921504606846976.0
        |         / CAST(max(h) AS DOUBLE)), 3)
        |  END AS n_est
        |FROM ranked WHERE rn <= 64
        |GROUP BY shard ORDER BY shard""".stripMargin,
    "sliding_active_users" ->
      """SELECT event_type, slot * 1800 AS window_start,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM (
        |  SELECT event_type, user_id,
        |    unnest([epoch_ns(ts) // 1800000000000,
        |            epoch_ns(ts) // 1800000000000 - 1]) AS slot
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // floor(log2) as binary-string length on exact integer cents — no
    // libm log whose power-of-two-boundary ulp the engines could split on
    "log2_histogram" ->
      """SELECT event_type,
        |  length(printf('%b',
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT))) - 1 AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mad_by_type" ->
      """WITH med AS (
        |  SELECT event_type, median(value) AS m FROM events GROUP BY 1
        |)
        |SELECT e.event_type, round(median(abs(e.value - med.m)), 6) AS mad,
        |  count(*) AS n
        |FROM events e JOIN med USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // Integer-exact Hampel gate: both engines interpolate integer medians
    // to multiples of 1/2, so doubling before the BIGINT cast is exact and
    // the 2·dev2 > 3·mad4 comparison never touches a float.
    "anomaly_mad" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), med AS (
        |  SELECT event_type, CAST(2 * median(cents) AS BIGINT) AS med2
        |  FROM base GROUP BY 1
        |), dev AS (
        |  SELECT b.event_type, abs(b.cents * 2 - m.med2) AS dev2
        |  FROM base b JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1
        |)
        |SELECT d.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN d.dev2 * 2 > m.mad4 * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  max(m2.med2) AS med2, max(m.mad4) AS mad4
        |FROM dev d JOIN mad m USING (event_type)
        |  JOIN med m2 USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // ntile over tie-broken total orders (metric, user_id) — bucket
    // membership identical across engines, like equidepth_histogram.
    "rfm_segments" ->
      """WITH per_user AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), scored AS (
        |  SELECT cents,
        |    ntile(4) OVER (ORDER BY last_us, user_id) AS r_score,
        |    ntile(4) OVER (ORDER BY freq, user_id) AS f_score,
        |    ntile(4) OVER (ORDER BY cents, user_id) AS m_score
        |  FROM per_user
        |)
        |SELECT r_score, f_score, m_score, count(*) AS n_users,
        |  CAST(sum(cents) AS BIGINT) AS segment_cents
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // lead() over the per-user (epoch_us, event_id) order — ts_ns is
    // μs-aligned so the Spark (ts_ns, event_id) order is identical; the
    // (count DESC, path) sort is total because path is unique post-group.
    "user_path_topk" ->
      """WITH ordered AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |)
        |SELECT event_type || '>' || b || '>' || c AS path,
        |  count(*) AS n_paths
        |FROM ordered WHERE b IS NOT NULL AND c IS NOT NULL
        |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20""".stripMargin,
    // BM25 keeps its ln() (unlike tf-idf's integer surrogate): inputs
    // are exact integer aggregates, the double formula is written in the
    // identical literal shape on both engines, and the 6-dp round
    // absorbs the 1-ulp libm latitude on these irrational scores.
    "bm25_scores" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS term FROM norm
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN ('spark', 'hash', 'vector', 'merge') GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
        |), df AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS tot FROM dl
        |)
        |SELECT doc_id,
        |  round(sum(
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |             (CAST(df AS DOUBLE) + 0.5)) *
        |    (CAST(tf AS DOUBLE) * 2.2) /
        |    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) /
        |      (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6) AS bm25,
        |  count(*) AS n_terms
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "unpivot_metrics" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'quantity' AS metric,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS amount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'extendedprice',
        |    CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount',
        |    CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax',
        |    CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
        |)
        |SELECT l_returnflag, metric, CAST(sum(amount) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // open-order sweep: +1 at o_orderdate's day, -1 the day after the
    // LAST line ships; deltas collapse per epoch-day before the cumsum
    "order_backlog" ->
      """WITH cd AS (
        |  SELECT l_orderkey,
        |    max(CAST(epoch(l_shipdate) AS BIGINT) // 86400) AS cd
        |  FROM lineitem GROUP BY 1
        |), iv AS (
        |  SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS od, cd.cd
        |  FROM orders JOIN cd ON cd.l_orderkey = o_orderkey
        |), d AS (
        |  SELECT od AS day, 1 AS net, 1 AS op, 0 AS cl FROM iv
        |  UNION ALL SELECT cd + 1, -1, 0, 0 FROM iv
        |  UNION ALL SELECT cd, 0, 0, 1 FROM iv
        |), g AS (
        |  SELECT day, CAST(sum(net) AS BIGINT) AS net,
        |    CAST(sum(op) AS BIGINT) AS n_opened,
        |    CAST(sum(cl) AS BIGINT) AS n_closed
        |  FROM d GROUP BY 1
        |)
        |SELECT day, n_opened, n_closed,
        |  CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS backlog
        |FROM g ORDER BY day""".stripMargin,
    // order-local pair census over per-order DISTINCT parts; lift as
    // the exact integer micro floor c_ab·n·1e6 // (c_a·c_b)
    "basket_pairs" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), n AS (
        |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM items
        |), pc AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM items GROUP BY 1
        |), pr AS (
        |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
        |    CAST(count(*) AS BIGINT) AS c_ab
        |  FROM items x JOIN items y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT part_a, part_b, c_ab, a.c AS c_a, b.c AS c_b,
        |  c_ab * n.n_orders * 1000000 // (a.c * b.c) AS lift_micro
        |FROM pr
        |JOIN pc a ON a.l_partkey = part_a
        |JOIN pc b ON b.l_partkey = part_b
        |CROSS JOIN n
        |WHERE c_ab >= 3
        |ORDER BY c_ab DESC, part_a, part_b LIMIT 50""".stripMargin,
    // Gini impurity of each user's type distribution: exact integers,
    // (N² − Σc²)·10⁶ div N²; products ride HUGEINT
    "user_type_gini" ->
      """WITH census AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), per AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(c AS HUGEINT) * c) AS ssq,
        |    count(*) AS n_types
        |  FROM census GROUP BY 1
        |)
        |SELECT user_id, n AS n_events, n_types,
        |  CAST(((CAST(n AS HUGEINT) * n - ssq) * 1000000) //
        |    (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_micro
        |FROM per ORDER BY user_id""".stripMargin,
    "quantiles_by_type" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.75), 6) AS p75,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "salted_hot_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Oracle is the naive inequality join DuckDB plans natively; the Spark
    // side must reproduce it exactly through the bin-bucketed rewrite.
    "range_join_counts" ->
      """SELECT p.event_id, p.user_id, count(c.user_id) AS n_clicks
        |FROM events p
        |LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND epoch_us(c.ts) > epoch_us(p.ts) - 300000000
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin,
    // inner form of range_join_counts (zero-click purchases absent): the
    // Spark side is the NAIVE inequality join, rewritten by the optimizer
    // rule — the hash match proves the rewrite exact, not just plan-shaped.
    "range_join_auto" ->
      """SELECT p.event_id, p.user_id, count(*) AS n_clicks
        |FROM events p
        |JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND epoch_us(c.ts) > epoch_us(p.ts) - 300000000
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin,
    // identical oracle to asof_last_purchase: the native exec must
    // reproduce the declarative operator's answer bit-for-bit
    "asof_exec" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.purchase_id AS last_purchase_id
        |FROM events e
        |ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "asof_last_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.purchase_id AS last_purchase_id
        |FROM events e
        |ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // identical oracle once more: the bucketed sweep/carry form must
    // reproduce the window form's answer bit-for-bit
    "asof_bucketed" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.purchase_id AS last_purchase_id
        |FROM events e
        |ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // merge_asof tolerance= semantics stated as a CASE over plain ASOF:
    // matches older than 1h are as good as no match
    "asof_within" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 3600000000
        |    THEN p.purchase_id END AS last_purchase_id,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 3600000000
        |    THEN epoch_us(e.ts) - epoch_us(p.ts) END AS staleness_us
        |FROM events e
        |ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // Forward direction: DuckDB ASOF with the inequality flipped picks
    // the nearest following row — pandas merge_asof direction='forward'.
    "asof_next_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.purchase_id AS next_purchase_id
        |FROM events e
        |ASOF LEFT JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // nearest direction: both ASOF passes resolved to the closer match,
    // ties (equal distance) to the BACKWARD/earlier row
    "asof_nearest" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), b AS (
        |  SELECT e.event_id, e.user_id, e.ts,
        |    p.purchase_id AS b_id, p.ts AS b_ts
        |  FROM events e
        |  ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts
        |), f AS (
        |  SELECT e.event_id, p.purchase_id AS f_id, p.ts AS f_ts
        |  FROM events e
        |  ASOF LEFT JOIN purchases p
        |    ON e.user_id = p.user_id AND e.ts <= p.ts
        |)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_id IS NULL THEN f_id
        |       WHEN f_id IS NULL THEN b_id
        |       WHEN epoch_us(f_ts) - epoch_us(b.ts)
        |          < epoch_us(b.ts) - epoch_us(b_ts) THEN f_id
        |       ELSE b_id END AS nearest_purchase_id,
        |  CASE WHEN b_id IS NULL THEN epoch_us(f_ts) - epoch_us(b.ts)
        |       WHEN f_id IS NULL THEN epoch_us(b_ts) - epoch_us(b.ts)
        |       WHEN epoch_us(f_ts) - epoch_us(b.ts)
        |          < epoch_us(b.ts) - epoch_us(b_ts)
        |         THEN epoch_us(f_ts) - epoch_us(b.ts)
        |       ELSE epoch_us(b_ts) - epoch_us(b.ts) END AS delta_us
        |FROM b JOIN f USING (event_id)
        |ORDER BY b.event_id""".stripMargin,
    // exact integer interpolation: nonnegative numerator ⇒ truncating
    // division IS floor, so hugeint // matches Spark's decimal div
    "asof_interpolated" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS uts, 1 AS side, event_id,
        |    CAST(NULL AS BIGINT) AS cents, CAST(NULL AS BIGINT) AS rus
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, NULL,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT), epoch_us(ts)
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT *,
        |    last_value(cents IGNORE NULLS) OVER wb AS pc,
        |    last_value(rus IGNORE NULLS) OVER wb AS pus,
        |    first_value(cents IGNORE NULLS) OVER wf AS nc,
        |    first_value(rus IGNORE NULLS) OVER wf AS nus
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY uts, side
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY uts, side DESC
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_id, uts AS us,
        |  CASE WHEN pc IS NULL OR nc IS NULL THEN NULL
        |       WHEN nus = pus THEN pc * 10000
        |       ELSE CAST((CAST(pc AS HUGEINT) * (nus - pus) +
        |         CAST(nc - pc AS HUGEINT) * (uts - pus)) * 10000
        |         // (nus - pus) AS BIGINT) END AS interp_micro
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,
    // one (doc, token) census; TTR and hapax ratios as micro floors
    "lexical_richness" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), census AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax
        |  FROM census GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  coalesce(p.n_tokens, 0) AS n_tokens,
        |  CAST(coalesce(p.n_types, 0) AS BIGINT) AS n_types,
        |  coalesce(p.n_hapax, 0) AS n_hapax,
        |  CASE WHEN coalesce(p.n_tokens, 0) > 0
        |    THEN (p.n_types * 1000000) // p.n_tokens END AS ttr_micro,
        |  CASE WHEN coalesce(p.n_types, 0) > 0
        |    THEN (p.n_hapax * 1000000) // p.n_types END AS hapax_micro
        |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
