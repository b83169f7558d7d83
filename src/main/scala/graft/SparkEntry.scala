package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then rows-only check).
  * Column names/aliases match between the Spark plan and the oracle SQL;
  * float outputs are rounded (6 dp) and window starts emitted as epoch
  * seconds so the hash compare is engine-stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("trends_10min")(spark, "/root/testdata/sf0.001")

  // Filter range for the events-table trends queries: interior of the
  // generated Jan-2024 span at every scale factor, bounds inclusive
  // (reference semantics, trends/listing/service.go:56-57).
  private val TrendsFrom = "2024-01-05 00:00:00"
  private val TrendsTo = "2024-01-25 00:00:00"

  // Written in the common Spark∩DuckDB dialect: these strings are BOTH
  // the oracle and (via the `*_sql` entries) the Spark query itself —
  // one piece of SQL, two engines, hash-matched (graft.Sql parity).
  private val Q1PricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val Q6ForecastSql =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= CAST(0.02 AS DOUBLE) AND l_discount <= CAST(0.04 AS DOUBLE)
      |  AND l_quantity < 10""".stripMargin

  // ── Cross-query memo (one process = one Bench/Verify run) ──
  /** Checkpoint RDD ids the per-query unpersist sweep in Bench/Verify
    * must SKIP: the memoized relations below are consumed by several
    * queries in the same process (dedup_groups, dedup_groups_best and
    * leakage_safe_split all start from one LSH+CC groups prefix) — a
    * localCheckpoint has truncated lineage, so sweeping its blocks would
    * strand every later reader, not just waste a recompute. */
  val pinnedRddIds: java.util.Set[Integer] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  private val groupsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Double), DataFrame]()

  private val centroidsMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), Array[Array[Double]]]()

  private val bandStoreMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), String]()

  /** Banded LSH index persisted ONCE per (SparkContext, corpus dir) via
    * `EmbeddingStore.writeBanded` — the write-time state the
    * cross-corpus semantic check probes. The indexed corpus is the
    * store split the gated query checks against (vec_id ≢ 0 mod 5);
    * queries pay only the batch-side signatures + the probe. */
  private def bandStoreFor(s: SparkSession, dir: String): String =
    bandStoreMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_emb_index").toString
        graft.store.EmbeddingStore.writeBanded(
          Tables.embeddings(s, dir).filter(pmod(col("vec_id"), lit(5)) =!= 0),
          path)
        path
      })

  /** IVF centroids trained ONCE per (SparkContext, corpus dir) — the
    * write-time clustering (`store.EmbeddingStore`); the `ann_ivf_topk`
    * serving path probes them without re-training, mirroring how a real
    * index is built on ingest and read by every query. Driver-sized
    * (nCentroids × dims doubles), so no RDD pinning involved. */
  private def centroidsFor(s: SparkSession,
      dir: String): Array[Array[Double]] =
    centroidsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir),
      _ => Similarity.kmeansCentroids(Tables.embeddings(s, dir)))

  private val pqMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), Array[Array[Array[Double]]]]()

  /** PQ codebooks fit ONCE per (SparkContext, corpus dir) — the
    * write-time quantizer state the encode query and the aux dump
    * share, same lifecycle as [[centroidsFor]]. */
  private def pqFor(s: SparkSession,
      dir: String): Array[Array[Array[Double]]] =
    pqMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir),
      _ => Similarity.pqCodebooks(Tables.embeddings(s, dir)))

  private val postingsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  private val overlapMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The (doc_id, shingle) postings table shingled ONCE per
    * (SparkContext, corpus dir) and localCheckpointed — the family
    * prefix under ngram_jaccard_pairs, containment_pairs and
    * minhash_lsh_pairs, which otherwise each re-tokenize the corpus
    * (the bm25 exchange-reuse lesson applied ACROSS queries: share the
    * materialization, not just the plan subtree). */
  private def postingsFor(s: SparkSession, dir: String): DataFrame =
    postingsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val p = Dedup.postings(Tables.documents(s, dir), 3)
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        p
      })

  /** The candidate-overlap relation (pairs + shared-shingle counts +
    * sizes) computed ONCE over [[postingsFor]] — the jaccard and
    * containment scorers differ only ABOVE this generator. */
  private def overlapFor(s: SparkSession, dir: String): DataFrame =
    overlapMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val o = Dedup.overlapWithSizesFrom(postingsFor(s, dir))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        o
      })

  private val dupStartsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The duplicated length-20-window start relation materialized ONCE
    * per (SparkContext, corpus dir) — the family prefix under
    * dup_substrings (span report) and dup_substrings_apply (cleaned
    * corpus), which otherwise each re-census the L-gram windows. */
  private def dupStartsFor(s: SparkSession, dir: String): DataFrame =
    dupStartsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val p = Dedup.dupStarts(Tables.documents(s, dir), 20)
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        p
      })

  private val positionsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The (doc_id, pos, sh) word-trigram OCCURRENCE census tokenized ONCE
    * per (SparkContext, corpus dir) and localCheckpointed — the
    * positions-bearing sibling of [[postingsFor]], the family prefix
    * under winnow_pairs and dup_spans (both need positions, so they can
    * never join the distinct postings prefix; before this memo each
    * re-ran normalize + the trigram posexplode over the corpus). */
  private def positionsFor(s: SparkSession, dir: String): DataFrame =
    positionsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        import graft.functions.TextOps.normalize
        import graft.functions.WordShingles.word_ngrams
        val before = s.sparkContext.getPersistentRDDs.keySet
        val p = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(word_ngrams(normalize(col("text")), 3))
              .as(Seq("pos", "sh")))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        p
      })

  private val docBucketsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The (doc_id, bucket) corpus-order decile relation ranked ONCE per
    * (SparkContext, corpus dir) and localCheckpointed — the family
    * prefix under vocab_growth and ngram_growth, which rank the SAME
    * doc relation into the SAME ten arrival buckets; before this memo
    * each curve re-ran the closed-form ranker's stats + histogram +
    * checkpoint passes (the round-7 bench regression: 0.72→1.62 s /
    * 0.66→1.28 s when the curves moved off the global-ntile window). */
  private def docBucketsFor(s: SparkSession, dir: String): DataFrame =
    docBucketsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val b = graft.operators.Ranks.withNtileBucket(
          Tables.documents(s, dir).select(col("doc_id")),
          10, col("doc_id"), Nil, "bucket")
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        b
      })

  private val bigramsMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The (doc_id, b) word-bigram OCCURRENCE table tokenized ONCE per
    * (SparkContext, corpus dir) and localCheckpointed — the family
    * prefix under lm_perplexity, lm_coverage, dsir_weights,
    * gopher_repetition and bigram_pmi, which otherwise each re-run
    * normalize + the bigram explode over the corpus (the postingsFor
    * lesson applied to the bigram family: one tokenize, many readers;
    * distinct-per-doc and hashed-bucket views all DERIVE from the
    * occurrence table). */
  private def bigramsFor(s: SparkSession, dir: String): DataFrame =
    bigramsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        import graft.functions.TextOps.normalize
        import graft.functions.WordShingles.word_ngrams
        val before = s.sparkContext.getPersistentRDDs.keySet
        val b = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(word_ngrams(normalize(col("text")), 2)).as("b"))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        b
      })

  private val tokensMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The (doc_id, tok) word-token OCCURRENCE table tokenized ONCE per
    * (SparkContext, corpus dir) and localCheckpointed — the unigram
    * sibling of [[bigramsFor]], the family prefix under the vocabulary/
    * richness/tf-idf consumers. Corpus-level, per-source (via a
    * broadcast doc→source join) and per-doc census views all DERIVE
    * from the occurrence table. */
  private def tokensFor(s: SparkSession, dir: String): DataFrame =
    tokensMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        import graft.functions.TextOps.tokens
        val before = s.sparkContext.getPersistentRDDs.keySet
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        t
      })

  private val bpeMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), (Seq[(Long, String, Long)], DataFrame)]()

  /** BPE training (merge table + final rewritten corpus) run ONCE per
    * (SparkContext, corpus dir) — `bpe_merges` serves the table,
    * `bpe_encode` the per-doc encodings, off one training run (the
    * dedup-family prefix pattern: share the materialization). The final
    * corpus stays persisted (bpeTrain's own persist) and its blocks are
    * pinned against the per-query sweep; its lineage is only `steps`
    * chained replaces off the scan, so an eviction costs one replay,
    * not a quadratic loop. */
  private def bpeFor(s: SparkSession,
      dir: String): (Seq[(Long, String, Long)], DataFrame) =
    bpeMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val (learned, fin) =
          TextAnalysis.bpeTrain(Tables.documents(s, dir), 5)
        fin.count() // materialize before pinning
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        (learned, fin)
      })

  private val fracMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The graded-decontamination fraction relation computed ONCE per
    * (SparkContext, corpus dir) — `decontaminate_frac` serves it
    * directly and `contamination_deciles` rolls it up, off one scoring
    * run (the dedup-family prefix pattern). */
  private def fracFor(s: SparkSession, dir: String): DataFrame =
    fracMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val f = TextAnalysis
          .decontaminationFraction(Tables.documents(s, dir))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        f
      })

  /** Near-dup groups (Dedup.dedupGroups) computed ONCE per
    * (SparkContext, corpus dir, threshold) and localCheckpointed — the
    * production shape: run the expensive LSH + connected-components
    * prefix once, then serve every downstream consumer (keep-best,
    * leakage-safe split, the groups listing itself) from the
    * materialized result. All checkpoint blocks the build creates are
    * pinned against the sweep. */
  private val lshCandMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** The distinct LSH band-collision candidate relation built ONCE per
    * (SparkContext, corpus dir) over [[postingsFor]] — the 64-hash
    * signature build is the expensive half of the minhash gate, and
    * both `minhash_lsh_pairs` (verify stage) and `blocking_quality`
    * (candidate counting) consume the same relation. */
  private def lshCandidatesFor(s: SparkSession, dir: String): DataFrame =
    lshCandMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val c = Dedup.lshCandidatesFrom(postingsFor(s, dir))
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        c
      })

  private def groupsFor(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    groupsMemo.computeIfAbsent(
      (System.identityHashCode(s.sparkContext), dir, threshold), _ => {
        val before = s.sparkContext.getPersistentRDDs.keySet
        val g = Dedup.dedupGroups(Tables.documents(s, dir), threshold)
          .localCheckpoint(true)
        (s.sparkContext.getPersistentRDDs.keySet -- before)
          .foreach(id => pinnedRddIds.add(id))
        g
      })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Flagship: 10-min tumbling window min/max/avg/median (SURVEY §2.3) ──
    "trends_10min" -> ((s, dir) =>
      Trends.trendsOf(Tables.events(s, dir), "ts", "event_type", "purchase",
        "value", TrendsFrom, TrendsTo)),

    // Sliding (overlapping) 10-min windows every 5 min — the capability
    // step past the reference's tumbling-only flagship; each event lands
    // in exactly two windows.
    "trends_sliding" -> ((s, dir) =>
      Trends.trendsOf(Tables.events(s, dir), "ts", "event_type", "purchase",
        "value", TrendsFrom, TrendsTo, slide = Some("5 minutes"))),

    // Calendar-spine gap fill: every 10-min slot present, quiet slots as
    // n=0 — the serving-tier completion of the flagship series.
    "trends_gapfill" -> ((s, dir) =>
      Trends.trendsGapfill(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),
    "trends_gapfill_locf" -> ((s, dir) =>
      Trends.trendsGapfillLocf(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),

    // 1-hour trailing moving average over the 10-min series.
    "trends_moving_avg" -> ((s, dir) =>
      Trends.trendsMovingAvg(Tables.events(s, dir), "ts", "event_type",
        "purchase", "value", TrendsFrom, TrendsTo)),

    // ClickHouse-median parity variant: same window aggregate with the
    // custom bottom-k TypedImperativeAggregate. The selection hash is the
    // portable h60 of the value floored onto the micros grid, so the
    // DuckDB oracle rebuilds the IDENTICAL sample (rank by the same md5
    // prefix, keep rn ≤ k) and hash-matches the sketch's error — the same
    // technique that gates vocab_cms/kmv_distinct. Quantizing the sketch
    // INPUT to micros is the documented contract of the approx variant
    // (the exact-median query `trends_10min` is unquantized).
    "trends_10min_approx" -> { (s, dir) =>
      import graft.functions.ApproxQuantile.keyed_median_sketch
      import graft.functions.PortableHash.h60
      val vm = floor(col("value") * lit(1e6)).cast("long")
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("__vm", vm)
        .withColumn("__h", h60(col("__vm").cast("string")))
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(
          (keyed_median_sketch(col("__h"), col("__vm").cast("double")) /
            lit(1000000.0)).as("median_approx"),
          count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("window_start"),
          col("median_approx"), col("n"))
        .orderBy(col("window_start"))
    },

    // ── Ingest chain T1-T6: wire JSON → validated, normalized trade rows ──
    // Wire messages are synthesized deterministically from `events`, with the
    // timestamp formatted in UPPERCASE month to exercise Go-style
    // case-insensitive parsing; the oracle recomputes the normalization
    // directly from the source columns, so a hash match proves the whole
    // JSON→typed chain (micros truncation, rate derivation, ts parse).
    "trade_ingest" -> { (s, dir) =>
      // the events file fits one scan partition; spread the CPU-bound
      // JSON serialize/parse chain across cores before it starts
      val nCores = s.sparkContext.defaultParallelism
      val wire = Tables.events(s, dir).repartition(nCores).select(to_json(struct(
        col("event_id").cast("string").as("userId"),
        upper(substring(col("event_type"), 1, 3)).as("currencyFrom"),
        lit("USD").as("currencyTo"),
        col("value").as("amountSell"),
        (col("value") * lit(1.5)).as("amountBuy"),
        lit(0.0).as("rate"), // ignored by ingest, recomputed
        upper(date_format(col("ts"), model.TimePlacedFormat)).as("timePlaced"),
        lit("US").as("originatingCountry"))).as("json"))
      TradeIngest.parseTrades(wire)
        .filter(col("amount_sell_micros") =!= 0) // ÷0→Inf covered in unit tests; DuckDB yields NULL
        .select(
          col("user_id"), col("currency_from"), col("currency_to"),
          col("amount_sell_micros"), col("amount_buy_micros"),
          round(col("rate"), 6).as("rate"),
          col("originating_country"),
          col("time_placed").cast("long").as("time_placed_s"))
        .orderBy(col("user_id").cast("long"))
    },

    // ── S4: protobuf wire-format round-trip (hand-rolled proto3 codec) ──
    // Trades synthesized from events; encode → decode must be identity AND
    // the byte length must match the oracle's independent arithmetic over
    // the wire format (tag bytes + LEB128 varint widths + field omission),
    // so the bytes themselves are oracle-checked, not just the values.
    // Some rows exercise proto3 default omission (empty country, zero buy).
    "trade_proto_roundtrip" -> { (s, dir) =>
      import graft.functions.ProtoTrade.{proto_decode_trade, proto_encode_trade}
      val nCores = s.sparkContext.defaultParallelism
      val src = Tables.events(s, dir).repartition(nCores).select(
        col("event_id").cast("string").as("user_id"),
        upper(substring(col("event_type"), 1, 3)).as("currency_from"),
        lit("USD").as("currency_to"),
        (col("value") * lit(1e6)).cast("long").as("amount_sell_micros"),
        when(col("event_id") % 7 === 0, lit(0L))
          .otherwise((col("value") * lit(1.5) * lit(1e6)).cast("long"))
          .as("amount_buy_micros"),
        unix_millis(col("ts")).as("time_placed_ms"),
        when(col("event_id") % 10 === 0, lit(""))
          .otherwise(lit("US")).as("originating_country"))
      src
        .select(proto_encode_trade(col("user_id"), col("currency_from"),
          col("currency_to"), col("amount_sell_micros"),
          col("amount_buy_micros"), col("time_placed_ms"),
          col("originating_country")).as("pb"))
        .select(proto_decode_trade(col("pb")).as("tr"),
          length(col("pb")).cast("long").as("pb_len"))
        .select(col("tr.user_id").as("user_id"),
          col("tr.currency_from").as("currency_from"),
          col("tr.currency_to").as("currency_to"),
          col("tr.amount_sell_micros").as("amount_sell_micros"),
          col("tr.amount_buy_micros").as("amount_buy_micros"),
          col("tr.time_placed_ms").as("time_placed_ms"),
          col("tr.originating_country").as("originating_country"),
          col("pb_len"))
        .orderBy(col("user_id").cast("long"))
    },

    // ── Relational breadth (SURVEY §2 extension: joins/topk/distinct/window) ──
    "q1_pricing" -> ((s, dir) => Relational.q1Pricing(Tables.lineitem(s, dir))),
    "q3_shipping" -> ((s, dir) => Relational.q3Shipping(
      Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_region_revenue" -> ((s, dir) => Relational.q5RegionRevenue(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "topk_orders" -> ((s, dir) => Relational.topkOrders(Tables.orders(s, dir))),
    "q14_promo_share" -> ((s, dir) => Relational.q14PromoShare(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q17_small_quantity" -> ((s, dir) => Relational.q17SmallQuantity(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "group_distinct" -> ((s, dir) => Relational.groupDistinct(Tables.orders(s, dir))),
    "rollup_revenue" -> ((s, dir) => Relational.rollupRevenue(Tables.orders(s, dir))),
    "grouping_sets_revenue" -> ((s, dir) => Relational.groupingSetsRevenue(Tables.orders(s, dir))),
    "cube_revenue" -> ((s, dir) => Relational.cubeRevenue(Tables.orders(s, dir))),
    "exists_shapes" -> ((s, dir) => Relational.existsShapes(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "pivot_status_counts" -> ((s, dir) => Relational.pivotStatusCounts(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "window_top_orders" -> ((s, dir) => Relational.windowTopOrders(Tables.orders(s, dir))),
    "rank_bands" -> ((s, dir) => Relational.rankBands(Tables.orders(s, dir))),
    "customer_value_deciles" -> ((s, dir) =>
      Relational.customerValueDeciles(Tables.orders(s, dir))),
    "q10_returned" -> ((s, dir) => Relational.q10Returned(
      Tables.customer(s, dir), Tables.orders(s, dir),
      Tables.lineitem(s, dir), Tables.nation(s, dir))),
    "nation_activity_full" -> ((s, dir) => Relational.nationActivityFull(
      Tables.customer(s, dir), Tables.supplier(s, dir))),
    "doc_set_ops" -> ((s, dir) => Relational.docSetOps(Tables.documents(s, dir))),
    "q18_big_orders" -> ((s, dir) => Relational.q18BigOrders(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q4_priority_counts" -> ((s, dir) => Relational.q4PriorityCounts(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q6_forecast" -> ((s, dir) => Relational.q6Forecast(Tables.lineitem(s, dir))),
    // SQL-text dispatch parity (graft.Sql): the oracle string IS the query
    "q1_pricing_sql" -> ((s, dir) => Sql.run(s, dir, Q1PricingSql)),
    "q6_forecast_sql" -> ((s, dir) => Sql.run(s, dir, Q6ForecastSql)),
    "q7_nation_volume" -> ((s, dir) => Relational.q7NationVolume(
      Tables.nation(s, dir), Tables.customer(s, dir), Tables.orders(s, dir),
      Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "q13_custdist" -> ((s, dir) => Relational.q13CustDist(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "q19_disjunctive" -> ((s, dir) => Relational.q19Disjunctive(
      Tables.lineitem(s, dir), Tables.part(s, dir))),
    "q22_idle_rich" -> ((s, dir) => Relational.q22IdleRich(
      Tables.customer(s, dir), Tables.orders(s, dir))),
    "customer_price_drift" -> ((s, dir) =>
      Relational.customerPriceDrift(Tables.orders(s, dir))),
    "q21_late_suppliers" -> ((s, dir) => Relational.q21LateSuppliers(
      Tables.supplier(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q15_top_supplier" -> ((s, dir) => Relational.q15TopSupplier(
      Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    "q11_important_nations" -> ((s, dir) => Relational.q11ImportantNations(
      Tables.customer(s, dir), Tables.orders(s, dir), Tables.nation(s, dir))),
    "q2_min_cost_supplier" -> ((s, dir) => Relational.q2MinCostSupplier(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q8_market_share" -> ((s, dir) => Relational.q8MarketShare(
      Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
      Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir))),
    "q9_profit_shape" -> ((s, dir) => Relational.q9ProfitShape(
      Tables.nation(s, dir), Tables.supplier(s, dir), Tables.lineitem(s, dir),
      Tables.part(s, dir), Tables.orders(s, dir))),
    "q12_ship_delay" -> ((s, dir) => Relational.q12ShipDelay(
      Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q16_supplier_cnt" -> ((s, dir) => Relational.q16SupplierCnt(
      Tables.supplier(s, dir), Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q20_bulk_shippers" -> ((s, dir) => Relational.q20BulkShippers(
      Tables.supplier(s, dir), Tables.nation(s, dir), Tables.part(s, dir),
      Tables.lineitem(s, dir))),

    // ── Events: JSON extraction + declarative rate-limit window (ST6) ──
    "events_json_agg" -> ((s, dir) => EventsOps.jsonExtractAgg(Tables.events(s, dir))),
    "rate_limit_flags" -> ((s, dir) => EventsOps.rateLimitFlags(Tables.events(s, dir))),
    "events_sessionize" -> ((s, dir) => EventsOps.sessionize(Tables.events(s, dir))),
    "event_gaps" -> ((s, dir) => EventsOps.eventGaps(Tables.events(s, dir))),
    "mode_by_type" -> ((s, dir) => EventsOps.modeByType(Tables.events(s, dir))),
    "user_event_types" -> ((s, dir) => EventsOps.userEventTypes(Tables.events(s, dir))),
    "latest_events" -> ((s, dir) => EventsOps.latestEvents(Tables.events(s, dir))),
    "kmv_distinct" -> ((s, dir) => EventsOps.kmvDistinct(Tables.events(s, dir))),
    "hll_distinct" -> ((s, dir) => EventsOps.hllDistinct(Tables.events(s, dir))),
    "dispersion_by_type" -> ((s, dir) =>
      EventsOps.dispersionByType(Tables.events(s, dir))),
    "moments_by_type" -> ((s, dir) =>
      EventsOps.momentsByType(Tables.events(s, dir))),
    "value_trend_by_type" -> ((s, dir) =>
      EventsOps.valueTrendByType(Tables.events(s, dir))),
    "scd2_intervals" -> ((s, dir) =>
      EventsOps.scd2Intervals(Tables.events(s, dir))),
    "winsorize_values" -> ((s, dir) =>
      EventsOps.winsorizeByType(Tables.events(s, dir))),
    "quantiles_disc_by_type" -> ((s, dir) =>
      EventsOps.quantilesDiscByType(Tables.events(s, dir))),
    "trends_zscore" -> ((s, dir) => Trends.trendsZscore(Tables.events(s, dir),
      "ts", "event_type", "purchase", "value", TrendsFrom, TrendsTo)),
    "funnel_steps" -> ((s, dir) => EventsOps.funnelSteps(Tables.events(s, dir))),
    // 6 h window: the widest level split on this corpus timeline
    // (3600 s leaves level 3 degenerate-zero, a week saturates all three)
    "funnel_window" -> ((s, dir) =>
      EventsOps.funnelWindow(Tables.events(s, dir), windowSec = 21600L)),
    "max_concurrency" -> ((s, dir) =>
      EventsOps.maxConcurrency(Tables.events(s, dir))),
    "survival_retention" -> ((s, dir) =>
      EventsOps.survivalRetention(Tables.events(s, dir))),
    "retention_cohorts" -> ((s, dir) =>
      EventsOps.retentionCohorts(Tables.events(s, dir))),
    "revenue_share" -> ((s, dir) => Relational.revenueShare(
      Tables.orders(s, dir), Tables.customer(s, dir), Tables.nation(s, dir))),
    "integrity_checksum" -> ((s, dir) =>
      TextAnalysis.integrityChecksum(Tables.documents(s, dir))),
    "fk_orphans" -> ((s, dir) => Relational.fkOrphans(
      Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir),
      Tables.part(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),
    "benford_values" -> ((s, dir) =>
      EventsOps.benfordValues(Tables.events(s, dir))),
    // version diff between two deterministic synthetic drops of the one
    // corpus: old = all but doc_id≡3 (mod 11); new = all but ≡7
    // (mod 11), with doc_id≡0 (mod 5) texts rewritten — exercises all
    // four statuses with an exactly mirrorable oracle
    "corpus_diff" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextAnalysis.corpusDiff(
        docs.filter(pmod(col("doc_id"), lit(11)) =!= 3),
        docs.filter(pmod(col("doc_id"), lit(11)) =!= 7)
          .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
    },
    "value_histogram" -> ((s, dir) => EventsOps.valueHistogram(Tables.events(s, dir))),
    "equidepth_histogram" -> ((s, dir) => EventsOps.equidepthHistogram(Tables.events(s, dir))),
    "event_transitions" -> ((s, dir) => EventsOps.eventTransitions(Tables.events(s, dir))),

    // ── Market-analytics family (MarketStats): the standard market-data
    // surface over the tick stream — OHLC candles, volume/time-weighted
    // prices, realized variation, drawdown, cross-pair correlation. All
    // float answers come from exact DECIMAL sums + one IEEE op. ──
    "ohlc_bars" -> ((s, dir) => MarketStats.ohlcBars(Tables.events(s, dir))),
    "vwap_hourly" -> ((s, dir) => MarketStats.vwap(Tables.events(s, dir))),
    "twap_daily" -> ((s, dir) => MarketStats.twap(Tables.events(s, dir))),
    "realized_variation" -> ((s, dir) =>
      MarketStats.realizedVariation(Tables.events(s, dir))),
    "max_drawdown" -> ((s, dir) => MarketStats.maxDrawdown(Tables.events(s, dir))),
    "pair_correlation" -> ((s, dir) =>
      MarketStats.pairCorrelation(Tables.events(s, dir))),
    "pair_correlation_daily" -> ((s, dir) =>
      MarketStats.pairCorrelationDaily(Tables.events(s, dir))),
    "obv_daily" -> ((s, dir) => MarketStats.obvDaily(Tables.events(s, dir))),
    "stochastic_k" -> ((s, dir) =>
      MarketStats.stochasticK(Tables.events(s, dir))),
    "kyle_lambda" -> ((s, dir) =>
      MarketStats.kyleLambda(Tables.events(s, dir))),
    "ret_autocorr" -> ((s, dir) =>
      MarketStats.retAutocorr(Tables.events(s, dir))),
    "money_flow_index" -> ((s, dir) =>
      MarketStats.moneyFlowIndex(Tables.events(s, dir))),
    "chaikin_ad" -> ((s, dir) =>
      MarketStats.chaikinAd(Tables.events(s, dir))),
    "ulcer_index" -> ((s, dir) =>
      MarketStats.ulcerIndex(Tables.events(s, dir))),
    "tick_burstiness" -> ((s, dir) =>
      MarketStats.tickBurstiness(Tables.events(s, dir))),
    "ret_moments" -> ((s, dir) =>
      MarketStats.retMoments(Tables.events(s, dir))),
    "range_volatility" -> ((s, dir) =>
      MarketStats.rangeVolatility(Tables.events(s, dir))),
    "variance_ratio" -> ((s, dir) =>
      MarketStats.varianceRatio(Tables.events(s, dir))),
    "market_beta" -> ((s, dir) =>
      MarketStats.marketBeta(Tables.events(s, dir))),
    "vpin_buckets" -> ((s, dir) =>
      MarketStats.vpinBuckets(Tables.events(s, dir))),
    "roll_spread" -> ((s, dir) =>
      MarketStats.rollSpread(Tables.events(s, dir))),
    "vol_signature" -> ((s, dir) =>
      MarketStats.volSignature(Tables.events(s, dir))),
    "bigram_pmi" -> ((s, dir) => TextAnalysis.bigramPmi(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)),
      toks = Some(tokensFor(s, dir)))),
    "ret_acf" -> ((s, dir) =>
      MarketStats.retAcf(Tables.events(s, dir))),
    "hurst_rs" -> ((s, dir) =>
      MarketStats.hurstRs(Tables.events(s, dir))),
    "theil_sen_trend" -> ((s, dir) =>
      MarketStats.theilSenTrend(Tables.events(s, dir))),
    "drawdown_durations" -> ((s, dir) =>
      MarketStats.drawdownDurations(Tables.events(s, dir))),
    "markout_curve" -> ((s, dir) =>
      MarketStats.markoutCurve(Tables.events(s, dir))),
    "lead_lag_corr" -> ((s, dir) =>
      MarketStats.leadLagCorr(Tables.events(s, dir))),
    "trimmed_mean" -> ((s, dir) =>
      EventsOps.trimmedMeanByType(Tables.events(s, dir))),
    "type_pair_lift" -> ((s, dir) =>
      EventsOps.typePairLift(Tables.events(s, dir))),
    "user_communities" -> ((s, dir) =>
      EventsOps.userCommunities(Tables.events(s, dir))),
    "session_stats" -> ((s, dir) =>
      EventsOps.sessionStats(Tables.events(s, dir))),
    "volume_hhi" -> ((s, dir) =>
      EventsOps.volumeHhi(Tables.events(s, dir))),
    "temporal_copresence" -> ((s, dir) =>
      EventsOps.temporalCopresence(Tables.events(s, dir))),
    "user_type_gini" -> ((s, dir) =>
      EventsOps.userTypeGini(Tables.events(s, dir))),
    "lexical_richness" -> ((s, dir) => TextAnalysis.lexicalRichness(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
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
    "profile_lineitem" -> ((s, dir) =>
      Profiling.profile(Tables.lineitem(s, dir))),
    // the scale path demonstrated AND oracle-gated: the register-exact
    // portable-HLL profile — sketch state is h60 registers the oracle
    // rebuilds from the raw data, so hash_match replaces the old
    // rows-only gate (Spark's HLL++ stays as the spec-gated built-in
    // alternative in ProfilingSpec: one scan, no Expand, error envelope)
    "profile_lineitem_approx" -> ((s, dir) =>
      Profiling.profilePortable(Tables.lineitem(s, dir))),
    // same operator, different schema — the generic claim gated thrice
    "profile_documents" -> ((s, dir) =>
      Profiling.profile(Tables.table(s, dir, "documents"))),
    "profile_events" -> ((s, dir) =>
      Profiling.profile(Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))),
    "bm25_scores" -> ((s, dir) => TextAnalysis.bm25Scores(Tables.documents(s, dir))),
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
      if (!s.experimental.extraOptimizations.contains(rule))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ rule
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
        .orderBy(col("event_type"))),

    // ── Dedup family (training-data pipeline) ──
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    // the candidate-join family fans out from one shingled prefix
    // (postingsFor), jaccard + containment additionally from one
    // overlap generator (overlapFor)
    "ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairsFrom(overlapFor(s, dir), threshold = 0.8)),
    "tf_cosine_pairs" -> ((s, dir) => Dedup.tfCosinePairs(
      Tables.documents(s, dir), positions = Some(positionsFor(s, dir)))),
    "tfidf_cosine_pairs" -> ((s, dir) => Dedup.tfidfCosinePairs(
      Tables.documents(s, dir), positions = Some(positionsFor(s, dir)))),
    "minhash_lsh_pairs" -> ((s, dir) => Dedup.minhashVerifyFrom(
      lshCandidatesFor(s, dir), postingsFor(s, dir), threshold = 0.8)),
    "blocking_quality" -> ((s, dir) => Dedup.blockingQuality(
      Tables.documents(s, dir), postingsFor(s, dir), overlapFor(s, dir),
      candidates = Some(lshCandidatesFor(s, dir)))),
    // the groups consumers share one memoized LSH+CC prefix
    "dedup_groups" -> ((s, dir) => groupsFor(s, dir, 0.8)),
    "source_dup_rate" -> ((s, dir) => Dedup.sourceDupRate(
      Tables.documents(s, dir), groupsFor(s, dir, 0.8))),
    "dedup_group_sizes" -> ((s, dir) =>
      groupsFor(s, dir, 0.8)
        .groupBy(col("rep_id")).agg(count(lit(1)).as("group_size"))
        .groupBy(col("group_size")).agg(count(lit(1)).as("n_groups"))
        .orderBy(col("group_size"))),
    "dedup_groups_best" -> ((s, dir) =>
      Dedup.dedupGroupsBestFrom(Tables.documents(s, dir),
        groupsFor(s, dir, 0.8))),
    "leakage_safe_split" -> ((s, dir) =>
      Dedup.leakageSafeSplitFrom(Tables.documents(s, dir),
        groupsFor(s, dir, 0.8))),
    // incoming batch (doc_id ≡ 0 mod 5) checked against the store (rest)
    "dedup_against" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.dedupAgainst(docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), threshold = 0.8)
    },
    "containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairsFrom(overlapFor(s, dir), threshold = 0.6)),
    "jaccard_histogram" -> ((s, dir) =>
      Dedup.jaccardHistogramFrom(overlapFor(s, dir))),
    "line_dedup" -> ((s, dir) =>
      Dedup.lineDedup(Tables.documents(s, dir))),
    // Lee et al. exact-substring dedup: the removable (doc_id, start,
    // len) spans — union of duplicated length-20 token windows — and
    // the APPLY half emitting the cleaned corpus; both ride the
    // memoized duplicated-starts prefix
    "dup_substrings" -> ((s, dir) =>
      Dedup.dupSubstrings(Tables.documents(s, dir),
        starts = Some(dupStartsFor(s, dir)))),
    "dup_substrings_apply" -> ((s, dir) =>
      Dedup.dupSubstringsApply(Tables.documents(s, dir),
        starts = Some(dupStartsFor(s, dir)))),
    "simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3)),
    "embedding_dups" -> ((s, dir) =>
      Dedup.embeddingCosineDups(Tables.embeddings(s, dir), threshold = 0.3)),
    "edit_distance_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir))),
    // corpus-level source×source distinct-shingle overlap via mergeable
    // bottom-k sketches — oracle-exact including the sketch error
    "corpus_overlap_kmv" -> ((s, dir) =>
      Dedup.corpusOverlapKmv(Tables.documents(s, dir))),

    // ── Similarity search over embeddings ──
    "ann_topk" -> ((s, dir) => Similarity.annBruteForce(Tables.embeddings(s, dir))),
    "ann_lsh_topk" -> ((s, dir) => Similarity.annLsh(Tables.embeddings(s, dir))),
    // Gated by a full oracle: the write-time index state (centroids +
    // cell assignments) is dumped as aux parquet by Verify — it is DATA
    // the index wrote at ingest, like the tables themselves — and DuckDB
    // independently recomputes the probe lists and the exact cosine
    // top-k over the probed cells (see `auxTables`).
    "ann_ivf_topk" -> ((s, dir) =>
      Similarity.annIvfWith(Tables.embeddings(s, dir),
        centroidsFor(s, dir))),
    // IVF-PQ ADC serving path: candidates scored from their m-byte PQ
    // codes alone; the oracle replays BOTH the cell and the code
    // assignments from the __AUX__ centroid/codebook dumps and states
    // the same fixed-order ADC arithmetic.
    "ann_ivf_pq_topk" -> ((s, dir) =>
      Similarity.annIvfPq(Tables.embeddings(s, dir),
        centroidsFor(s, dir), pqFor(s, dir))),
    // full serving chain: ADC shortlist (same replayed probe/cell/code
    // state, rank ≤ 50) → exact-cosine re-rank of the fetched vectors
    "ann_pq_refine" -> ((s, dir) =>
      Similarity.annIvfPqRefine(Tables.embeddings(s, dir),
        centroidsFor(s, dir), pqFor(s, dir))),
    // recall@10 of the IVF index vs the exact scorer — the audit that
    // gates a probe configuration before serving
    "ann_recall" -> ((s, dir) =>
      Similarity.annRecall(
        Similarity.annBruteForce(Tables.embeddings(s, dir)),
        Similarity.annIvfWith(Tables.embeddings(s, dir),
          centroidsFor(s, dir)))),
    "embedding_cov" -> ((s, dir) =>
      Similarity.embeddingCov(Tables.embeddings(s, dir))),
    // top principal direction: exact-integer power method over the
    // embedding_cov cells; driver arithmetic is corpus-size-independent
    "pca_power" -> ((s, dir) =>
      Similarity.pcaPower(Tables.embeddings(s, dir))),
    "quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir))),
    "pq_encode" -> ((s, dir) =>
      Similarity.pqEncode(Tables.embeddings(s, dir), pqFor(s, dir))),
    "hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir))),
    "ivf_purity" -> ((s, dir) =>
      Similarity.ivfPurity(Tables.embeddings(s, dir), centroidsFor(s, dir))),
    // quantizer-boundary health: per-cell mean assignment margin on the
    // exact integer micro grid — bit-replayable from the centroid dump
    "ivf_margin" -> ((s, dir) =>
      Similarity.ivfMargin(Tables.embeddings(s, dir), centroidsFor(s, dir))),
    // cluster-balanced subset selection: fixed h60-priority quota per
    // IVF cell — every embedding mode represented regardless of mass
    "diversity_sample" -> ((s, dir) =>
      Similarity.diversitySample(Tables.embeddings(s, dir),
        centroidsFor(s, dir))),
    // per-cluster corpus map: doc/char mass, dominant source + share,
    // language spread — the read before acting on a clustering
    "cluster_profile" -> ((s, dir) =>
      Similarity.clusterProfile(Tables.embeddings(s, dir),
        centroidsFor(s, dir), Tables.documents(s, dir))),
    // PQ codebook health: per (subspace, code) occupancy and mean
    // quantized cosine fidelity — bit-replayable from the codebook dump
    "pq_cell_stats" -> ((s, dir) =>
      Similarity.pqCellStats(Tables.embeddings(s, dir), pqFor(s, dir))),
    // rnn_pairs DEFAULT = the bounded LSH retriever (hot-bucket df-cut
    // guard on); the corpus² brute survives only as the explicit
    // audit-scoped entry below, never as what a user reaches first
    "rnn_pairs" -> ((s, dir) =>
      Similarity.mutualKnn(Tables.embeddings(s, dir))),
    "rnn_pairs_exact" -> ((s, dir) =>
      Similarity.mutualKnnExact(Tables.embeddings(s, dir))),
    "mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(Tables.embeddings(s, dir))),

    // ── Deterministic sampling (training-data selection) ──
    "sample_hash" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.hashSample(Tables.documents(s, dir), permille = 100)
    }),
    "stratified_sample" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.stratifiedSample(Tables.documents(s, dir))
    }),
    "source_quota" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.sourceQuota(Tables.documents(s, dir), quota = 50)
    }),
    "pack_sequences" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.packSequences(Tables.documents(s, dir))
    }),
    "pack_spans" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.packSequenceSpans(Tables.documents(s, dir))
    }),
    "priority_sample" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.prioritySample(Tables.documents(s, dir), k = 100)
    }),
    "shard_balance" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.shardBalance(Tables.documents(s, dir))
    }),
    "shard_manifest" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.shardManifest(Tables.documents(s, dir))
    }),
    "epoch_allocate" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.epochAllocate(Tables.documents(s, dir))
    }),
    // incremental-export planning: the diff of the corpus manifest vs
    // the manifest after a one-source curation delete — only shards
    // holding src7 docs may flag as changed
    "manifest_diff" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = Tables.documents(s, dir)
      Sampling.manifestDiff(docs, docs.filter(col("source") =!= "src7"))
    }),
    "l_diversity" -> ((s, dir) =>
      TextAnalysis.lDiversity(Tables.documents(s, dir))),
    "k_anonymity" -> ((s, dir) =>
      TextAnalysis.kAnonymity(Tables.documents(s, dir))),
    "t_closeness" -> ((s, dir) =>
      TextAnalysis.tCloseness(Tables.documents(s, dir))),
    // bounded-heap per-group top-k (custom TypedImperativeAggregate) —
    // the window-sort-free form of "top 3 docs per source"
    "group_topk" -> ((s, dir) => {
      import graft.functions.TopKRows.topk_rows
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(topk_rows(col("n_chars"), col("doc_id"), 3).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("idx", "t")))
        .select(col("source"), (col("idx") + 1).cast("long").as("rank"),
          col("t.id").as("doc_id"), col("t.score").as("n_chars"))
        .orderBy(col("source"), col("rank"))
    }),
    "semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(Tables.embeddings(s, dir))),
    // incoming batch probed against the PERSISTED banded index (write-
    // time state — see bandStoreFor); result identical to the inline
    // overload, spec-pinned
    "semantic_dedup_against" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val store = bandStoreFor(s, dir)
      Similarity.semanticDedupAgainstStore(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0),
        graft.store.EmbeddingStore.readBandedSigs(s, store),
        graft.store.EmbeddingStore.readBandedVecs(s, store))
    }),

    // ── Text analysis ──
    "token_stats" -> ((s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))),
    "quality_score" -> ((s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "quality_by_source" -> ((s, dir) =>
      TextAnalysis.qualityBySource(Tables.documents(s, dir))),
    "vocab_growth" -> ((s, dir) => TextAnalysis.vocabGrowth(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)),
      buckets = Some(docBucketsFor(s, dir)))),
    "ngram_growth" -> ((s, dir) =>
      TextAnalysis.ngramGrowth(Tables.documents(s, dir),
        postings = Some(postingsFor(s, dir)),
        buckets = Some(docBucketsFor(s, dir)))),
    "lang_id" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "lang_confusion" -> ((s, dir) =>
      TextAnalysis.langConfusion(Tables.documents(s, dir))),
    "source_confusion" -> ((s, dir) => TextAnalysis.sourceConfusion(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "zipf_slope" -> ((s, dir) => TextAnalysis.zipfSlope(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "doc_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "scrub_pii" -> ((s, dir) => TextAnalysis.scrubPii(Tables.documents(s, dir))),
    "curate_pipeline" -> ((s, dir) => TextAnalysis.curate(Tables.documents(s, dir))),
    "decontaminate" -> ((s, dir) => TextAnalysis.decontaminate(Tables.documents(s, dir))),
    "repetition_score" -> ((s, dir) => TextAnalysis.repetitionScore(Tables.documents(s, dir))),
    // the bigram family fans out from one tokenized prefix (bigramsFor)
    "lm_coverage" -> ((s, dir) => TextAnalysis.lmCoverage(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)))),
    "lm_perplexity" -> ((s, dir) => TextAnalysis.lmPerplexity(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)))),
    "kn_perplexity" -> ((s, dir) => TextAnalysis.knPerplexity(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)))),
    "gopher_repetition" -> ((s, dir) => TextAnalysis.gopherRepetition(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)))),
    "hybrid_rrf" -> ((s, dir) =>
      Similarity.hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    "dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(
      Tables.documents(s, dir), bigrams = Some(bigramsFor(s, dir)))),
    "contamination_deciles" -> ((s, dir) =>
      TextAnalysis.contaminationDecilesFrom(fracFor(s, dir))),
    "decontaminate_frac" -> ((s, dir) =>
      fracFor(s, dir).orderBy(col("doc_id"))),
    "bpe_merges" -> ((s, dir) => {
      import s.implicits._
      bpeFor(s, dir)._1.toDF("step", "pair", "pair_count")
        .orderBy(col("step"))
    }),
    "bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(Tables.documents(s, dir), bpeFor(s, dir)._2)),
    "bpe_fertility" -> ((s, dir) =>
      TextAnalysis.bpeFertility(Tables.documents(s, dir), bpeFor(s, dir)._2)),
    "chunk_dedup" -> ((s, dir) => TextAnalysis.chunkDedup(Tables.documents(s, dir))),
    "skipgram_cooc" -> ((s, dir) =>
      TextAnalysis.skipgramCooc(Tables.documents(s, dir))),
    "quality_calibration" -> ((s, dir) =>
      TextAnalysis.qualityCalibration(Tables.documents(s, dir))),
    "decontaminate_bloom" -> ((s, dir) => TextAnalysis.decontaminateBloom(Tables.documents(s, dir))),
    "vocab_topk" -> ((s, dir) => TextAnalysis.vocabTopK(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "bpe_pair_counts" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, dir))),
    "ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(Tables.documents(s, dir))),
    "token_gini" -> ((s, dir) => TextAnalysis.tokenGini(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "tfidf_top_term" -> ((s, dir) => TextAnalysis.tfidfTopTerm(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "winnow_pairs" -> ((s, dir) => TextAnalysis.winnowPairs(
      Tables.documents(s, dir), positions = Some(positionsFor(s, dir)))),
    "readability" -> ((s, dir) => TextAnalysis.readability(Tables.documents(s, dir))),
    "length_deciles" -> ((s, dir) => TextAnalysis.lengthDeciles(Tables.documents(s, dir))),
    "chunk_docs" -> ((s, dir) => TextAnalysis.chunkDocs(Tables.documents(s, dir))),
    "vocab_cms" -> ((s, dir) => TextAnalysis.vocabCmsTopK(
      Tables.documents(s, dir), toksIn = Some(tokensFor(s, dir)))),
    "temperature_mix" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.temperatureMix(Tables.documents(s, dir))
    }),

    // ── Multimodal binary-column plumbing (decode stubbed, see Multimodal) ──
    "media_summary" -> ((s, dir) => Multimodal.mediaSummary(Tables.documents(s, dir))),
    // perceptual-hash near-dup over media payloads: aHash stripe means
    // through the decode seam, simhash-style pigeonhole banding
    "media_phash_dups" -> ((s, dir) =>
      Multimodal.mediaPhashDups(Tables.documents(s, dir))),
    // transitive media dup groups: the same pointer-jumped CC the text
    // side uses, over the perceptual-hash pair relation
    "media_phash_groups" -> ((s, dir) =>
      Dedup.connectedComponents(
        Multimodal.mediaPhashDups(Tables.documents(s, dir)))
        .select(col("doc_id").as("media_id"), col("rep_id"))),
    "media_chunk_plan" -> ((s, dir) =>
      Multimodal.mediaChunkPlan(Tables.documents(s, dir))),
    "media_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrameStats(Tables.documents(s, dir))),

    // ── Distribution drift / corpus mixing (operators/Drift.scala) ──
    "value_drift" -> ((s, dir) =>
      graft.operators.Drift.valueDrift(Tables.events(s, dir))),
    "psi_drift" -> ((s, dir) =>
      graft.operators.Drift.psiDrift(Tables.events(s, dir))),
    "source_kl" -> ((s, dir) => graft.operators.Drift.sourceKl(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "js_divergence" -> ((s, dir) => graft.operators.Drift.jsDivergence(
      Tables.documents(s, dir), toks = Some(tokensFor(s, dir)))),
    "emd_length_drift" -> ((s, dir) =>
      graft.operators.Drift.emdLengthDrift(Tables.documents(s, dir))),
    "vocab_jaccard" -> ((s, dir) =>
      graft.operators.Drift.vocabJaccard(Tables.documents(s, dir))),
    "ks_drift" -> ((s, dir) =>
      graft.operators.Drift.ksDrift(Tables.events(s, dir))),
    "dup_pagerank" -> ((s, dir) =>
      Dedup.dupPagerank(Tables.embeddings(s, dir))),
    "embedding_drift" -> ((s, dir) =>
      graft.operators.Drift.embeddingDrift(Tables.embeddings(s, dir))),
    "label_sim_matrix" -> ((s, dir) =>
      graft.operators.Drift.labelSimMatrix(Tables.embeddings(s, dir))),
  )

  /** CTE list (no WITH keyword) reproducing Dedup.minhashLshPairs up to a
    * `pairs(id_a, id_b, jaccard6)` relation — shared by the pairs oracle
    * and the connected-components (dedup_groups) oracle. */
  /** UNION-ALL per-column profile oracle (the Spark side is one Expand
    * scan; DuckDB re-scans per column — fine at oracle scale). */
  /** Register-exact portable-HLL profile oracle: rebuilds the identical
    * h60 m=64 register table per column (the hll_distinct CTE chain,
    * keyed by column name) plus the null/row tallies. `kind` selects the
    * portable rendering: "dbl" = micro-grid floor, "ts" = epoch micros,
    * anything else = plain VARCHAR cast. */
  private def portableProfileOracle(table: String,
      cols: Seq[(String, String)]): String = {
    val hashed = cols.map { case (c, kind) =>
      val sv = kind match {
        case "dbl" => s"CAST(CAST(floor($c * 1000000) AS BIGINT) AS VARCHAR)"
        case "ts"  => s"CAST(epoch_us($c) AS VARCHAR)"
        case _     => s"CAST($c AS VARCHAR)"
      }
      s"SELECT '$c' AS col, $sv AS sv FROM $table"
    }.mkString("\n  UNION ALL ")
    // tallies are per-column ungrouped aggregates (one row per column
    // even on an EMPTY table — the schema-spine contract the exact
    // profiler and EmptyInputSpec share); the register assembly LEFT
    // JOINs onto them, so sketch state is NULL when no values exist
    val tallies = cols.map { case (c, _) =>
      s"""SELECT '$c' AS col, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(count(*) - count($c) AS BIGINT) AS n_nulls
         |  FROM $table""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH hashed AS (
       |  $hashed
       |), h AS (
       |  SELECT col, CASE WHEN sv IS NULL THEN NULL
       |    ELSE ('0x' || substr(md5(sv), 1, 15))::BIGINT END AS h FROM hashed
       |), cells AS (
       |  SELECT col,
       |    CASE WHEN h IS NULL THEN -1 ELSE h % 64 END AS bucket,
       |    count(*) AS cnt,
       |    max(CASE WHEN h IS NULL THEN NULL
       |        WHEN h // 64 = 0 THEN 55
       |        ELSE 55 - length(bin(h // 64)) END) AS reg
       |  FROM h GROUP BY 1, 2
       |), tallies AS (
       |  $tallies
       |), regs AS (
       |  SELECT col, bucket, reg FROM cells WHERE bucket >= 0
       |), per AS (
       |  SELECT col, count(*) AS n_used, max(reg) AS max_reg
       |  FROM regs GROUP BY 1
       |), asm AS (
       |  SELECT r.col, p.n_used, p.max_reg,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(p.max_reg - r.reg AS INT))
       |      AS BIGINT) AS s_present
       |  FROM regs r JOIN per p USING (col)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT t.col AS "column", t.n_nulls, t.n_rows,
       |  CAST(64 - a.n_used AS BIGINT) AS v_zero,
       |  a.max_reg,
       |  a.s_present + (64 - a.n_used) *
       |    (CAST(1 AS BIGINT) << CAST(a.max_reg AS INT)) AS s_num,
       |  round(0.709 * 64 * 64 * pow(2.0, a.max_reg) /
       |    CAST(a.s_present + (64 - a.n_used) *
       |      (CAST(1 AS BIGINT) << CAST(a.max_reg AS INT)) AS DOUBLE), 6)
       |    AS hll_est
       |FROM tallies t LEFT JOIN asm a USING (col)
       |ORDER BY "column"""".stripMargin
  }

  private def profileOracle(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column",
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(count(*) AS BIGINT) AS n_rows FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  private lazy val minhashPairsCtes: String =
    minhashCtes("a.doc_id < b.doc_id")

  /** Same signature/band/verify chain with a parameterized candidate
    * condition — `a.doc_id < b.doc_id` for self-dedup, side predicates
    * for the cross-corpus (ingest-vs-store) variant. */
  private def minhashCtes(candCond: String): String = {
    val params = graft.functions.PortableHash.minhashParams(64)
    val seedRows = params.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val p = graft.functions.PortableHash.MinhashP
    s"""norm AS (
       |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
       |), toks AS (
       |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
       |), shl AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
       |    THEN list_transform(generate_series(1, len(w)-2),
       |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |    ELSE [] END) AS shs FROM toks
       |), post AS (
       |  SELECT doc_id, unnest(shs) AS s FROM shl
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n_sh FROM post GROUP BY 1
       |), based AS (
       |  SELECT doc_id, s,
       |    ('0x' || substr(md5(s), 1, 15))::BIGINT % $p AS h1
       |  FROM post
       |), seeds(seed, a, b) AS (VALUES $seedRows
       |), sigs AS (
       |  SELECT doc_id, seed, min((a * h1 + b) % $p) AS sig
       |  FROM based, seeds GROUP BY doc_id, seed
       |), bands AS (
       |  SELECT doc_id, seed // 4 AS band,
       |    string_agg(sig::VARCHAR, ',' ORDER BY seed) AS bv
       |  FROM sigs GROUP BY doc_id, seed // 4
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND $candCond
       |), common AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN post pa ON pa.doc_id = c.id_a
       |  JOIN post pb ON pb.doc_id = c.id_b AND pb.s = pa.s
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT id_a, id_b,
       |    round(CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE), 6) AS jaccard6
       |  FROM common
       |  JOIN sizes na ON na.doc_id = id_a
       |  JOIN sizes nb ON nb.doc_id = id_b
       |  WHERE CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.8
       |)""".stripMargin
  }

  /** Write-time index state dumped by Verify to `outDir/_aux/<name>` so
    * oracles can read it (`__AUX__` in the SQL is replaced with the
    * absolute aux dir at dump time). These are the tables an ingest-time
    * index build MATERIALIZES — the IVF coarse quantizer and the
    * cell-per-vector layout (`store.EmbeddingStore.writeClustered`'s
    * partition column) — i.e. data a production deployment would already
    * have on disk, not query-time help for the oracle. The oracle then
    * independently recomputes the query-time half (probe selection +
    * exact cosine top-k over the probed cells). */
  def auxTables: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ivf_centroids" -> ((s, dir) => {
      import s.implicits._
      centroidsFor(s, dir).zipWithIndex.flatMap { case (w, cid) =>
        w.zipWithIndex.map { case (x, pos) => (cid, pos, x) }
      }.toSeq.toDF("c_id", "pos", "w")
    }),
    "ivf_cells" -> ((s, dir) => {
      import graft.functions.NearestCentroid.nearest_centroid
      Tables.embeddings(s, dir).select(col("vec_id"),
        nearest_centroid(col("embedding"), centroidsFor(s, dir)).as("c_id"))
    }),
    "pq_codebooks" -> ((s, dir) => {
      import s.implicits._
      pqFor(s, dir).zipWithIndex.flatMap { case (cb, sub) =>
        cb.zipWithIndex.flatMap { case (w, cid) =>
          w.zipWithIndex.map { case (x, pos) => (sub, cid, pos, x) }
        }
      }.toSeq.toDF("sub", "c_id", "pos", "w")
    }))

  /** DuckDB-equivalent SQL per query (tables resolved by the driver against
    * the same parquet dir). */
  /** The BPE training loop replayed as chained CTEs: stage i counts the
    * bigrams of text table t{i}, elects the top pair (count desc, pair
    * asc — the operator's tie-break), and rewrites t{i+1} with the same
    * space-doubling replace the operator uses (left-to-right
    * non-overlapping `replace` is identical in both engines). */
  private def bpeStagesSql(steps: Int): String = {
    val stages = (0 until steps).map { i =>
      s"""p$i AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(CASE WHEN len(w) >= 2
         |      THEN list_transform(generate_series(1, len(w)-1),
         |           j -> w[j] || ' ' || w[j+1]) ELSE [] END) AS b FROM (
         |      SELECT list_filter(string_split(t, ' '), x -> len(x) > 0) AS w
         |      FROM t$i))
         |  GROUP BY 1 ORDER BY cnt DESC, b LIMIT 1
         |), t${i + 1} AS (
         |  SELECT doc_id, trim(replace(replace(
         |    ' ' || replace(t, ' ', '  ') || ' ',
         |    ' ' || replace(p.b, ' ', '  ') || ' ',
         |    ' ' || replace(p.b, ' ', '_') || ' '), '  ', ' ')) AS t
         |  FROM t$i CROSS JOIN p$i p
         |)""".stripMargin
    }.mkString(", ")
    s"""t0 AS (
       |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
       |), $stages""".stripMargin
  }

  private def bpeOracleSql(steps: Int): String = {
    val union = (0 until steps).map { i =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS step, b AS pair, cnt AS pair_count FROM p$i"
    }.mkString("\nUNION ALL ")
    s"""WITH ${bpeStagesSql(steps)}
       |$union
       |ORDER BY step""".stripMargin
  }

  /** The encode oracle replays the same chained-CTE training, then
    * counts tokens per doc in t0 vs t`steps`. */
  private def bpeEncodeOracleSql(steps: Int): String =
    s"""WITH ${bpeStagesSql(steps)},
       |cnt AS (
       |  SELECT t0.doc_id,
       |    CAST(len(list_filter(string_split(t0.t, ' '),
       |      x -> len(x) > 0)) AS BIGINT) AS n_raw,
       |    CAST(len(list_filter(string_split(tn.t, ' '),
       |      x -> len(x) > 0)) AS BIGINT) AS n_bpe
       |  FROM t0 JOIN t$steps tn USING (doc_id))
       |SELECT doc_id, n_raw, n_bpe,
       |  CAST(CASE WHEN n_raw > 0
       |    THEN (n_raw - n_bpe) * 1000000 // n_raw
       |    ELSE 0 END AS BIGINT) AS saved_micro
       |FROM cnt ORDER BY doc_id""".stripMargin

  private def bpeFertilityOracleSql(steps: Int): String =
    s"""WITH ${bpeStagesSql(steps)},
       |cnt AS (
       |  SELECT t0.doc_id,
       |    CAST(len(list_filter(string_split(t0.t, ' '),
       |      x -> len(x) > 0)) AS BIGINT) AS n_raw,
       |    CAST(len(list_filter(string_split(tn.t, ' '),
       |      x -> len(x) > 0)) AS BIGINT) AS n_bpe
       |  FROM t0 JOIN t$steps tn USING (doc_id))
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(n_raw) AS BIGINT) AS raw_tokens,
       |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
       |  CAST(CASE WHEN sum(n_raw) > 0
       |    THEN sum(n_bpe) * 1000000 // sum(n_raw)
       |    ELSE 0 END AS BIGINT) AS tokens_per_word_micro
       |FROM cnt JOIN documents d USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "bpe_merges" -> bpeOracleSql(5),
    "bpe_encode" -> bpeEncodeOracleSql(5),
    "bpe_fertility" -> bpeFertilityOracleSql(5),

    // Chunk-level dedup: same chunking CTE as chunk_docs; keeper of a
    // digest = lowest (doc_id, chunk_idx); n_dup counts chunks whose
    // keeper is a DIFFERENT document.
    "chunk_dedup" ->
      """WITH sized AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + (greatest(len - 200, 0) + 149) // 150 AS n_chunks
        |  FROM documents WHERE length(text) > 0
        |), ch AS (
        |  SELECT doc_id, chunk_idx,
        |    md5(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS chunk_md5
        |  FROM (SELECT doc_id, text,
        |    unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1)) AS chunk_idx
        |    FROM sized)
        |), keepers AS (
        |  SELECT chunk_md5, doc_id AS keeper_doc FROM (
        |    SELECT chunk_md5, doc_id, row_number() OVER (
        |      PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) AS rn
        |    FROM ch) WHERE rn = 1
        |)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN k.keeper_doc = c.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN k.keeper_doc <> c.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup
        |FROM ch c JOIN keepers k USING (chunk_md5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "trends_10min" ->
      s"""SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |  round(min(value), 6) AS v_min,
         |  round(max(value), 6) AS v_max,
         |  round(avg(value), 6) AS v_mean,
         |  round(median(value), 6) AS v_median,
         |  count(*) AS n
         |FROM events
         |WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |  AND event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Bottom-k median sketch reproduced hash-for-hash: same micros floor,
    // same h60 selection hash, same rank rule (keep rn ≤ 1024), same
    // linear interpolation pos = 0.5·(nk−1) over the kept sample — the
    // oracle matches the sketch's ERROR, not just its target. The
    // interpolation operands are integer micros (exact doubles), so both
    // engines produce bit-identical IEEE results.
    "trends_10min_approx" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
        |    CAST(floor(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'
        |), hashed AS (
        |  SELECT window_start, vm,
        |    ('0x' || substr(md5(CAST(vm AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM b
        |), ranked AS (
        |  SELECT window_start, vm,
        |    row_number() OVER (PARTITION BY window_start ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY window_start) AS n_all
        |  FROM hashed
        |), kept AS (
        |  SELECT window_start, vm, n_all,
        |    row_number() OVER (PARTITION BY window_start ORDER BY vm) AS vrn,
        |    count(*) OVER (PARTITION BY window_start) AS nk
        |  FROM ranked WHERE rn <= 1024
        |), med AS (
        |  SELECT window_start, max(n_all) AS n, max(nk) AS nk,
        |    max(CASE WHEN vrn = (nk - 1) // 2 + 1 THEN vm END) AS vlo,
        |    max(CASE WHEN vrn = CASE WHEN (nk - 1) // 2 + 2 > nk
        |                            THEN nk ELSE (nk - 1) // 2 + 2 END
        |        THEN vm END) AS vhi
        |  FROM kept GROUP BY window_start
        |)
        |SELECT window_start,
        |  (CAST(vlo AS DOUBLE) +
        |    (0.5 * (nk - 1) - ((nk - 1) // 2)) *
        |    (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE))) / 1000000.0
        |    AS median_approx,
        |  CAST(n AS BIGINT) AS n
        |FROM med ORDER BY window_start""".stripMargin,

    "trends_gapfill" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean, count(*) AS n
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), spine AS (
         |  SELECT unnest(generate_series(
         |    CAST(floor(epoch(TIMESTAMP '$TrendsFrom')/600)*600 AS BIGINT),
         |    CAST(floor(epoch(TIMESTAMP '$TrendsTo')/600)*600 AS BIGINT),
         |    CAST(600 AS BIGINT))) AS window_start
         |)
         |SELECT s.window_start, coalesce(a.n, 0) AS n, a.v_mean
         |FROM spine s LEFT JOIN agg a USING (window_start)
         |ORDER BY 1""".stripMargin,

    "trends_gapfill_locf" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean, count(*) AS n
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), spine AS (
         |  SELECT unnest(generate_series(
         |    CAST(floor(epoch(TIMESTAMP '$TrendsFrom')/600)*600 AS BIGINT),
         |    CAST(floor(epoch(TIMESTAMP '$TrendsTo')/600)*600 AS BIGINT),
         |    CAST(600 AS BIGINT))) AS window_start
         |)
         |SELECT window_start, n, v_mean,
         |  last_value(v_mean IGNORE NULLS) OVER (ORDER BY window_start
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM (
         |  SELECT s.window_start, coalesce(a.n, 0) AS n, a.v_mean
         |  FROM spine s LEFT JOIN agg a USING (window_start)
         |) t ORDER BY window_start""".stripMargin,

    "trends_moving_avg" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |)
         |, m AS (
         |  SELECT window_start, v_mean,
         |    CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         |      AS v_micro
         |  FROM agg)
         |SELECT window_start, v_mean,
         |  CAST(sum(v_micro) OVER w // (count(*) OVER w) AS BIGINT)
         |    AS ma_micro
         |FROM m
         |WINDOW w AS (ORDER BY window_start
         |             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |ORDER BY window_start""".stripMargin,

    // Each event belongs to exactly two overlapping 10-min/5-min windows:
    // starts floor(t/300)·300 and that minus 300.
    "trends_sliding" ->
      s"""WITH starts AS (
         |  SELECT value, unnest([
         |    CAST(floor(epoch(ts)/300)*300 AS BIGINT) - 300,
         |    CAST(floor(epoch(ts)/300)*300 AS BIGINT)
         |  ]) AS window_start
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |)
         |SELECT window_start,
         |  round(min(value), 6) AS v_min,
         |  round(max(value), 6) AS v_max,
         |  round(avg(value), 6) AS v_mean,
         |  round(median(value), 6) AS v_median,
         |  count(*) AS n
         |FROM starts GROUP BY 1 ORDER BY 1""".stripMargin,

    "trade_ingest" ->
      """SELECT CAST(event_id AS VARCHAR) AS user_id,
        |  upper(substr(event_type, 1, 3)) AS currency_from,
        |  'USD' AS currency_to,
        |  CAST(trunc(value * 1e6) AS BIGINT) AS amount_sell_micros,
        |  CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT) AS amount_buy_micros,
        |  round(CAST(CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT) AS DOUBLE)
        |        / CAST(CAST(trunc(value * 1e6) AS BIGINT) AS DOUBLE), 6) AS rate,
        |  'US' AS originating_country,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS time_placed_s
        |FROM events
        |WHERE CAST(trunc(value * 1e6) AS BIGINT) <> 0
        |ORDER BY event_id""".stripMargin,

    // Byte-level proto check: pb_len recomputes the proto3 size from the
    // wire-format rules — 1 tag byte + LEB128 varint width per int64
    // (negative ⇒ 10-byte varint), 1 tag + 1 length byte + bytes per
    // sub-128-byte string, proto3 defaults omitted. String fields here are
    // ASCII and < 128 bytes (single length byte), asserted by the values.
    "trade_proto_roundtrip" -> {
      // tag + varint width of a non-negative int64 v, 0 when omitted
      def vlen(v: String): String = {
        val bounds = (1 to 8).map(k => (s"CAST(${1L << (7 * k)} AS BIGINT)", k + 1))
        s"""CASE WHEN $v = 0 THEN 0 WHEN $v < 0 THEN 11
           |    ${bounds.map { case (b, w) => s"WHEN $v < $b THEN $w" }.mkString(" ")}
           |    ELSE 10 END""".stripMargin
      }
      def slen(c: String): String =
        s"CASE WHEN len($c) > 0 THEN 2 + len($c) ELSE 0 END"
      s"""WITH src AS (
         |  SELECT event_id,
         |    CAST(event_id AS VARCHAR) AS user_id,
         |    upper(substr(event_type, 1, 3)) AS currency_from,
         |    'USD' AS currency_to,
         |    CAST(trunc(value * 1e6) AS BIGINT) AS amount_sell_micros,
         |    CASE WHEN event_id % 7 = 0 THEN 0
         |         ELSE CAST(trunc(value * CAST(1.5 AS DOUBLE) * 1e6) AS BIGINT)
         |    END AS amount_buy_micros,
         |    epoch_ms(ts) AS time_placed_ms,
         |    CASE WHEN event_id % 10 = 0 THEN '' ELSE 'US' END
         |      AS originating_country
         |  FROM events
         |)
         |SELECT user_id, currency_from, currency_to, amount_sell_micros,
         |  amount_buy_micros, time_placed_ms, originating_country,
         |  CAST(${slen("user_id")} + ${slen("currency_from")}
         |    + ${slen("currency_to")} + ${vlen("amount_sell_micros")}
         |    + ${vlen("amount_buy_micros")} + ${vlen("time_placed_ms")}
         |    + ${slen("originating_country")} AS BIGINT) AS pb_len
         |FROM src ORDER BY event_id""".stripMargin
    },

    // Money arithmetic in exact DECIMAL (2-dp sources) then cast to double —
    // identical across engines regardless of float summation order.
    "q1_pricing" -> Q1PricingSql,
    "q1_pricing_sql" -> Q1PricingSql,
    "q6_forecast_sql" -> Q6ForecastSql,

    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q14_promo_share" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,

    // Integer-exact correlated-subquery threshold: 5·qty·n < Σqty per part.
    "q17_small_quantity" ->
      """WITH li AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#4'
        |), agg AS (
        |  SELECT qty, price,
        |    sum(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
        |    count(*) OVER (PARTITION BY l_partkey) AS n_li
        |  FROM li
        |)
        |SELECT round(CAST(sum(price) AS DOUBLE) / 7, 6) AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM agg WHERE qty * 5 * n_li < sum_qty""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    // Q2 shape adapted (no partsupp): lineitem is the supply relation,
    // pair cost = cheapest shipment price; correlated min decorrelated as
    // a per-part window min, textbook form on the oracle side too.
    "q2_min_cost_supplier" ->
      """WITH regional AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |), pairs AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_dec
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'STANDARD' AND p_size = 5
        |  JOIN regional ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5, 6
        |), best AS (
        |  SELECT *, min(cost_dec) OVER (PARTITION BY p_partkey) AS best_dec
        |  FROM pairs
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  CAST(cost_dec AS DOUBLE) AS supply_cost
        |FROM best WHERE cost_dec = best_dec
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q8_market_share" ->
      """WITH vols AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
        |  CAST(sum(vol) AS DOUBLE) AS total_volume,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,

    // Q9 shape adapted (no ps_supplycost): cost term = retailprice × qty.
    "q9_profit_shape" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    // Q12 shape adapted (no shipmode/commit/receipt dates): category =
    // order→ship delay bucket, integer DATE-day arithmetic both engines.
    "q12_ship_delay" ->
      """SELECT CASE
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 0 THEN 'EARLY'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'QUICK'
        |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'NORMAL'
        |    ELSE 'SLOW' END AS delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY delay_bucket""".stripMargin,

    // Q16 shape adapted: lineitem bridges part↔supplier; the complaint
    // exclusion is suppliers in arrears (NOT IN → broadcast anti join).
    "q16_supplier_cnt" ->
      """SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin,

    // Q20 shape adapted: availqty threshold becomes shipped-qty HAVING;
    // the nested IN chain stays nested on the oracle side.
    "q20_bulk_shippers" ->
      """SELECT s_name, n_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
        |ORDER BY s_name""".stripMargin,

    "group_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "cube_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "exists_shapes" ->
      """SELECT c_custkey,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,

    "pivot_status_counts" ->
      """SELECT c_mktsegment,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // NULLS FIRST to match Spark's asc_nulls_first (DuckDB defaults NULLS LAST)
    "rollup_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "grouping_sets_revenue" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_orders,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,

    "q10_returned" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,4))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      """SELECT o_orderkey, o_custkey, sum_qty FROM orders
        |JOIN (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum_qty > 250
        |) ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q4_priority_counts" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast" -> Q6ForecastSql,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // DECIMAL-exact max-equality: the scalar subquery re-aggregates the
    // CTE, mirroring the Spark plan's reuse of the grouped aggregate.
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    // HAVING vs a global scalar, multiplied through to DECIMAL-exact
    // integer form (rev·25 > total) — no float fraction.
    "q11_important_nations" ->
      """WITH rev AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue
        |FROM rev
        |WHERE rev_dec * 25 > (SELECT sum(rev_dec) FROM rev)
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // The oracle keeps the textbook double-correlated EXISTS/NOT EXISTS;
    // the Spark plan decorrelates both into one per-order aggregate —
    // the hash match proves the rewrite.
    "q21_late_suppliers" ->
      """WITH cand AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM cand JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    // Explicit full frame: last_value over the default frame would be
    // the current row — the cross-engine silent-wrong this query guards.
    "customer_price_drift" ->
      """WITH fl AS (
        |  SELECT o_custkey,
        |    first_value(o_totalprice) OVER w AS first_price,
        |    last_value(o_totalprice) OVER w AS last_price,
        |    count(*) OVER w AS n_orders
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT DISTINCT o_custkey, first_price, last_price,
        |  CAST(CAST(last_price AS DECIMAL(18,2)) - CAST(first_price AS DECIMAL(18,2)) AS DOUBLE) AS drift,
        |  n_orders
        |FROM fl ORDER BY o_custkey""".stripMargin,

    // DECIMAL-exact above-average test (bal·n > Σbal) — no float mean.
    "q22_idle_rich" ->
      """WITH pos AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
        |    count(*) AS bal_n
        |  FROM customer WHERE c_acctbal > 0
        |)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "nation_activity_full" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1
        |), s AS (
        |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY 1
        |)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,

    "doc_set_ops" ->
      """WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        |lng AS (SELECT doc_id FROM documents WHERE n_chars > 500)
        |SELECT 'long_en' AS tag, doc_id FROM (
        |  SELECT doc_id FROM en INTERSECT SELECT doc_id FROM lng)
        |UNION ALL
        |SELECT 'short_en' AS tag, doc_id FROM (
        |  SELECT doc_id FROM en EXCEPT SELECT doc_id FROM lng)
        |ORDER BY tag, doc_id""".stripMargin,

    "rank_bands" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // customer LTV deciles: the oracle states the global ntile the
    // engine computes closed-form (Ranks) — same contract as
    // length_deciles/rfm_segments. Money crosses as BIGINT cents on
    // BOTH sides (determinism ladder): the DECIMAL sum is exact, the
    // ×100 cast lossless at scale 2, and no raw DECIMAL column reaches
    // the driver's hash boundary (round-7 red row; the HUGEINT class's
    // sibling — check_oracle_types.py patrols both).
    "customer_value_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS spend_cents
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT spend_cents,
        |    ntile(10) OVER (ORDER BY spend_cents, o_custkey) AS decile
        |  FROM spend)
        |SELECT decile, COUNT(*) AS n_customers,
        |  CAST(SUM(spend_cents) AS BIGINT) AS decile_spend_cents,
        |  MIN(spend_cents) AS min_spend_cents,
        |  MAX(spend_cents) AS max_spend_cents
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_json_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "rate_limit_flags" ->
      """SELECT event_id, user_id, in_window, in_window > 2 AS limited FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                   RANGE BETWEEN 999999 PRECEDING AND CURRENT ROW) AS in_window
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,

    // Session boundary: gap >= 30 min starts a new session — matches
    // session_window's exclusive end (merge only when diff < gap).
    "events_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "event_gaps" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,

    "latest_events" ->
      """SELECT user_id, event_type, latest_id, latest_us, value FROM (
        |  SELECT user_id, event_type, event_id AS latest_id,
        |    epoch_us(ts) AS latest_us, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |) t WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    // Explicit cume_dist definition — native percentile_disc tie
    // conventions differ across engines; this one is spelled out.
    // lag elects change rows, lead closes intervals — both over the
    // (us, event_id) tie-broken key order; exact double equality.
    "scd2_intervals" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, value, epoch_us(ts) AS us, event_id,
        |    lag(value) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS prev_value
        |  FROM events
        |), changes AS (
        |  SELECT user_id, event_type, value, us, event_id FROM ordered
        |  WHERE prev_value IS NULL OR value <> prev_value
        |)
        |SELECT user_id, event_type, value, us AS valid_from_us,
        |  lead(us) OVER (PARTITION BY user_id, event_type
        |    ORDER BY us, event_id) AS valid_to_us
        |FROM changes
        |ORDER BY user_id, event_type, valid_from_us""".stripMargin,

    // Same cume_dist discrete-percentile rule as quantiles_disc; the
    // clamp is pure comparison, so the output is engine-exact.
    "winsorize_values" ->
      """WITH cd AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |    min(CASE WHEN cd >= 0.05 THEN value END) AS p_lo,
        |    min(CASE WHEN cd >= 0.95 THEN value END) AS p_hi
        |  FROM cd GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, e.value,
        |  greatest(least(e.value, b.p_hi), b.p_lo) AS value_winsorized,
        |  (e.value < b.p_lo OR e.value > b.p_hi) AS clipped
        |FROM events e JOIN b ON b.event_type = e.event_type
        |ORDER BY e.event_id""".stripMargin,

    "quantiles_disc_by_type" ->
      """WITH cd AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events
        |)
        |SELECT event_type,
        |  min(CASE WHEN cd >= 0.5 THEN value END) AS p50_disc,
        |  min(CASE WHEN cd >= 0.9 THEN value END) AS p90_disc,
        |  min(CASE WHEN cd >= 0.99 THEN value END) AS p99_disc,
        |  count(*) AS n
        |FROM cd GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Five exact-decimal moments, closed forms in double; degenerate
    // variances emit NULL on both sides (never an engine-divergent ÷0).
    "value_trend_by_type" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS sy,
        |    sum(CAST(value AS DECIMAL(18,2))
        |        * CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS sxy,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx,
        |    sum(CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))
        |        * CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0))) AS syy
        |  FROM events GROUP BY event_type
        |), d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |  FROM m
        |)
        |SELECT event_type, n,
        |  CASE WHEN varx > 0 AND vary > 0
        |       THEN round(cov / (sqrt(varx) * sqrt(vary)), 6) END AS corr_vt,
        |  CASE WHEN vary > 0
        |       THEN round(cov / vary * 86400, 6) END AS slope_per_day
        |FROM d ORDER BY event_type""".stripMargin,

    "trends_zscore" ->
      s"""WITH agg AS (
         |  SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS window_start,
         |    round(avg(value), 6) AS v_mean
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$TrendsFrom' AND ts <= TIMESTAMP '$TrendsTo'
         |    AND event_type = 'purchase'
         |  GROUP BY 1
         |), mi AS (
         |  SELECT window_start, v_mean,
         |    CAST(CAST(v_mean AS DECIMAL(18,6)) * 1000000 AS BIGINT)
         |      AS v_micro
         |  FROM agg
         |), mo AS (
         |  SELECT window_start, v_mean, v_micro,
         |    count(*) OVER w AS nn,
         |    CAST(sum(v_micro) OVER w AS BIGINT) AS sx,
         |    sum(CAST(v_micro AS HUGEINT) * v_micro) OVER w AS sxx
         |  FROM mi
         |  WINDOW w AS (ORDER BY window_start
         |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |), st AS (
         |  SELECT window_start, v_mean, v_micro,
         |    CAST(sx // nn AS BIGINT) AS ma_micro,
         |    CAST(floor(sqrt(CAST(nn * sxx - CAST(sx AS HUGEINT) * sx
         |      AS DOUBLE)) / nn) AS BIGINT) AS sd_micro
         |  FROM mo
         |)
         |SELECT window_start, v_mean, ma_micro, sd_micro,
         |  CASE WHEN sd_micro > 0 THEN
         |    CAST(floor((v_micro - ma_micro) * 1000000.0 / sd_micro)
         |      AS BIGINT) END AS z_micro,
         |  coalesce(CASE WHEN sd_micro > 0 THEN
         |    abs(CAST(floor((v_micro - ma_micro) * 1000000.0 / sd_micro)
         |      AS BIGINT)) > 2000000 END, FALSE) AS anomaly
         |FROM st ORDER BY window_start""".stripMargin,

    // Exact-decimal moments, double-assembled closed form — native
    // stddev/var aggregates are combine-order-dependent float sums and
    // would not hash-match across engines; this does.
    "dispersion_by_type" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(greatest((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0), 6) AS var_pop,
        |  round(sqrt(greatest((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0)), 6) AS stddev_pop
        |FROM m ORDER BY event_type""".stripMargin,

    // Skewness/kurtosis from exact DECIMAL power sums; formula text is
    // shared with the Spark side op-for-op (m2·sqrt(m2), never pow — a
    // libm call whose last ulp differs across implementations).
    "moments_by_type" ->
      """WITH vals AS (
        |  SELECT event_type, CAST(value AS DECIMAL(8,2)) AS x1,
        |    CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
        |      AS DECIMAL(19,4)) AS x2
        |  FROM events
        |), vals2 AS (
        |  -- staged widths: DuckDB decimals are int64 up to 18 digits and
        |  -- only promote on the DECLARED result type, so each product is
        |  -- cast to a width that fits exactly (x4 ≤ 24 digits at scale 8)
        |  SELECT event_type, x1, x2,
        |    CAST(x2 * x1 AS DECIMAL(28,6)) AS x3,
        |    CAST(x2 * x2 AS DECIMAL(38,8)) AS x4
        |  FROM vals
        |), s AS (
        |  SELECT event_type, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
        |    sum(x3) AS s3, sum(x4) AS s4
        |  FROM vals2 GROUP BY 1
        |), d AS (
        |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |    CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d
        |  FROM s
        |), m AS (
        |  SELECT event_type, n, nd, s1d,
        |    greatest((nd * s2d - s1d * s1d) / (nd * nd), 0.0) AS m2,
        |    (nd * nd * s3d - 3 * nd * s1d * s2d + 2 * s1d * s1d * s1d)
        |      / (nd * nd * nd) AS m3,
        |    (nd * nd * nd * s4d - 4 * nd * nd * s1d * s3d
        |      + 6 * nd * s1d * s1d * s2d - 3 * s1d * s1d * s1d * s1d)
        |      / (nd * nd * nd * nd) AS m4
        |  FROM d
        |)
        |SELECT event_type, n,
        |  round(s1d / nd, 6) AS mean,
        |  round(m2, 6) AS var_pop,
        |  CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
        |  CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - 3, 6) END AS kurtosis_ex
        |FROM m ORDER BY event_type""".stripMargin,

    // Bottom-k distinct sketch, reproduced hash-for-hash: same h60
    // family, same rank rule, same (k−1)·2^60/kth estimate — the oracle
    // matches the sketch's ERROR, not just its target.
    "kmv_distinct" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events
        |), ranked AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM hashed
        |)
        |SELECT event_type, count(*) AS n_kept, max(h) AS kth_min,
        |  CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |       WHEN max(h) > 0
        |       THEN round(63.0 * (1152921504606846976.0 / CAST(max(h) AS DOUBLE)), 3)
        |  END AS n_est
        |FROM ranked WHERE rn <= 64
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // register-exact HLL (m=64): bucket = h60 mod m, register = ρ of the
    // 54-bit remainder via bin() length (both engines drop leading
    // zeros); harmonic sum assembled as an exact BIGINT numerator so the
    // estimate is one correctly-rounded IEEE divide — no float fold
    "hll_distinct" ->
      """WITH hashed AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events
        |), regs AS (
        |  SELECT event_type, h % 64 AS bucket,
        |    max(CASE WHEN h // 64 = 0 THEN 55
        |        ELSE 55 - length(bin(h // 64)) END) AS reg
        |  FROM hashed GROUP BY 1, 2
        |), per AS (
        |  SELECT event_type, count(*) AS n_used, max(reg) AS max_reg
        |  FROM regs GROUP BY 1
        |), asm AS (
        |  SELECT r.event_type, p.n_used, p.max_reg,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(p.max_reg - r.reg AS INT))
        |      AS BIGINT) AS s_present
        |  FROM regs r JOIN per p USING (event_type)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT event_type,
        |  CAST(64 - n_used AS BIGINT) AS v_zero,
        |  max_reg,
        |  s_present + (64 - n_used) *
        |    (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS s_num,
        |  round(0.709 * 64 * 64 * pow(2.0, max_reg) /
        |    CAST(s_present + (64 - n_used) *
        |      (CAST(1 AS BIGINT) << CAST(max_reg AS INT)) AS DOUBLE), 6)
        |    AS hll_est
        |FROM asm ORDER BY event_type""".stripMargin,

    // Chained step windows: each CTE layer adds the next step's
    // conditional min, mirroring the Spark window chain exactly.
    "funnel_steps" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |    OVER (PARTITION BY user_id) AS v_us FROM base
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND us > v_us THEN us END)
        |    OVER (PARTITION BY user_id) AS c_us FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > c_us THEN us END)
        |    OVER (PARTITION BY user_id) AS p_us FROM s2
        |), per_user AS (
        |  SELECT DISTINCT user_id, v_us, c_us, p_us FROM s3
        |)
        |SELECT count(v_us) AS n_view,
        |  count(c_us) AS n_click_after_view,
        |  count(p_us) AS n_purchase_after_click,
        |  count(*) AS n_users
        |FROM per_user""".stripMargin,

    // windowFunnel semantics: a chain may open at ANY view; first click
    // strictly after it, first purchase strictly after that click, both
    // within 21600s of the OPENING view; level counts are nested
    // distinct user sets
    "funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT DISTINCT user_id, us AS v_us FROM e
        |  WHERE event_type = 'view'
        |), vc AS (
        |  SELECT v.user_id, v.v_us, min(c.us) AS c_us
        |  FROM v LEFT JOIN e c ON c.user_id = v.user_id
        |    AND c.event_type = 'click' AND c.us > v.v_us
        |  GROUP BY 1, 2
        |), alive AS (
        |  SELECT * FROM vc
        |  WHERE c_us IS NOT NULL AND c_us <= v_us + 21600000000
        |), vcp AS (
        |  SELECT a.user_id, a.v_us, min(p.us) AS p_us
        |  FROM alive a LEFT JOIN e p ON p.user_id = a.user_id
        |    AND p.event_type = 'purchase' AND p.us > a.c_us
        |  GROUP BY 1, 2
        |), l3 AS (
        |  SELECT DISTINCT user_id FROM vcp
        |  WHERE p_us IS NOT NULL AND p_us <= v_us + 21600000000
        |)
        |SELECT CAST(21600 AS BIGINT) AS window_sec,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM v)
        |    AS n_level1,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM alive)
        |    AS n_level2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM l3) AS n_level3""".stripMargin,

    // sweep-line max-intersections over inclusive session intervals:
    // +1 at start, -1 at end+1, ties collapsed per timestamp BEFORE the
    // cumsum, argmax with first-timestamp tiebreak
    "max_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), o AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT user_id, us, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), iv AS (
        |  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us
        |  FROM s GROUP BY 1, 2
        |), d AS (
        |  SELECT start_us AS us, 1 AS dd FROM iv
        |  UNION ALL SELECT end_us + 1, -1 FROM iv
        |), n AS (
        |  SELECT us, CAST(sum(dd) AS BIGINT) AS net FROM d GROUP BY 1
        |), r AS (
        |  SELECT us, sum(net) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING)
        |    AS conc
        |  FROM n
        |)
        |SELECT CAST(conc AS BIGINT) AS max_concurrent, us AS at_us
        |FROM r ORDER BY conc DESC, us LIMIT 1""".stripMargin,

    // Kaplan–Meier: integer day lifetimes, horizon-censored (1 day),
    // reverse-cumulative at-risk, micro-floored ln factors prefix-
    // summed in BIGINT; surv6 = one final exp/round; d = n_risk
    // absorbs the curve at exactly 0 (NULL logsurv) from that day on.
    "survival_retention" ->
      """WITH life AS (
        |  SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
        |  FROM events GROUP BY 1
        |), hor AS (SELECT max(epoch_us(ts)) AS t_end FROM events),
        |per AS (
        |  SELECT (l - f) // 86400000000 AS day,
        |    CASE WHEN l >= t_end - 86400000000 THEN 1 ELSE 0 END AS cens
        |  FROM life CROSS JOIN hor
        |), byday AS (
        |  SELECT day, CAST(sum(CASE WHEN cens = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(cens) AS BIGINT) AS c
        |  FROM per GROUP BY 1
        |), r AS (
        |  SELECT day, d, c, CAST(sum(d + c) OVER (ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        |  FROM byday
        |), s AS (
        |  SELECT day, d, c, n_risk,
        |    CASE WHEN d > 0 AND d < n_risk THEN CAST(floor(
        |      ln(1 - CAST(d AS DOUBLE) / n_risk) * 1000000) AS BIGINT)
        |      ELSE 0 END AS step,
        |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY day) AS absorbed
        |  FROM r
        |)
        |SELECT day, n_risk, d, c,
        |  CASE WHEN absorbed = 1 THEN NULL
        |    ELSE CAST(sum(step) OVER (ORDER BY day) AS BIGINT)
        |    END AS logsurv_micro,
        |  CASE WHEN absorbed = 1 THEN 0.0
        |    ELSE round(exp(CAST(sum(step) OVER (ORDER BY day) AS DOUBLE)
        |      / 1000000), 6) END AS surv6
        |FROM s ORDER BY day""".stripMargin,

    "retention_cohorts" ->
      """WITH wk AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
        |), coh AS (
        |  SELECT user_id, wk,
        |    min(wk) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM wk
        |), per AS (
        |  SELECT DISTINCT user_id, cohort_week,
        |    wk - cohort_week AS week_offset FROM coh
        |)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM per GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "revenue_share" ->
      """WITH rev AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
        |  round(CAST(rev_dec AS DOUBLE) /
        |    CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS share
        |FROM rev ORDER BY n_name""".stripMargin,

    "user_event_types" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Same h60 formula as sample_hash; xor_agg is order-invariant on both
    // engines, so the digest survives any partitioning.
    "integrity_checksum" ->
      """SELECT source, count(*) AS n_docs,
        |  bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || md5(text)), 1, 15))::BIGINT)
        |    AS checksum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Drop-over-drop diff: digest compare on doc_id over the same
    // deterministic synthetic versions the Spark side builds.
    "corpus_diff" ->
      """WITH v_old AS (
        |  SELECT doc_id, source, md5(text) AS dig,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 11 <> 3
        |), v_new AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |             ELSE text END) AS dig,
        |    CAST(length(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |                     ELSE text END) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 11 <> 7
        |)
        |SELECT coalesce(v_new.source, v_old.source) AS source,
        |  CASE WHEN v_old.dig IS NULL THEN 'added'
        |       WHEN v_new.dig IS NULL THEN 'removed'
        |       WHEN v_old.dig = v_new.dig THEN 'unchanged'
        |       ELSE 'modified' END AS status,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(v_new.len, 0) - coalesce(v_old.len, 0))
        |    AS BIGINT) AS chars_delta
        |FROM v_old FULL OUTER JOIN v_new USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "mode_by_type" ->
      """SELECT event_type, mode_value, n FROM (
        |  SELECT event_type, value AS mode_value, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY count(*) DESC, value) AS rn
        |  FROM events GROUP BY event_type, value
        |) t WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "value_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Benford first-digit audit: digit via exact integer cents and a
    // string head (no float logs on the data path); restored 9-digit
    // grid; the reference mass enters once as a micro-floored log.
    "benford_values" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM events WHERE value > 0
        |), cnt AS (
        |  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        |  FROM cnt GROUP BY 1
        |), grid AS (
        |  SELECT t.event_type, t.total, d.digit
        |  FROM tot t CROSS JOIN
        |    (SELECT unnest(generate_series(1, 9)) AS digit) d
        |)
        |SELECT g.event_type, CAST(g.digit AS BIGINT) AS digit,
        |  coalesce(c.n, 0) AS n,
        |  CAST(coalesce(c.n, 0) * 1000000 // g.total AS BIGINT) AS p_micro,
        |  CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000) AS BIGINT)
        |    AS benford_micro,
        |  abs(CAST(coalesce(c.n, 0) * 1000000 // g.total AS BIGINT)
        |    - CAST(floor(ln(1 + 1.0 / g.digit) / ln(10) * 1000000)
        |      AS BIGINT)) AS dev_micro
        |FROM grid g LEFT JOIN cnt c
        |  ON c.event_type = g.event_type AND c.digit = g.digit
        |ORDER BY 1, 2""".stripMargin,

    // FK orphan audit: one scalar-subquery row per edge; NULL child
    // keys count as orphans (left-join-null = Spark anti-join-keep).
    "fk_orphans" ->
      """SELECT 'customer.nation' AS fk,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |   LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL) AS n_orphans
        |UNION ALL SELECT 'lineitem.order',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |   WHERE o.o_orderkey IS NULL)
        |UNION ALL SELECT 'lineitem.part',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |   WHERE p.p_partkey IS NULL)
        |UNION ALL SELECT 'lineitem.supplier',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |   WHERE s.s_suppkey IS NULL)
        |UNION ALL SELECT 'nation.region',
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation),
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation n
        |   LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |   WHERE r.r_regionkey IS NULL)
        |UNION ALL SELECT 'orders.customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE c.c_custkey IS NULL)
        |UNION ALL SELECT 'supplier.nation',
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier s
        |   LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |   WHERE n.n_nationkey IS NULL)
        |ORDER BY fk""".stripMargin,

    // ntile over the (value, event_id) total order: identical bucket
    // boundaries on both engines (a bare value order ties arbitrarily).
    "equidepth_histogram" ->
      """SELECT event_type, bucket, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS bucket
        |  FROM events) t
        |GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // lag over the per-user (epoch_us, event_id) order — the tiebreak
    // keeps same-timestamp neighbors deterministic across engines.
    "event_transitions" ->
      """SELECT prev_type, event_type AS next_type, count(*) AS n FROM (
        |  SELECT event_type, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events) t
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,

    // ── MarketStats oracles: the same exact-DECIMAL-sums + one-IEEE-op
    // recipe, written as literal formulas so both engines compute the
    // identical float. Tick order is (epoch_ns, event_id) throughout. ──
    "ohlc_bars" ->
      """SELECT event_type, window_start,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    value,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_ns(ts) // 600000000000
        |      ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type,
        |      epoch_ns(ts) // 600000000000
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |  FROM events) t
        |GROUP BY event_type, window_start
        |ORDER BY event_type, window_start""".stripMargin,

    // micro-unit floor price (tf·10⁶ div df convention — a float
    // quotient of these small-denominator rationals hits .5 rounding
    // boundaries where engines disagree; integer floor cannot)
    "vwap_hourly" ->
      """SELECT event_type, epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
        |  CASE WHEN sum(CAST(json_extract(props, '$.k') AS BIGINT)) <> 0 THEN
        |    CAST(CAST(sum(CAST(value AS DECIMAL(8,2)) *
        |          CAST(json_extract(props, '$.k') AS BIGINT)) * 1000000
        |        AS HUGEINT) //
        |      sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    END AS vwap_micro,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS volume,
        |  count(*) AS n_ticks
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "twap_daily" ->
      """SELECT event_type, day,
        |  CAST(CAST(sum(v * hold_ns) * 1000000 AS HUGEINT) //
        |    sum(hold_ns) AS BIGINT) AS twap_micro,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(value AS DECIMAL(8,2)) AS v,
        |    lead(epoch_ns(ts)) OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |      ORDER BY epoch_ns(ts), event_id) - epoch_ns(ts) AS hold_ns
        |  FROM events) t
        |WHERE hold_ns IS NOT NULL
        |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "realized_variation" ->
      """SELECT event_type, day,
        |  round(sqrt(CAST(sum(d * d) AS DOUBLE)), 6) AS rvar,
        |  count(*) AS n_returns
        |FROM (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(value AS DECIMAL(8,2)) - lag(CAST(value AS DECIMAL(8,2)))
        |      OVER (PARTITION BY event_type, epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts), event_id) AS d
        |  FROM events) t
        |WHERE d IS NOT NULL
        |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,

    "max_drawdown" ->
      """SELECT event_type,
        |  round(max((peak - value) / peak), 6) AS max_drawdown,
        |  count(*) AS n_ticks
        |FROM (
        |  SELECT event_type, value,
        |    max(value) OVER (PARTITION BY event_type
        |      ORDER BY epoch_ns(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

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

    // int8 quantization audit: identical double expression + identical
    // round-half-away in both engines → bit-portable integer checksums
    "quantize_int8" ->
      """WITH mx AS (
        |  SELECT vec_id,
        |    CAST(len(embedding) AS BIGINT) AS n_dims,
        |    list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
        |  FROM embeddings
        |)
        |SELECT m.vec_id, m.n_dims,
        |  CASE WHEN m.maxabs > 0 THEN round(m.maxabs / 127.0, 6) END AS scale6,
        |  CASE WHEN m.maxabs > 0 THEN
        |    CAST(list_aggregate(list_transform(e.embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m.maxabs, 0)
        |        AS BIGINT)), 'sum') AS BIGINT)
        |    ELSE 0 END AS q_sum,
        |  CASE WHEN m.maxabs > 0 THEN
        |    CAST(list_aggregate(list_transform(e.embedding,
        |      x -> abs(CAST(round(CAST(x AS DOUBLE) * 127.0 / m.maxabs, 0)
        |        AS BIGINT))), 'sum') AS BIGINT)
        |    ELSE 0 END AS q_l1
        |FROM mx m JOIN embeddings e USING (vec_id)
        |ORDER BY vec_id""".stripMargin,

    // PQ encode replayed over the write-time codebook dump (__AUX__ =
    // Verify's aux tables, same ingest-time-state contract as
    // ann_ivf_topk): slice each embedding into m=4 subvectors of 16
    // dims, recompute every per-subspace assignment as the cosine
    // argmax dot(sub, code)/|code| — the |sub| factor is constant
    // across codes, zero-norm codewords sink to -1e308, ties to the
    // lowest code — mirroring graft.functions.NearestCentroid exactly.
    "pq_encode" ->
      """WITH cb AS (
        |  SELECT sub, c_id, pos, w
        |  FROM read_parquet('__AUX__/pq_codebooks/*.parquet')
        |), cbn AS (
        |  SELECT sub, c_id, sqrt(sum(w*w)) AS cn FROM cb GROUP BY 1, 2
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), sub_elems AS (
        |  SELECT vec_id, CAST((i - 1) // 16 AS INT) AS sub,
        |    (i - 1) % 16 AS spos, x
        |  FROM elems
        |), dots AS (
        |  SELECT e.vec_id, e.sub, c.c_id, sum(e.x * c.w) AS dot
        |  FROM sub_elems e
        |  JOIN cb c ON c.sub = e.sub AND c.pos = e.spos
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT d.vec_id, d.sub, d.c_id, row_number() OVER (
        |    PARTITION BY d.vec_id, d.sub ORDER BY
        |      CASE WHEN n.cn = 0 THEN -1e308 ELSE d.dot / n.cn END DESC,
        |      d.c_id) AS r
        |  FROM dots d JOIN cbn n ON n.sub = d.sub AND n.c_id = d.c_id
        |)
        |SELECT vec_id, sub, c_id AS code FROM ranked WHERE r = 1
        |ORDER BY vec_id, sub""".stripMargin,

    // IVF-PQ ADC search replayed ENTIRELY from the write-time index
    // state: probe selection from the centroid dump (the ann_ivf_topk
    // CTE), candidate cells from the cell dump, candidate codes from
    // the codebook dump (the pq_encode CTE), and the ADC score as the
    // SAME fixed-order arithmetic the engine runs — per-subspace terms
    // pivoted, then added left-to-right: (d0+d1+d2+d3) /
    // (|q|·sqrt(n20+n21+n22+n23)), zero denominators to -1e308.
    "ann_ivf_pq_topk" ->
      """WITH cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), cb AS (
        |  SELECT sub, c_id, pos, w
        |  FROM read_parquet('__AUX__/pq_codebooks/*.parquet')
        |), cbn AS (
        |  SELECT sub, c_id, sqrt(sum(w*w)) AS cn, sum(w*w) AS n2
        |  FROM cb GROUP BY 1, 2
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), sub_elems AS (
        |  SELECT vec_id, CAST((i - 1) // 16 AS INT) AS sub,
        |    (i - 1) % 16 AS spos, x
        |  FROM elems
        |), cdots AS (
        |  SELECT e.vec_id, e.sub, c.c_id, sum(e.x * c.w) AS dot
        |  FROM sub_elems e
        |  JOIN cb c ON c.sub = e.sub AND c.pos = e.spos
        |  GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, sub, c_id AS code FROM (
        |    SELECT d.vec_id, d.sub, d.c_id, row_number() OVER (
        |      PARTITION BY d.vec_id, d.sub ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE d.dot / n.cn END DESC,
        |        d.c_id) AS r
        |    FROM cdots d JOIN cbn n ON n.sub = d.sub AND n.c_id = d.c_id) t
        |  WHERE r = 1
        |), qdot AS (
        |  SELECT e.vec_id AS query_id, c.c_id, sum(e.x * c.w) AS dot
        |  FROM elems e JOIN cents c ON c.pos = e.i - 1
        |  WHERE e.vec_id <= 4
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT query_id, c_id FROM (
        |    SELECT q.query_id, q.c_id, row_number() OVER (
        |      PARTITION BY q.query_id ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE q.dot / n.cn END DESC,
        |        q.c_id) AS r
        |    FROM qdot q JOIN cnorm n ON n.c_id = q.c_id) t
        |  WHERE r <= 4
        |), cands AS (
        |  SELECT p.query_id, cl.vec_id AS cand_id
        |  FROM probes p
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE cl.vec_id <> p.query_id
        |), terms AS (
        |  SELECT cd.query_id, cd.cand_id, k.sub, l.dot AS d, n.n2
        |  FROM cands cd
        |  JOIN codes k ON k.vec_id = cd.cand_id
        |  JOIN cdots l ON l.vec_id = cd.query_id AND l.sub = k.sub
        |    AND l.c_id = k.code
        |  JOIN cbn n ON n.sub = k.sub AND n.c_id = k.code
        |), piv AS (
        |  SELECT query_id, cand_id,
        |    max(CASE WHEN sub = 0 THEN d END) AS d0,
        |    max(CASE WHEN sub = 1 THEN d END) AS d1,
        |    max(CASE WHEN sub = 2 THEN d END) AS d2,
        |    max(CASE WHEN sub = 3 THEN d END) AS d3,
        |    max(CASE WHEN sub = 0 THEN n2 END) AS n20,
        |    max(CASE WHEN sub = 1 THEN n2 END) AS n21,
        |    max(CASE WHEN sub = 2 THEN n2 END) AS n22,
        |    max(CASE WHEN sub = 3 THEN n2 END) AS n23
        |  FROM terms GROUP BY 1, 2
        |), scored AS (
        |  SELECT p.query_id, p.cand_id,
        |    CASE WHEN nq.nrm * sqrt(p.n20 + p.n21 + p.n22 + p.n23) = 0
        |      THEN -1e308
        |      ELSE (p.d0 + p.d1 + p.d2 + p.d3)
        |        / (nq.nrm * sqrt(p.n20 + p.n21 + p.n22 + p.n23)) END AS adc
        |  FROM piv p JOIN norms nq ON nq.vec_id = p.query_id
        |), ranked AS (
        |  SELECT query_id, cand_id, adc, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc DESC, cand_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(adc, 6) AS adc6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // the full IVF-PQ serving chain: the SAME replayed ADC ranking cut
    // at shortlist 50, then ONLY those candidates fetch their true
    // vectors for the exact-cosine re-rank (zero-norm sink −1e308,
    // ties to lowest id — the ann_topk scoring contract)
    "ann_pq_refine" ->
      """WITH cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), cb AS (
        |  SELECT sub, c_id, pos, w
        |  FROM read_parquet('__AUX__/pq_codebooks/*.parquet')
        |), cbn AS (
        |  SELECT sub, c_id, sqrt(sum(w*w)) AS cn, sum(w*w) AS n2
        |  FROM cb GROUP BY 1, 2
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), sub_elems AS (
        |  SELECT vec_id, CAST((i - 1) // 16 AS INT) AS sub,
        |    (i - 1) % 16 AS spos, x
        |  FROM elems
        |), cdots AS (
        |  SELECT e.vec_id, e.sub, c.c_id, sum(e.x * c.w) AS dot
        |  FROM sub_elems e
        |  JOIN cb c ON c.sub = e.sub AND c.pos = e.spos
        |  GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, sub, c_id AS code FROM (
        |    SELECT d.vec_id, d.sub, d.c_id, row_number() OVER (
        |      PARTITION BY d.vec_id, d.sub ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE d.dot / n.cn END DESC,
        |        d.c_id) AS r
        |    FROM cdots d JOIN cbn n ON n.sub = d.sub AND n.c_id = d.c_id) t
        |  WHERE r = 1
        |), qdot AS (
        |  SELECT e.vec_id AS query_id, c.c_id, sum(e.x * c.w) AS dot
        |  FROM elems e JOIN cents c ON c.pos = e.i - 1
        |  WHERE e.vec_id <= 4
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT query_id, c_id FROM (
        |    SELECT q.query_id, q.c_id, row_number() OVER (
        |      PARTITION BY q.query_id ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE q.dot / n.cn END DESC,
        |        q.c_id) AS r
        |    FROM qdot q JOIN cnorm n ON n.c_id = q.c_id) t
        |  WHERE r <= 4
        |), cands AS (
        |  SELECT p.query_id, cl.vec_id AS cand_id
        |  FROM probes p
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE cl.vec_id <> p.query_id
        |), terms AS (
        |  SELECT cd.query_id, cd.cand_id, k.sub, l.dot AS d, n.n2
        |  FROM cands cd
        |  JOIN codes k ON k.vec_id = cd.cand_id
        |  JOIN cdots l ON l.vec_id = cd.query_id AND l.sub = k.sub
        |    AND l.c_id = k.code
        |  JOIN cbn n ON n.sub = k.sub AND n.c_id = k.code
        |), piv AS (
        |  SELECT query_id, cand_id,
        |    max(CASE WHEN sub = 0 THEN d END) AS d0,
        |    max(CASE WHEN sub = 1 THEN d END) AS d1,
        |    max(CASE WHEN sub = 2 THEN d END) AS d2,
        |    max(CASE WHEN sub = 3 THEN d END) AS d3,
        |    max(CASE WHEN sub = 0 THEN n2 END) AS n20,
        |    max(CASE WHEN sub = 1 THEN n2 END) AS n21,
        |    max(CASE WHEN sub = 2 THEN n2 END) AS n22,
        |    max(CASE WHEN sub = 3 THEN n2 END) AS n23
        |  FROM terms GROUP BY 1, 2
        |), scored AS (
        |  SELECT p.query_id, p.cand_id,
        |    CASE WHEN nq.nrm * sqrt(p.n20 + p.n21 + p.n22 + p.n23) = 0
        |      THEN -1e308
        |      ELSE (p.d0 + p.d1 + p.d2 + p.d3)
        |        / (nq.nrm * sqrt(p.n20 + p.n21 + p.n22 + p.n23)) END AS adc
        |  FROM piv p JOIN norms nq ON nq.vec_id = p.query_id
        |), short AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY adc DESC, cand_id) AS rank
        |    FROM scored) t
        |  WHERE rank <= 50
        |), edots AS (
        |  SELECT s.query_id, s.cand_id, sum(q.x * c.x) AS dot
        |  FROM short s
        |  JOIN elems q ON q.vec_id = s.query_id
        |  JOIN elems c ON c.vec_id = s.cand_id AND c.i = q.i
        |  GROUP BY 1, 2
        |), escored AS (
        |  SELECT e.query_id, e.cand_id,
        |    CASE WHEN nq.nrm * nc.nrm = 0 THEN -1e308
        |      ELSE e.dot / (nq.nrm * nc.nrm) END AS cos
        |  FROM edots e
        |  JOIN norms nq ON nq.vec_id = e.query_id
        |  JOIN norms nc ON nc.vec_id = e.cand_id
        |), eranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM escored
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(cos, 6) AS cos6
        |FROM eranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // cluster-balanced quota sample replayed from the write-time cell
    // assignment: per IVF cell, the `quota` smallest h60 priorities
    // (vec_id tiebreak) — the same deterministic-priority convention as
    // priority_sample, stratified by the persisted quantizer state
    "diversity_sample" ->
      """SELECT c_id, CAST(r AS BIGINT) AS rank, vec_id, pr FROM (
        |  SELECT cl.c_id, cl.vec_id,
        |    ('0x' || substr(md5(CAST(cl.vec_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS pr,
        |    row_number() OVER (PARTITION BY cl.c_id ORDER BY
        |      ('0x' || substr(md5(CAST(cl.vec_id AS VARCHAR)), 1, 15))::BIGINT,
        |      cl.vec_id) AS r
        |  FROM read_parquet('__AUX__/ivf_cells/*.parquet') cl) t
        |WHERE r <= 10 ORDER BY c_id, rank""".stripMargin,

    // per-cluster corpus map off the write-time cell dump: exact
    // BIGINT masses, dominant source = (count desc, source asc)
    // election, share = integer micro floor
    "cluster_profile" ->
      """WITH cl AS (
        |  SELECT vec_id AS doc_id, c_id
        |  FROM read_parquet('__AUX__/ivf_cells/*.parquet')
        |), j AS (
        |  SELECT cl.c_id, d.source, d.lang, d.n_chars
        |  FROM cl JOIN documents d USING (doc_id)
        |), bysrc AS (
        |  SELECT c_id, source, count(*) AS cnt,
        |    CAST(sum(n_chars) AS BIGINT) AS ch
        |  FROM j GROUP BY 1, 2
        |), per AS (
        |  SELECT c_id, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |    CAST(sum(ch) AS BIGINT) AS n_chars,
        |    count(*) AS n_sources
        |  FROM bysrc GROUP BY 1
        |), top AS (
        |  SELECT c_id, source AS top_source, cnt FROM (
        |    SELECT c_id, source, cnt, row_number() OVER (
        |      PARTITION BY c_id ORDER BY cnt DESC, source) AS r
        |    FROM bysrc) t WHERE r = 1
        |), lg AS (
        |  SELECT c_id, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |  FROM j GROUP BY 1
        |)
        |SELECT p.c_id, p.n_docs, p.n_chars, p.n_sources,
        |  t.top_source, t.cnt * 1000000 // p.n_docs
        |    AS top_source_share_micro,
        |  lg.n_langs
        |FROM per p JOIN top t USING (c_id) JOIN lg USING (c_id)
        |ORDER BY p.c_id""".stripMargin,

    // quantized-integer margin replayed bit-for-bit from the centroid
    // dump: qx/qw are single-op micro floors, dots exact BIGINT sums,
    // norms one floored sqrt of a < 2^53 integer, // truncates toward
    // zero like the engine's Java division; zero-norm centroids take
    // the −2^61 sentinel, tied top scores give margin 0
    "ivf_margin" ->
      """WITH qcents AS (
        |  SELECT c_id, pos, CAST(floor(w * 1000000.0) AS BIGINT) AS qw
        |  FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cn AS (
        |  SELECT c_id,
        |    CAST(floor(sqrt(CAST(sum(qw*qw) AS DOUBLE))) AS BIGINT) AS cn
        |  FROM qcents GROUP BY 1
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS qx
        |  FROM embeddings
        |), xn AS (
        |  SELECT vec_id,
        |    CAST(floor(sqrt(CAST(sum(qx*qx) AS DOUBLE))) AS BIGINT) AS xn
        |  FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id, c.c_id, CAST(sum(e.qx * c.qw) AS BIGINT) AS dot
        |  FROM elems e JOIN qcents c ON c.pos = e.i - 1
        |  GROUP BY 1, 2
        |), scores AS (
        |  SELECT d.vec_id, d.c_id,
        |    CASE WHEN n.cn = 0 THEN CAST(-2305843009213693952 AS BIGINT)
        |      ELSE d.dot // n.cn END AS s
        |  FROM dots d JOIN cn n ON n.c_id = d.c_id
        |), ranked AS (
        |  SELECT vec_id, c_id, s, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY s DESC, c_id) AS r
        |  FROM scores
        |), marg AS (
        |  SELECT a.vec_id, a.c_id,
        |    CASE WHEN x.xn = 0 THEN 0
        |      ELSE ((a.s - b.s) * 1000000) // x.xn END AS m
        |  FROM ranked a
        |  JOIN ranked b ON b.vec_id = a.vec_id AND b.r = 2
        |  JOIN xn x ON x.vec_id = a.vec_id
        |  WHERE a.r = 1
        |)
        |SELECT CAST(c_id AS INT) AS c_id,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(m) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_margin_micro
        |FROM marg GROUP BY 1 ORDER BY 1""".stripMargin,

    // the ivf_margin discipline over the PQ codebook dump: per-subspace
    // quantized argmax (ties to lowest code) and winning-score cosine
    // micros, all-integer, sentinel/zero-norm guards mirrored
    "pq_cell_stats" ->
      """WITH qcb AS (
        |  SELECT sub, c_id, pos, CAST(floor(w * 1000000.0) AS BIGINT) AS qw
        |  FROM read_parquet('__AUX__/pq_codebooks/*.parquet')
        |), cn AS (
        |  SELECT sub, c_id,
        |    CAST(floor(sqrt(CAST(sum(qw*qw) AS DOUBLE))) AS BIGINT) AS cn
        |  FROM qcb GROUP BY 1, 2
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS qx
        |  FROM embeddings
        |), sub_e AS (
        |  SELECT vec_id, CAST((i - 1) // 16 AS INT) AS sub,
        |    (i - 1) % 16 AS spos, qx
        |  FROM elems
        |), xn AS (
        |  SELECT vec_id, sub,
        |    CAST(floor(sqrt(CAST(sum(qx*qx) AS DOUBLE))) AS BIGINT) AS xn
        |  FROM sub_e GROUP BY 1, 2
        |), dots AS (
        |  SELECT e.vec_id, e.sub, c.c_id,
        |    CAST(sum(e.qx * c.qw) AS BIGINT) AS dot
        |  FROM sub_e e JOIN qcb c ON c.sub = e.sub AND c.pos = e.spos
        |  GROUP BY 1, 2, 3
        |), scores AS (
        |  SELECT d.vec_id, d.sub, d.c_id,
        |    CASE WHEN n.cn = 0 THEN CAST(-2305843009213693952 AS BIGINT)
        |      ELSE d.dot // n.cn END AS s
        |  FROM dots d JOIN cn n ON n.sub = d.sub AND n.c_id = d.c_id
        |), win AS (
        |  SELECT vec_id, sub, c_id AS code, s FROM (
        |    SELECT vec_id, sub, c_id, s, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY s DESC, c_id) AS r
        |    FROM scores) t
        |  WHERE r = 1
        |), cosm AS (
        |  SELECT w.vec_id, w.sub, w.code,
        |    CASE WHEN w.s = -2305843009213693952 THEN 0
        |      WHEN x.xn = 0 THEN 0
        |      ELSE (w.s * 1000000) // x.xn END AS cosm
        |  FROM win w JOIN xn x ON x.vec_id = w.vec_id AND x.sub = w.sub
        |)
        |SELECT CAST(sub AS INT) AS sub, CAST(code AS INT) AS code,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(cosm) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS mean_cos_micro
        |FROM cosm GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // recall@10 of the IVF index against the exact scorer: both top-k
    // lists rebuilt independently (the ann_topk and ann_ivf_topk CTEs),
    // hits counted by a left join, recall as exact integer micros
    "ann_recall" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), bdots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    sum(a.x * b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |    AND a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2
        |), branked AS (
        |  SELECT query_id, cand_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY
        |      dot/(na.nrm*nb.nrm) DESC, cand_id) AS rank
        |  FROM bdots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), exact AS (
        |  SELECT query_id, cand_id FROM branked WHERE rank <= 10
        |), cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), qdot AS (
        |  SELECT e.vec_id AS query_id, c.c_id, sum(e.x * c.w) AS dot
        |  FROM elems e JOIN cents c ON c.pos = e.i - 1
        |  WHERE e.vec_id <= 4
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT query_id, c_id FROM (
        |    SELECT q.query_id, q.c_id, row_number() OVER (
        |      PARTITION BY q.query_id ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE q.dot / n.cn END DESC,
        |        q.c_id) AS r
        |    FROM qdot q JOIN cnorm n ON n.c_id = q.c_id) t
        |  WHERE r <= 4
        |), cands AS (
        |  SELECT p.query_id, cl.vec_id AS cand_id
        |  FROM probes p
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE cl.vec_id <> p.query_id
        |), idots AS (
        |  SELECT cd.query_id, cd.cand_id, sum(a.x * b.x) AS dot
        |  FROM cands cd
        |  JOIN elems a ON a.vec_id = cd.query_id
        |  JOIN elems b ON b.vec_id = cd.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), iranked AS (
        |  SELECT query_id, cand_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY
        |      dot/(na.nrm*nb.nrm) DESC, cand_id) AS rank
        |  FROM idots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), approx AS (
        |  SELECT query_id, cand_id FROM iranked WHERE rank <= 10
        |)
        |SELECT e.query_id,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS recall_micro
        |FROM exact e
        |LEFT JOIN approx a
        |  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // fixed-point dimension moments: every term floored onto the micro
    // grid before summing (floor/product/f32-widen are bit-identical in
    // both engines), cov6 derived from the identical integers with the
    // identical operation tree; n² through DOUBLE like the Spark side
    "embedding_cov" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), pairs AS (
        |  SELECT CAST(a.i AS INT) AS i_dim, CAST(b.i AS INT) AS j_dim,
        |    CAST(count(*) AS BIGINT) AS n_vecs,
        |    CAST(sum(CAST(floor(a.x * b.x * 1000000.0) AS BIGINT))
        |      AS BIGINT) AS s_ij_q
        |  FROM elems a JOIN elems b
        |    ON b.vec_id = a.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2
        |), dims AS (
        |  SELECT CAST(i AS INT) AS dim,
        |    CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s_q
        |  FROM elems GROUP BY 1
        |)
        |SELECT p.i_dim, p.j_dim, p.n_vecs,
        |  di.s_q AS s_i_q, dj.s_q AS s_j_q, p.s_ij_q,
        |  round((CAST(p.s_ij_q AS DOUBLE) / p.n_vecs
        |    - CAST(di.s_q AS DOUBLE) * CAST(dj.s_q AS DOUBLE)
        |      / (CAST(p.n_vecs AS DOUBLE) * CAST(p.n_vecs AS DOUBLE))
        |      / 1000000.0)
        |    / 1000000.0, 6) + 0.0 AS cov6
        |FROM pairs p
        |JOIN dims di ON di.dim = p.i_dim
        |JOIN dims dj ON dj.dim = p.j_dim
        |ORDER BY p.i_dim, p.j_dim""".stripMargin,

    // power method over the exact integer covariance numerator
    // C_ij = n·s_ij − s_i·s_j: six iterations of HUGEINT
    // multiply-accumulate + truncating integer rescale (// ≡ Scala
    // BigInt /, both toward zero), replayed as unrolled CTEs — the
    // engine's driver BigInt loop stated verbatim; sign canonicalized
    // by the largest-|component| coordinate (ties to lowest dim)
    "pca_power" -> {
      val base =
        """WITH elems AS (
          |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
          |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
          |), pairsc AS (
          |  SELECT CAST(a.i AS INT) AS i_dim, CAST(b.i AS INT) AS j_dim,
          |    CAST(count(*) AS BIGINT) AS n_vecs,
          |    CAST(sum(CAST(floor(a.x * b.x * 1000000.0) AS BIGINT))
          |      AS BIGINT) AS s_ij_q
          |  FROM elems a JOIN elems b
          |    ON b.vec_id = a.vec_id AND b.i >= a.i
          |  GROUP BY 1, 2
          |), dims AS (
          |  SELECT CAST(i AS INT) AS dim,
          |    CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS BIGINT) AS s_q
          |  FROM elems GROUP BY 1
          |), cnum AS (
          |  SELECT p.i_dim, p.j_dim,
          |    CAST(p.n_vecs AS HUGEINT) * p.s_ij_q * 1000000
          |      - CAST(di.s_q AS HUGEINT) * dj.s_q AS c
          |  FROM pairsc p
          |  JOIN dims di ON di.dim = p.i_dim
          |  JOIN dims dj ON dj.dim = p.j_dim
          |), sym AS (
          |  SELECT i_dim AS i, j_dim AS j, c FROM cnum
          |  UNION ALL
          |  SELECT j_dim, i_dim, c FROM cnum WHERE i_dim <> j_dim
          |), v0 AS (
          |  SELECT dim, CAST(1000000 AS HUGEINT) AS v FROM dims
          |)""".stripMargin
      val steps = (1 to 6).map { t =>
        s""", u$t AS (
           |  SELECT s.i AS dim, sum(s.c * v.v) AS u
           |  FROM sym s JOIN v${t - 1} v ON v.dim = s.j GROUP BY 1
           |), m$t AS (
           |  SELECT max(abs(u)) AS s FROM u$t
           |), v$t AS (
           |  SELECT u.dim, CASE WHEN m.s = 0 THEN CAST(0 AS HUGEINT)
           |    ELSE (u.u * 1000000) // m.s END AS v
           |  FROM u$t u, m$t m
           |)""".stripMargin
      }.mkString("\n")
      val tail =
        """, sel AS (
          |  SELECT dim, v, row_number() OVER (
          |    ORDER BY abs(v) DESC, dim) AS r FROM v6
          |), sgn AS (
          |  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
          |  FROM sel WHERE r = 1
          |)
          |SELECT CAST(f.dim AS INT) AS dim,
          |  CAST(f.v * g.sg AS BIGINT) AS v_micro
          |FROM v6 f, sgn g ORDER BY dim""".stripMargin
      base + "\n" + steps + "\n" + tail
    },

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

    // forward as-of shifted by the horizon: future price = first tick of
    // the same instrument at or after t+30s; exact integer cents
    // tick-rule-signed markouts at four horizons off one signed pass +
    // one native forward ASOF per probe row; toward-zero integral mean
    "markout_curve" ->
      """WITH t AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), sg AS (
        |  SELECT event_type, ts, event_id, cents,
        |    coalesce(last_value(CASE WHEN d > 0 THEN 1
        |        WHEN d < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sign
        |  FROM (
        |    SELECT *, cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS d
        |    FROM t)
        |), h AS (
        |  SELECT CAST(unnest([1, 5, 30, 120]) AS BIGINT) AS horizon_sec
        |), q AS (
        |  SELECT sg.event_type, sg.cents, sg.sign, h.horizon_sec,
        |    sg.ts + to_microseconds(h.horizon_sec * 1000000) AS qts
        |  FROM sg CROSS JOIN h
        |), j AS (
        |  SELECT q.event_type, q.horizon_sec, q.sign,
        |    f.cents - q.cents AS m
        |  FROM q ASOF LEFT JOIN t f
        |    ON q.event_type = f.event_type AND f.ts >= q.qts
        |)
        |SELECT event_type, horizon_sec, count(m) AS n_marked,
        |  CAST(coalesce(sum(CASE WHEN m IS NOT NULL
        |    THEN CAST(sign AS HUGEINT) * m END), 0) AS BIGINT)
        |    AS signed_sum_cents,
        |  CASE WHEN count(m) > 0 THEN
        |    CAST((coalesce(sum(CASE WHEN m IS NOT NULL
        |      THEN CAST(sign AS HUGEINT) * m END), 0) * 1000000)
        |      // count(m) AS BIGINT) END AS mean_signed_micro
        |FROM j GROUP BY event_type, horizon_sec
        |ORDER BY event_type, horizon_sec""".stripMargin,

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

    "pair_correlation" ->
      """WITH buckets AS (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b USING (window_start)
        |  WHERE a.event_type < b.event_type
        |)
        |SELECT type_a, type_b,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // per-(pair, day) regime series of the same exact moment sums; NULL
    // where either leg is constant across the day's windows
    "pair_correlation_daily" ->
      """WITH buckets AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2, 3
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, day,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b USING (day, window_start)
        |  WHERE a.event_type < b.event_type
        |)
        |SELECT type_a, type_b, day,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b, day
        |ORDER BY type_a, type_b, day""".stripMargin,

    // running signed-volume sum on exact integers; the cumulative sum
    // widens to HUGEINT in DuckDB → CAST back to BIGINT
    "obv_daily" ->
      """WITH closes AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1
        |), vols AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |      AS volume
        |  FROM events GROUP BY 1, 2
        |), steps AS (
        |  SELECT c.event_type, c.day, v.volume,
        |    CASE WHEN c.cents - lag(c.cents) OVER w > 0 THEN v.volume
        |         WHEN c.cents - lag(c.cents) OVER w < 0 THEN -v.volume
        |         ELSE 0 END AS step
        |  FROM closes c JOIN vols v
        |    ON v.event_type = c.event_type AND v.day = c.day
        |  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.day)
        |)
        |SELECT event_type, day, volume,
        |  CAST(sum(step) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM steps ORDER BY event_type, day""".stripMargin,

    // band position on exact cents; numerator nonnegative so floor (//)
    // and Spark's truncating div agree
    "stochastic_k" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), rolled AS (
        |  SELECT event_type, day, close_c,
        |    max(high_c) OVER wr AS hh, min(low_c) OVER wr AS ll,
        |    count(*) OVER wr AS n_win
        |  FROM daily
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day, hh, ll,
        |  CASE WHEN hh <> ll
        |    THEN (close_c - ll) * 1000000 // (hh - ll) END AS k_micro
        |FROM rolled WHERE n_win = 14 ORDER BY event_type, day""".stripMargin,

    // OLS slope Δp ~ λ·flow: exact integer moment sums (HUGEINT), ONE
    // literal double evaluation — the pair_correlation pattern
    "kyle_lambda" ->
      """WITH bars AS (
        |  SELECT event_type, window_start,
        |    CAST(CAST(max(CASE WHEN rn_d = 1 THEN value END)
        |        AS DECIMAL(8,2)) * 100 AS BIGINT) -
        |      CAST(CAST(max(CASE WHEN rn_a = 1 THEN value END)
        |        AS DECIMAL(8,2)) * 100 AS BIGINT) AS dp
        |  FROM (
        |    SELECT event_type,
        |      epoch_ns(ts) // 3600000000000 * 3600 AS window_start, value,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 3600000000000
        |        ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 3600000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, window_start
        |), flow AS (
        |  SELECT event_type, window_start,
        |    CAST(sum(sign * size) AS BIGINT) AS imbalance
        |  FROM (
        |    SELECT event_type,
        |      epoch_ns(ts) // 3600000000000 * 3600 AS window_start,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      coalesce(last_value(chg_sign IGNORE NULLS) OVER wc, 0) AS sign
        |    FROM (
        |      SELECT event_type, ts, event_id, props,
        |        CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END AS chg_sign
        |      FROM (
        |        SELECT event_type, ts, event_id, props,
        |          CAST(value AS DECIMAL(8,2)) -
        |            lag(CAST(value AS DECIMAL(8,2))) OVER
        |              (PARTITION BY event_type
        |               ORDER BY epoch_ns(ts), event_id) AS d
        |        FROM events) a
        |    ) b
        |    WINDOW wc AS (PARTITION BY event_type
        |      ORDER BY epoch_ns(ts), event_id ROWS UNBOUNDED PRECEDING)
        |  ) c
        |  GROUP BY event_type, window_start
        |), xy AS (
        |  SELECT b.event_type, f.imbalance AS x, b.dp AS y
        |  FROM bars b JOIN flow f
        |    ON f.event_type = b.event_type
        |    AND f.window_start = b.window_start
        |)
        |SELECT event_type,
        |  round(CASE WHEN CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
        |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    END, 6) AS lambda_cents,
        |  count(*) AS n_windows
        |FROM xy GROUP BY event_type ORDER BY event_type""".stripMargin,

    // volume-weighted RSI on ×3 typical prices (exact cents, no ÷3);
    // flows ride HUGEINT, micro-percent floor like rsi_daily
    "money_flow_index" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    CAST(sum(size) AS BIGINT) AS volume
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), flows AS (
        |  SELECT event_type, day,
        |    tp3 - lag(tp3) OVER (PARTITION BY event_type ORDER BY day) AS d,
        |    CAST(tp3 AS HUGEINT) * volume AS flow
        |  FROM (SELECT event_type, day, high_c + low_c + close_c AS tp3,
        |    volume FROM daily) b
        |), rolled AS (
        |  SELECT event_type, day,
        |    sum(CASE WHEN d > 0 THEN flow ELSE 0 END) OVER wr AS pf,
        |    sum(CASE WHEN d < 0 THEN flow ELSE 0 END) OVER wr AS nf,
        |    count(d) OVER wr AS n_win
        |  FROM flows
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CASE WHEN pf + nf <> 0
        |    THEN CAST((pf * 100000000) // (pf + nf) AS BIGINT)
        |    END AS mfi_micro
        |FROM rolled WHERE n_win = 14
        |ORDER BY event_type, day""".stripMargin,

    // close-location flow with the +1 shift: floor on a NONNEGATIVE
    // numerator (portable), signed flow recovered after the floor
    "chaikin_ad" ->
      """WITH daily AS (
        |  SELECT event_type, day, max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    CAST(sum(size) AS BIGINT) AS volume
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      CAST(json_extract(props, '$.k') AS BIGINT) AS size,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), mfvs AS (
        |  SELECT event_type, day,
        |    CASE WHEN high_c <> low_c
        |      THEN CAST((2 * (close_c - low_c) * CAST(volume AS HUGEINT)
        |          * 1000000) // (high_c - low_c)
        |        - CAST(volume AS HUGEINT) * 1000000 AS BIGINT)
        |      ELSE 0 END AS mfv_micro
        |  FROM daily
        |)
        |SELECT event_type, day, mfv_micro,
        |  CAST(sum(mfv_micro) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ad_micro
        |FROM mfvs ORDER BY event_type, day""".stripMargin,

    // RMS drawdown off the prefix-max closes; ONE IEEE sqrt, floored
    // onto the x10^8 integer scale (a 6-dp round on a ~10^8 double is a
    // cross-engine rounding boundary)
    "ulcer_index" ->
      """WITH closes AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1
        |), dds AS (
        |  SELECT event_type, day,
        |    ((peak - cents) * 100000000) // peak AS dd
        |  FROM (
        |    SELECT event_type, day, cents,
        |      max(cents) OVER (PARTITION BY event_type ORDER BY day
        |        ROWS UNBOUNDED PRECEDING) AS peak
        |    FROM closes) p
        |), rolled AS (
        |  SELECT event_type, day,
        |    sum(CAST(dd AS HUGEINT) * dd) OVER wr AS ssq,
        |    count(*) OVER wr AS n_win
        |  FROM dds
        |  WINDOW wr AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  CAST(floor(sqrt(CAST(CAST(ssq // n_win AS BIGINT) AS DOUBLE)))
        |    AS BIGINT) AS ulcer_x8
        |FROM rolled WHERE n_win = 14
        |ORDER BY event_type, day""".stripMargin,

    // Fano factor of observed-window tick counts: exact moments, one
    // literal double evaluation
    "tick_burstiness" ->
      """WITH counts AS (
        |  SELECT event_type, epoch_ns(ts) // 600000000000 AS w,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type,
        |  round(CASE WHEN CAST(sum(c) AS DOUBLE) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(c * c) AS DOUBLE) -
        |        CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) /
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
        |    END, 6) AS fano6,
        |  count(*) AS n_windows
        |FROM counts GROUP BY event_type ORDER BY event_type""".stripMargin,

    // central moments from exact HUGEINT power sums; the closed forms
    // run once in double with the identical literal expression (m2^1.5
    // spelled m2*sqrt(m2), never pow)
    "ret_moments" ->
      """WITH rets AS (
        |  SELECT event_type,
        |    CAST(CAST(floor((cents - p_cents) * 1000000.0 / p_cents)
        |      AS BIGINT) AS HUGEINT) AS x
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
        |  WHERE p_cents IS NOT NULL
        |), sums AS (
        |  SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(x * x) AS DOUBLE) AS s2,
        |    CAST(sum(x * x * x) AS DOUBLE) AS s3,
        |    CAST(sum(x * x * x * x) AS DOUBLE) AS s4,
        |    count(*) AS n_days
        |  FROM rets GROUP BY 1
        |)
        |SELECT event_type,
        |  round(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0.0 THEN
        |    (s3 / n - 3 * (s1 / n) * (s2 / n)
        |      + 2 * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) *
        |      sqrt(s2 / n - (s1 / n) * (s1 / n))) END, 6) AS skew6,
        |  round(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0.0 THEN
        |    (s4 / n - 4 * (s1 / n) * (s3 / n)
        |      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) *
        |      (s2 / n - (s1 / n) * (s1 / n))) - 3 END, 6) AS kurt6,
        |  n_days
        |FROM sums ORDER BY event_type""".stripMargin,

    // asymmetric lagged co-movement: a's window vs b's PREVIOUS window
    "lead_lag_corr" ->
      """WITH buckets AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 600000000000 * 600 AS window_start,
        |    CAST(sum(CAST(value AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sv
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.sv AS x, b.sv AS y
        |  FROM buckets a JOIN buckets b
        |    ON a.window_start = b.window_start + 600
        |    AND a.event_type <> b.event_type
        |)
        |SELECT type_a, type_b,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr_lag1,
        |  count(*) AS n_windows
        |FROM pairs GROUP BY type_a, type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // Pearson over (r_t, r_{t-1}) pairs of the integer micro-returns
    "ret_autocorr" ->
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
        |), pairs AS (
        |  SELECT event_type, ret_micro AS x,
        |    lag(ret_micro) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM rets WHERE ret_micro IS NOT NULL
        |)
        |SELECT event_type,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS autocorr_lag1,
        |  count(*) AS n_pairs
        |FROM pairs WHERE y IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // daily OHLC in exact cents (id-broken open/close election), each
    // ln() micro-floored FIRST, then literal-double estimator + floor —
    // the same one-ln budget as dsir/lm_perplexity
    "range_volatility" ->
      """WITH daily AS (
        |  SELECT event_type, day,
        |    max(CASE WHEN rn_a = 1 THEN cents END) AS open_c,
        |    max(cents) AS high_c, min(cents) AS low_c,
        |    max(CASE WHEN rn_d = 1 THEN cents END) AS close_c,
        |    count(*) AS n_ticks
        |  FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts), event_id) AS rn_a,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn_d
        |    FROM events) t
        |  GROUP BY event_type, day
        |), logs AS (
        |  SELECT event_type, day, n_ticks,
        |    CASE WHEN low_c > 0 THEN
        |      CAST(floor(ln(CAST(high_c AS DOUBLE) / CAST(low_c AS DOUBLE))
        |        * 1000000.0) AS BIGINT) END AS lhl_micro,
        |    CASE WHEN open_c > 0 AND close_c > 0 THEN
        |      CAST(floor(ln(CAST(close_c AS DOUBLE) / CAST(open_c AS DOUBLE))
        |        * 1000000.0) AS BIGINT) END AS lco_micro
        |  FROM daily
        |)
        |SELECT event_type, day, n_ticks, lhl_micro, lco_micro,
        |  CAST(floor(CAST(lhl_micro * lhl_micro AS DOUBLE)
        |    / (4.0 * ln(2.0)) / 1000000.0) AS BIGINT) AS parkinson_micro,
        |  CAST(floor((0.5 * CAST(lhl_micro * lhl_micro AS DOUBLE)
        |    - (2.0 * ln(2.0) - 1.0) * CAST(lco_micro * lco_micro AS DOUBLE))
        |    / 1000000.0) AS BIGINT) AS gk_micro
        |FROM logs ORDER BY event_type, day""".stripMargin,

    // uncentered VR(5): exact HUGEINT second moments of the daily and
    // 5-day-rolling return sums, one nonnegative integral division
    "variance_ratio" ->
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
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |    sum(ret_micro) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5
        |  FROM rets WHERE ret_micro IS NOT NULL
        |)
        |SELECT event_type, count(*) AS n_days,
        |  CASE WHEN count(CASE WHEN rn >= 5 THEN 1 END) >= 1
        |      AND sum(CAST(r AS HUGEINT) * r) > 0 THEN
        |    CAST((sum(CASE WHEN rn >= 5 THEN CAST(s5 AS HUGEINT) * s5 END)
        |        * count(*) * 1000000)
        |      // (5 * sum(CAST(r AS HUGEINT) * r)
        |        * count(CASE WHEN rn >= 5 THEN 1 END)) AS BIGINT)
        |  END AS vr_micro
        |FROM seq GROUP BY event_type ORDER BY event_type""".stripMargin,

    // equal-weighted market day-return on the exact nano grid, OLS beta
    // via HUGEINT moment sums + toward-zero integral division (verified:
    // Spark `div` ≡ DuckDB `//` on negatives), ρ via the literal-double
    // closed form
    "market_beta" ->
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
        |), nn AS (
        |  SELECT event_type, day, ret_micro FROM rets
        |  WHERE ret_micro IS NOT NULL
        |), mkt AS (
        |  SELECT day, CAST(floor(CAST(sum(ret_micro) AS DOUBLE) * 1000.0
        |    / count(*)) AS BIGINT) AS mkt_nano
        |  FROM nn GROUP BY day
        |), j AS (
        |  SELECT event_type, CAST(mkt_nano AS HUGEINT) AS x,
        |    CAST(ret_micro AS HUGEINT) * 1000 AS y
        |  FROM nn JOIN mkt USING (day)
        |)
        |SELECT event_type, count(*) AS n_days,
        |  CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) > 0 THEN
        |    CAST(((count(*) * sum(x * y) - sum(x) * sum(y)) * 1000000)
        |      // (count(*) * sum(x * x) - sum(x) * sum(x)) AS BIGINT)
        |  END AS beta_micro,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS corr6
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    // tick-rule signs with IGNORE-NULLS inheritance, volume-clock bucket
    // assignment off the exclusive cumulative prefix, exact micro
    // imbalance — both running windows ride one per-instrument sort
    "vpin_buckets" ->
      """WITH ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS size
        |  FROM events
        |), signed AS (
        |  SELECT event_type, tns, event_id, size,
        |    cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS d
        |  FROM ticks
        |), sgn AS (
        |  SELECT event_type, size,
        |    coalesce(last_value(CASE WHEN d > 0 THEN 1
        |        WHEN d < 0 THEN -1 END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY tns, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sign,
        |    coalesce(CAST(sum(size) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS cum_prev
        |  FROM signed
        |)
        |SELECT event_type, cum_prev // 2000 AS bucket,
        |  CAST(sum(CASE WHEN sign = 1 THEN size ELSE 0 END) AS BIGINT)
        |    AS buy_vol,
        |  CAST(sum(CASE WHEN sign = -1 THEN size ELSE 0 END) AS BIGINT)
        |    AS sell_vol,
        |  CAST(sum(size) AS BIGINT) AS bucket_vol,
        |  count(*) AS n_ticks,
        |  CASE WHEN sum(size) > 0 THEN
        |    CAST(abs(sum(CASE WHEN sign = 1 THEN size ELSE 0 END) -
        |        sum(CASE WHEN sign = -1 THEN size ELSE 0 END)) * 1000000
        |      // sum(size) AS BIGINT) END AS imb_micro
        |FROM sgn GROUP BY event_type, cum_prev // 2000
        |ORDER BY event_type, bucket""".stripMargin,

    // pairwise day-close slopes (exact micro floors), discrete lower
    // median picked by rank — a value that exists, integer-exact
    "theil_sen_trend" ->
      ("""WITH daily AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |), slopes AS (
        |  SELECT a.event_type,
        |    CAST(floor((b.cents - a.cents) * 1000000.0 /
        |      (b.day - a.day)) AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |), ranked AS (
        |  SELECT event_type, slope_micro,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_micro) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM slopes
        |)
        |SELECT event_type, n AS n_pairs, slope_micro AS ts_slope_micro
        |FROM ranked WHERE rn = (n + 1) // 2
        |ORDER BY event_type""").stripMargin,

    // strict-below-prior-peak flags, gaps-and-islands spell lengths
    "drawdown_durations" ->
      ("""WITH daily AS (
        |  SELECT event_type, day, cents FROM (
        |    SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |      CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents,
        |      row_number() OVER (PARTITION BY event_type,
        |        epoch_ns(ts) // 86400000000000
        |        ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |    FROM events) t
        |  WHERE rn = 1
        |), f AS (
        |  SELECT event_type, day, cents,
        |    max(cents) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS peak,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM daily
        |), g AS (
        |  SELECT event_type, rn,
        |    CASE WHEN peak IS NOT NULL AND cents < peak
        |      THEN 1 ELSE 0 END AS uw,
        |    sum(CASE WHEN peak IS NOT NULL AND cents < peak
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ru
        |  FROM f
        |), spells AS (
        |  SELECT event_type, rn - ru AS island, count(*) AS len
        |  FROM g WHERE uw = 1 GROUP BY event_type, rn - ru
        |), tot AS (
        |  SELECT event_type, CAST(sum(uw) AS BIGINT) AS underwater_days
        |  FROM g GROUP BY 1
        |), sp AS (
        |  SELECT event_type, count(*) AS n_spells,
        |    CAST(max(len) AS BIGINT) AS longest_spell
        |  FROM spells GROUP BY 1
        |)
        |SELECT t.event_type, t.underwater_days,
        |  coalesce(s.n_spells, 0) AS n_spells,
        |  coalesce(s.longest_spell, 0) AS longest_spell
        |FROM tot t LEFT JOIN sp s USING (event_type)
        |ORDER BY event_type""").stripMargin,

    // observation-lag ACF via a row_number self-join — one exploded
    // relation serves all five lags; pearson per (type, lag)
    "ret_acf" ->
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
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM rets WHERE ret_micro IS NOT NULL
        |), lags AS (
        |  SELECT CAST(unnest([1, 2, 3, 4, 5]) AS BIGINT) AS lag
        |), pairs AS (
        |  SELECT a.event_type, l.lag, a.r AS x, b.r AS y
        |  FROM seq a CROSS JOIN lags l
        |  JOIN seq b ON b.event_type = a.event_type AND b.rn = a.rn - l.lag
        |)
        |SELECT event_type, lag,
        |  round(CASE WHEN
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) > 0.0
        |      AND
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |        CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) > 0.0
        |    THEN (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE) -
        |        CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) /
        |      (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE) -
        |          CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) *
        |        sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE) -
        |          CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
        |    END, 6) AS acf6,
        |  count(*) AS n_pairs
        |FROM pairs GROUP BY event_type, lag
        |ORDER BY event_type, lag""".stripMargin,

    // scaled-integer R/S per full block (X_i = n·C_i − i·S exact, one
    // sqrt+divide per block, micro-floored BEFORE the exact-integer
    // cross-block mean)
    "hurst_rs" ->
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
        |), seq AS (
        |  SELECT event_type, ret_micro AS r,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |  FROM rets WHERE ret_micro IS NOT NULL
        |), sizes AS (
        |  SELECT CAST(unnest([8, 16, 32]) AS BIGINT) AS block_n
        |), e AS (
        |  SELECT s.event_type, z.block_n, (s.rn - 1) // z.block_n AS blk,
        |    (s.rn - 1) % z.block_n + 1 AS i, s.r
        |  FROM seq s CROSS JOIN sizes z
        |), w AS (
        |  SELECT event_type, block_n, blk, i, r,
        |    sum(r) OVER (PARTITION BY event_type, block_n, blk ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
        |    sum(r) OVER (PARTITION BY event_type, block_n, blk) AS s_blk,
        |    count(*) OVER (PARTITION BY event_type, block_n, blk) AS cnt
        |  FROM e
        |), xb AS (
        |  SELECT event_type, block_n, blk,
        |    max(block_n * c - i * s_blk) - min(block_n * c - i * s_blk)
        |      AS r_scaled,
        |    block_n * sum(CAST(r AS HUGEINT) * r) -
        |      sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)) AS den
        |  FROM w WHERE cnt = block_n
        |  GROUP BY event_type, block_n, blk
        |), rsm AS (
        |  SELECT event_type, block_n,
        |    CAST(floor(CAST(r_scaled AS DOUBLE) / sqrt(CAST(den AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS rs_micro
        |  FROM xb WHERE den > 0
        |)
        |SELECT event_type, block_n, count(*) AS n_blocks,
        |  CAST(sum(rs_micro) // count(*) AS BIGINT) AS mean_rs_micro
        |FROM rsm GROUP BY event_type, block_n
        |ORDER BY event_type, block_n""".stripMargin,

    // serial covariance of consecutive cent changes; sign test on the
    // exact integer numerator, ONE literal double (divide, sqrt, ×2)
    "roll_spread" ->
      """WITH ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), dd AS (
        |  SELECT event_type, tns, event_id,
        |    cents - lag(cents) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS d
        |  FROM ticks
        |), pairs AS (
        |  SELECT event_type, CAST(d AS HUGEINT) AS x,
        |    CAST(lag(d) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS HUGEINT) AS y
        |  FROM dd
        |)
        |SELECT event_type, count(*) AS n_pairs,
        |  round(CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0
        |    THEN 2.0 * sqrt(
        |      CAST(-(count(*) * sum(x * y) - sum(x) * sum(y)) AS DOUBLE) /
        |      CAST(count(*) * count(*) AS DOUBLE))
        |  END, 6) AS roll_spread6
        |FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // bar closes at each frequency from ONE tick relation crossed with
    // the frequency list; RV = exact Σr² of the differenced closes
    "vol_signature" ->
      """WITH f AS (
        |  SELECT CAST(unnest([60, 300, 600, 1800]) AS BIGINT) AS freq_sec
        |), ticks AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id,
        |    CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), wb AS (
        |  SELECT t.event_type, f.freq_sec,
        |    tns // (f.freq_sec * 1000000000) * f.freq_sec AS window_start,
        |    cents,
        |    row_number() OVER (PARTITION BY t.event_type, f.freq_sec,
        |      tns // (f.freq_sec * 1000000000)
        |      ORDER BY tns DESC, event_id DESC) AS rn_d
        |  FROM ticks t CROSS JOIN f
        |), bars AS (
        |  SELECT event_type, freq_sec, window_start, cents AS close_c
        |  FROM wb WHERE rn_d = 1
        |), r AS (
        |  SELECT event_type, freq_sec,
        |    close_c - lag(close_c) OVER (PARTITION BY event_type, freq_sec
        |      ORDER BY window_start) AS r
        |  FROM bars
        |)
        |SELECT event_type, freq_sec, count(*) AS n_bars,
        |  CAST(sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS rv_cents2
        |FROM r WHERE r IS NOT NULL
        |GROUP BY event_type, freq_sec
        |ORDER BY event_type, freq_sec""".stripMargin,

    // robust location: drop outside the exact-discrete [p05, p95], mean
    // of survivors as the micro-int floor of an exact DECIMAL sum
    "trimmed_mean" ->
      """WITH cd AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |    min(CASE WHEN cd >= 0.05 THEN value END) AS p_lo,
        |    min(CASE WHEN cd >= 0.95 THEN value END) AS p_hi
        |  FROM cd GROUP BY event_type
        |)
        |SELECT e.event_type,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) * 1000000 AS HUGEINT)
        |    // count(*) AS BIGINT) AS trimmed_mean_micro,
        |  count(*) AS n_kept
        |FROM events e JOIN b ON b.event_type = e.event_type
        |WHERE e.value >= b.p_lo AND e.value <= b.p_hi
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // time-bounded association numerator: distinct (user, window, type)
    // cells, window-local pair join, exact counts
    // co-presence pair generator (hot cells above 20 users dropped,
    // the df-cut pattern) + the dedup_groups recursive-CTE closure
    "user_communities" ->
      """WITH RECURSIVE cells AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 600000000000 AS w, event_type
        |  FROM events
        |), keep AS (
        |  SELECT w, event_type FROM cells
        |  GROUP BY 1, 2 HAVING count(*) <= 20
        |), bounded AS (
        |  SELECT c.user_id, c.w, c.event_type
        |  FROM cells c JOIN keep USING (w, event_type)
        |), pairs AS (
        |  SELECT DISTINCT a.user_id AS id_a, b.user_id AS id_b
        |  FROM bounded a JOIN bounded b
        |    ON a.w = b.w AND a.event_type = b.event_type
        |    AND a.user_id < b.user_id
        |), und AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        |), members AS (SELECT DISTINCT a AS id FROM und)
        |SELECT m.id AS user_id, least(m.id, min(r.dst)) AS community_id
        |FROM members m JOIN reach r ON r.src = m.id
        |GROUP BY m.id ORDER BY user_id""".stripMargin,

    // lag/cumsum session assembly on the (ts, event_id) order; entry =
    // first event per session; exact micro ratios
    "session_stats" ->
      """WITH o AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, event_type, event_id, us, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), per AS (
        |  SELECT user_id, sid,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        |    count(*) AS n_events
        |  FROM (
        |    SELECT user_id, sid, event_type, row_number() OVER (
        |      PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
        |    FROM s) t
        |  GROUP BY user_id, sid
        |)
        |SELECT entry_type, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bounce_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS bounce_micro,
        |  CAST(sum(n_events) * 1000000 // count(*) AS BIGINT)
        |    AS mean_events_micro
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-user volume shares squared on HUGEINT — no float shares summed
    "volume_hhi" ->
      """WITH per AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, count(*) AS n_users,
        |  CAST(sum(v) AS BIGINT) AS total_vol,
        |  CASE WHEN sum(v) > 0 THEN
        |    CAST((sum(CAST(v AS HUGEINT) * v) * 1000000)
        |      // (CAST(sum(v) AS HUGEINT) * sum(v)) AS BIGINT) END
        |    AS hhi_micro,
        |  CASE WHEN sum(v) > 0 THEN
        |    CAST((CAST(max(v) AS HUGEINT) * 1000000)
        |      // CAST(sum(v) AS HUGEINT) AS BIGINT) END
        |    AS top_share_micro
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "temporal_copresence" ->
      """WITH cells AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 600000000000 AS w, event_type
        |  FROM events
        |)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_copresent
        |FROM cells a JOIN cells b
        |  ON a.user_id = b.user_id AND a.w = b.w
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    // association lift = N·c_ab/(c_a·c_b) on exact integers — the
    // log-free PMI surrogate; products ride HUGEINT
    "type_pair_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |), totals AS (
        |  SELECT event_type, count(*) AS c FROM ut GROUP BY 1
        |), n AS (
        |  SELECT count(DISTINCT user_id) AS n_users FROM ut
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS c_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT p.type_a, p.type_b, CAST(p.c_ab AS BIGINT) AS c_ab,
        |  CAST(CAST(n.n_users AS HUGEINT) * p.c_ab * 1000000 //
        |    (CAST(ta.c AS HUGEINT) * tb.c) AS BIGINT) AS lift_micro
        |FROM pairs p
        |JOIN totals ta ON ta.event_type = p.type_a
        |JOIN totals tb ON tb.event_type = p.type_b
        |CROSS JOIN n
        |ORDER BY p.type_a, p.type_b""".stripMargin,

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

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    // Normalization identical to graft.functions.TextOps.normalize:
    // lower → strip non-[a-z0-9 ] → squeeze spaces → trim. The df-cut
    // (spost/hot/fpost) mirrors Dedup.ngramJaccardPairs' live skew guard:
    // hot shingles detected on the deterministic 1% h60 doc sample
    // (sample df > 10 ⟺ df ≳ 1000) are dropped before the join; sizes
    // stay unfiltered.
    "ngram_jaccard_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, unnest(shs) AS s FROM sh
        |), spost AS (
        |  SELECT doc_id, s FROM post
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM spost GROUP BY 1) d
        |  WHERE df > 10
        |), fpost AS (
        |  SELECT doc_id, s FROM post WHERE s NOT IN (SELECT s FROM hot)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM post GROUP BY 1
        |), common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        |  FROM fpost a JOIN fpost b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE), 6) AS jaccard6
        |FROM common
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // Sparse tf-cosine pairs: the ngram_jaccard_pairs CTE chain with
    // OCCURRENCE counts instead of distinct postings (no list_distinct),
    // the same sampled hot-shingle cut on the (doc, shingle) relation,
    // norms over the UNCUT tf vectors, and the single-IEEE-divide
    // cosine re-derived from the three exact integers.
    "tf_cosine_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END AS shs FROM toks
        |), tf AS (
        |  SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(shs) AS s FROM sh) GROUP BY 1, 2
        |), stf AS (
        |  SELECT doc_id, s FROM tf
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM stf GROUP BY 1) d
        |  WHERE df > 10
        |), kept AS (
        |  SELECT doc_id, s, tf FROM tf WHERE s NOT IN (SELECT s FROM hot)
        |), nrm AS (
        |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1
        |), dot AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, dot, na.n2 AS norm2_a, nb.n2 AS norm2_b,
        |  round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 6) AS cos6
        |FROM dot JOIN nrm na ON na.doc_id = id_a JOIN nrm nb ON nb.doc_id = id_b
        |WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // tf-idf weighted cosine: the tf_cosine chain with each shingle's
    // tf scaled by the milli-floored ln(N/df); dot/norms sum through
    // HUGEINT (mirror of the Spark DECIMAL(38,0) ladder), one final
    // IEEE divide over explicit double casts on both engines.
    "tfidf_cosine_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END AS shs FROM toks
        |), tf AS (
        |  SELECT doc_id, s, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(shs) AS s FROM sh) GROUP BY 1, 2
        |), nd AS (
        |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf
        |), dfc AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), wgt AS (
        |  SELECT tf.doc_id, tf.s,
        |    CAST(tf.tf * CAST(floor(ln(CAST(n AS DOUBLE) / df) * 1000)
        |      AS BIGINT) AS BIGINT) AS w
        |  FROM tf JOIN dfc USING (s) CROSS JOIN nd
        |), stf AS (
        |  SELECT doc_id, s FROM tf
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS c FROM stf GROUP BY 1) d
        |  WHERE c > 10
        |), kept AS (
        |  SELECT doc_id, s, w FROM wgt WHERE s NOT IN (SELECT s FROM hot)
        |), nrm AS (
        |  SELECT doc_id, CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS n2
        |  FROM wgt GROUP BY 1
        |), dot AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(sum(CAST(a.w AS HUGEINT) * b.w) AS HUGEINT) AS dot
        |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(dot AS DOUBLE)
        |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos6
        |FROM dot JOIN nrm na ON na.doc_id = id_a
        |JOIN nrm nb ON nb.doc_id = id_b
        |WHERE na.n2 > 0 AND nb.n2 > 0
        |  AND CAST(dot AS DOUBLE)
        |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // Same inverted-index + df-cut CTE chain as ngram_jaccard_pairs; only
    // the scoring differs (per-side containment, pair kept when EITHER
    // direction clears the threshold — the filter runs on unrounded
    // doubles exactly like the Spark side).
    // per-source bottom-128 of distinct h60 shingle hashes; bottom-k
    // sets are min-union mergeable, so re-ranking the two sketches'
    // union and cutting at k is EXACTLY the union corpus's bottom-k
    // sample — the min-wise Jaccard estimate replayed sketch-error
    // and all (HUGEINT sums cast back to BIGINT, // division)
    "corpus_overlap_kmv" ->
      """WITH norm AS (
        |  SELECT doc_id, source, trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents
        |), toks AS (
        |  SELECT source, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT source, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT source, unnest(shs) AS s FROM sh
        |), hashes AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM post
        |), sketch AS (
        |  SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (
        |      PARTITION BY source ORDER BY h) AS rn FROM hashes) t
        |  WHERE rn <= 128
        |), srcs AS (
        |  SELECT DISTINCT source FROM sketch
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM srcs a JOIN srcs b ON a.source < b.source
        |), uni AS (
        |  SELECT src_a, src_b, h,
        |    max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
        |    FROM pairs p JOIN sketch s ON s.source = p.src_a
        |    UNION ALL
        |    SELECT p.src_a, p.src_b, s.h, 0, 1
        |    FROM pairs p JOIN sketch s ON s.source = p.src_b) u
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT src_a, src_b, h, in_a, in_b, row_number() OVER (
        |    PARTITION BY src_a, src_b ORDER BY h) AS rn FROM uni
        |)
        |SELECT src_a, src_b,
        |  CAST(count(*) AS BIGINT) AS k_used,
        |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_both,
        |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |    AS jaccard_micro
        |FROM ranked WHERE rn <= 128
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "containment_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, unnest(shs) AS s FROM sh
        |), spost AS (
        |  SELECT doc_id, s FROM post
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM spost GROUP BY 1) d
        |  WHERE df > 10
        |), fpost AS (
        |  SELECT doc_id, s FROM post WHERE s NOT IN (SELECT s FROM hot)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM post GROUP BY 1
        |), common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        |  FROM fpost a JOIN fpost b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  round(CAST(n_common AS DOUBLE) / CAST(na.n_sh AS DOUBLE), 6) AS cont_a6,
        |  round(CAST(n_common AS DOUBLE) / CAST(nb.n_sh AS DOUBLE), 6) AS cont_b6
        |FROM common
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE greatest(CAST(n_common AS DOUBLE) / CAST(na.n_sh AS DOUBLE),
        |               CAST(n_common AS DOUBLE) / CAST(nb.n_sh AS DOUBLE)) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,

    // same inverted-index CTE chain; final select buckets the exact
    // micro Jaccard into deciles (all nonnegative integral divisions)
    "jaccard_histogram" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, unnest(shs) AS s FROM sh
        |), spost AS (
        |  SELECT doc_id, s FROM post
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM spost GROUP BY 1) d
        |  WHERE df > 10
        |), fpost AS (
        |  SELECT doc_id, s FROM post WHERE s NOT IN (SELECT s FROM hot)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM post GROUP BY 1
        |), common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        |  FROM fpost a JOIN fpost b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), jm AS (
        |  SELECT n_common * 1000000 // (na.n_sh + nb.n_sh - n_common)
        |    AS j_micro
        |  FROM common
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |)
        |SELECT j_micro // 100000 AS bucket, count(*) AS n_pairs,
        |  CAST(max(j_micro) AS BIGINT) AS max_j_micro
        |FROM jm GROUP BY 1 ORDER BY 1""".stripMargin,

    // Lee et al. exact-substring spans: census every length-20 word
    // window (0-based start to match posexplode), duplicated = its md5
    // 60-bit hash occurs >= 2 times corpus-wide (same-doc repeats
    // count), then per-doc interval union via gaps-and-islands (gap >
    // 20 opens a new island)
    "dup_substrings" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), grams0 AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 20
        |    THEN list_transform(generate_series(1, len(w) - 19),
        |      i -> struct_pack(pos := i - 1,
        |        g := array_to_string(w[i:i+19], ' ')))
        |    ELSE [] END AS gl FROM toks
        |), census AS (
        |  SELECT doc_id, unnest(gl, recursive := true) FROM grams0
        |), hashed AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM census
        |), dup AS (
        |  SELECT h FROM hashed GROUP BY h HAVING count(*) >= 2
        |), ds AS (
        |  SELECT doc_id, pos FROM hashed WHERE h IN (SELECT h FROM dup)
        |), fl AS (
        |  SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (
        |      PARTITION BY doc_id ORDER BY pos) > 20
        |    THEN 1 ELSE 0 END AS nf FROM ds
        |), isl AS (
        |  SELECT doc_id, pos, sum(nf) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl FROM fl
        |)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start,
        |  CAST(max(pos) + 20 - min(pos) AS BIGINT) AS len,
        |  count(*) AS n_windows
        |FROM isl GROUP BY doc_id, isl
        |ORDER BY doc_id, start""".stripMargin,

    // the APPLY half: same census/dup-starts CTEs, then every token at
    // a position within 20 of the latest duplicated start at-or-before
    // it is removed; cleaned text reassembled in token order
    "dup_substrings_apply" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), grams0 AS (
        |  SELECT doc_id, CASE WHEN len(w) >= 20
        |    THEN list_transform(generate_series(1, len(w) - 19),
        |      i -> struct_pack(pos := i - 1,
        |        g := array_to_string(w[i:i+19], ' ')))
        |    ELSE [] END AS gl FROM toks
        |), census AS (
        |  SELECT doc_id, unnest(gl, recursive := true) FROM grams0
        |), hashed AS (
        |  SELECT doc_id, pos,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM census
        |), dup AS (
        |  SELECT h FROM hashed GROUP BY h HAVING count(*) >= 2
        |), ds AS (
        |  SELECT doc_id, pos FROM hashed WHERE h IN (SELECT h FROM dup)
        |), tokpos0 AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(w)),
        |    i -> struct_pack(pos := i - 1, tok := w[i])) AS tl FROM toks
        |), tokpos AS (
        |  SELECT doc_id, unnest(tl, recursive := true) FROM tokpos0
        |), cov AS (
        |  SELECT t.doc_id, t.pos, t.tok,
        |    max(CASE WHEN d.pos IS NOT NULL THEN t.pos END) OVER (
        |      PARTITION BY t.doc_id ORDER BY t.pos
        |      ROWS UNBOUNDED PRECEDING) AS cs
        |  FROM tokpos t LEFT JOIN ds d
        |    ON d.doc_id = t.doc_id AND d.pos = t.pos
        |), kept AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM cov WHERE cs IS NULL OR cs + 20 <= pos GROUP BY 1
        |), base AS (
        |  SELECT doc_id, len(w) AS n_tokens FROM toks
        |)
        |SELECT b.doc_id, coalesce(k.clean_text, '') AS clean_text,
        |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(b.n_tokens - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // C4-style corpus line dedup over fixed 8-token blocks; keeper = the
    // occurrence at the smallest (doc_id, block_idx). string_agg FILTER
    // needs the coalesce: a doc whose every block loses still emits ''.
    "line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), blocks AS (
        |  SELECT doc_id, i AS block_idx,
        |    array_to_string(t[(i*8+1):(i*8+8)], ' ') AS block
        |  FROM toks, unnest(generate_series(CAST(0 AS BIGINT),
        |    CAST((len(t) + 7) // 8 AS BIGINT) - 1)) AS g(i)
        |), flagged AS (
        |  SELECT doc_id, block_idx, block,
        |    row_number() OVER (PARTITION BY block ORDER BY doc_id, block_idx) AS rn
        |  FROM blocks
        |)
        |SELECT doc_id, count(*) AS n_blocks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(block, ' ' ORDER BY block_idx)
        |    FILTER (WHERE rn = 1), '') AS clean_text
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Portable sketches: the oracle rebuilds the exact 60-bit md5-derived
    // hashes (h60 = first 15 hex chars of md5 as BIGINT), so MinHash
    // signatures, SimHash fingerprints, and LSH buckets hash-match.
    "minhash_lsh_pairs" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_a, id_b, jaccard6 FROM pairs
         |ORDER BY id_a, id_b""".stripMargin,

    // Blocking-quality audit: the LSH candidate CTE chain (cand) plus
    // the ngram_jaccard exact chain (sampled hot cut over the same
    // uncut postings) as truth; four exact counts, two integral micro
    // ratios (pair universe widened through HUGEINT, ÷0 → NULL).
    "blocking_quality" ->
      s"""WITH ${minhashCtes("a.doc_id < b.doc_id")},
         |spost2 AS (
         |  SELECT doc_id, s FROM post
         |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
         |), hot2 AS (
         |  SELECT s FROM (SELECT s, count(*) AS df FROM spost2 GROUP BY 1) d
         |  WHERE df > 10
         |), fpost2 AS (
         |  SELECT doc_id, s FROM post WHERE s NOT IN (SELECT s FROM hot2)
         |), ecommon AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
         |  FROM fpost2 a JOIN fpost2 b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), etrue AS (
         |  SELECT id_a, id_b FROM ecommon
         |  JOIN sizes na ON na.doc_id = id_a
         |  JOIN sizes nb ON nb.doc_id = id_b
         |  WHERE CAST(n_common AS DOUBLE)
         |    / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.8
         |), nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM etrue),
         |nh AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hit
         |  FROM cand JOIN etrue USING (id_a, id_b)
         |), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT n_docs, n_cand, n_true, n_hit,
         |  CAST(1000000 - CAST(n_cand AS HUGEINT) * 1000000
         |    // (CAST(n_docs AS HUGEINT) * (n_docs - 1) // 2) AS BIGINT)
         |    AS rr_micro,
         |  CAST(n_hit * 1000000 // n_true AS BIGINT) AS pc_micro
         |FROM nd CROSS JOIN nc CROSS JOIN nt CROSS JOIN nh""".stripMargin,

    // Membership-only wrap of the same verified-pair CTEs: a doc is
    // "dup" iff it appears in any pair; per-source exact micro rate.
    "source_dup_rate" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), members AS (SELECT DISTINCT a AS id FROM und)
         |SELECT source, n_docs, n_dup_docs,
         |  CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_frac_micro
         |FROM (
         |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN m.id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_dup_docs
         |  FROM documents d LEFT JOIN members m ON m.id = d.doc_id
         |  GROUP BY 1
         |) ORDER BY source""".stripMargin,

    // Transitive closure of the verified pairs via a recursive CTE —
    // mirrors Dedup.connectedComponents' min-label propagation.
    "dedup_groups" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
         |), members AS (SELECT DISTINCT a AS id FROM und)
         |SELECT m.id AS doc_id, least(m.id, min(r.dst)) AS rep_id
         |FROM members m JOIN reach r ON r.src = m.id
         |GROUP BY m.id ORDER BY doc_id""".stripMargin,

    // group-size histogram over the same transitive closure
    "dedup_group_sizes" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
         |), members AS (SELECT DISTINCT a AS id FROM und),
         |groups AS (
         |  SELECT m.id AS doc_id, least(m.id, min(r.dst)) AS rep_id
         |  FROM members m JOIN reach r ON r.src = m.id GROUP BY m.id
         |), gsz AS (
         |  SELECT rep_id, count(*) AS group_size FROM groups GROUP BY 1
         |)
         |SELECT group_size, count(*) AS n_groups
         |FROM gsz GROUP BY 1 ORDER BY group_size""".stripMargin,

    // Cross-corpus variant: same chain, side predicates in cand.
    "dedup_against" ->
      s"""WITH ${minhashCtes("a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0")}
         |SELECT id_a AS new_id, id_b AS corpus_id, jaccard6 FROM pairs
         |ORDER BY new_id, corpus_id""".stripMargin,

    // Split key = group representative (recursive CTE as dedup_groups)
    // for members, own id for singletons; hash-mod assignment mirrors
    // sample_hash's h60 idiom, so split membership is engine-identical.
    "leakage_safe_split" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
         |), members AS (SELECT DISTINCT a AS id FROM und
         |), grp AS (
         |  SELECT m.id AS doc_id, least(m.id, min(r.dst)) AS rep_id
         |  FROM members m JOIN reach r ON r.src = m.id GROUP BY m.id
         |)
         |SELECT d.doc_id,
         |  COALESCE(g.rep_id, d.doc_id) AS split_key,
         |  CASE WHEN ('0x' || substr(md5(CAST(COALESCE(g.rep_id, d.doc_id) AS VARCHAR)), 1, 15))::BIGINT % 1000 < 100
         |       THEN 'test' ELSE 'train' END AS split
         |FROM documents d LEFT JOIN grp g ON g.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Groups (recursive CTE, as dedup_groups) joined with the per-doc
    // quality formula (as quality_score, q-prefixed CTEs to avoid name
    // clashes with the minhash chain); best = row_number, not arg-max
    // (packed arg-max tie conventions differ across engines).
    "dedup_groups_best" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
         |), members AS (SELECT DISTINCT a AS id FROM und
         |), grp AS (
         |  SELECT m.id AS doc_id, least(m.id, min(r.dst)) AS rep_id
         |  FROM members m JOIN reach r ON r.src = m.id GROUP BY m.id
         |), qn AS (
         |  SELECT doc_id, text, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
         |), qt AS (
         |  SELECT doc_id, text, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM qn
         |), qm AS (
         |  SELECT doc_id,
         |    CAST(len(w) AS DOUBLE) AS ntok,
         |    CAST(len(list_filter(w, x -> list_contains(
         |      ['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE) AS nstop,
         |    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS npunct,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS DOUBLE) AS sumlen
         |  FROM qt
         |), qr AS (
         |  SELECT doc_id,
         |    CASE WHEN ntok > 0 THEN nstop/ntok ELSE 0 END AS stop_ratio,
         |    CASE WHEN nchars > 0 THEN npunct/nchars ELSE 0 END AS punct_ratio,
         |    CASE WHEN ntok > 0 THEN sumlen/ntok ELSE 0 END AS mean_word_len,
         |    nchars FROM qm
         |), qual AS (
         |  SELECT doc_id,
         |    round((least(nchars/CAST(200 AS DOUBLE), 1.0)
         |         + least(stop_ratio*CAST(5 AS DOUBLE), 1.0)
         |         + greatest(CAST(0 AS DOUBLE), 1.0 - punct_ratio*CAST(10 AS DOUBLE))
         |         + CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |                THEN 1.0 ELSE 0.5 END) / CAST(4 AS DOUBLE), 6) AS quality
         |  FROM qr
         |), ranked AS (
         |  SELECT g.rep_id, g.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY g.rep_id
         |      ORDER BY q.quality DESC, g.doc_id) AS rk,
         |    count(*) OVER (PARTITION BY g.rep_id) AS group_size
         |  FROM grp g JOIN qual q ON q.doc_id = g.doc_id
         |)
         |SELECT rep_id, doc_id AS best_id, CAST(group_size AS BIGINT) AS group_size,
         |  quality AS best_quality
         |FROM ranked WHERE rk = 1 ORDER BY rep_id""".stripMargin,

    "simhash_pairs" -> {
      val bitSums = (0 until 60).map(j =>
        s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s_$j")
        .mkString(",\n    ")
      val assemble = (0 until 60).map(j =>
        s"CASE WHEN s_$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END")
        .mkString(" + ")
      s"""WITH norm AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
         |), tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(t, ' '), x -> len(x) > 0)) AS w FROM norm
         |), h AS (
         |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok
         |), bits AS (
         |  SELECT doc_id,
         |    $bitSums
         |  FROM h GROUP BY doc_id
         |), fp AS (
         |  SELECT doc_id, $assemble AS simhash FROM bits
         |), banded AS (
         |  SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS cv
         |  FROM fp, range(0, 4) r(c)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS sa, b.simhash AS sb
         |  FROM banded a JOIN banded b
         |    ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b, bit_count(xor(sa, sb)) AS dist
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    "ann_lsh_topk" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), planes AS (
        |  SELECT p, i,
        |    (('0x' || substr(md5(p::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT
        |      % 2000001 - 1000000) / CAST(1000000 AS DOUBLE) AS wt
        |  FROM range(0, 64) rp(p), range(0, 64) ri(i)
        |), proj AS (
        |  SELECT e.vec_id, pl.p, sum(e.x * pl.wt) AS pr
        |  FROM elems e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2
        |), bands AS (
        |  -- per-band 4-bit values built directly from the plane signs
        |  -- (assembling a full 64-bit key would need 1<<63, which DuckDB
        |  -- rejects as signed overflow); band b holds planes [4b, 4b+4)
        |  SELECT vec_id, p // 4 AS band,
        |    CAST(sum(CASE WHEN pr >= 0
        |      THEN (CAST(1 AS BIGINT) << CAST(p % 4 AS INT)) ELSE 0 END)
        |      AS BIGINT) AS bv
        |  FROM proj GROUP BY 1, 2
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), qs AS (
        |  SELECT vec_id AS query_id, band, bv FROM bands WHERE vec_id <= 4
        |), cand AS (
        |  SELECT DISTINCT q.query_id, b.vec_id
        |  FROM qs q JOIN bands b
        |    ON b.band = q.band AND b.bv = q.bv AND b.vec_id <> q.query_id
        |), dots AS (
        |  SELECT c.query_id, c.vec_id, sum(a.x * b.x) AS dot
        |  FROM cand c
        |  JOIN elems a ON a.vec_id = c.query_id
        |  JOIN elems b ON b.vec_id = c.vec_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT d.query_id, d.vec_id, d.dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.query_id
        |  JOIN norms nb ON nb.vec_id = d.vec_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, vec_id AS neighbor_id, round(cos, 6) AS cos6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "edit_distance_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), shl AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, unnest(shs) AS s FROM shl
        |), spost AS (
        |  SELECT doc_id, s FROM post
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 10
        |), hot AS (
        |  SELECT s FROM (SELECT s, count(*) AS df FROM spost GROUP BY 1) d
        |  WHERE df > 10
        |), fpost AS (
        |  SELECT doc_id, s FROM post WHERE s NOT IN (SELECT s FROM hot)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM post GROUP BY 1
        |), common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        |  FROM fpost a JOIN fpost b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(n_common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.5
        |)
        |SELECT c.id_a, c.id_b,
        |  levenshtein(na.t, nb.t) AS edit_dist,
        |  round(CAST(1 AS DOUBLE) - CAST(levenshtein(na.t, nb.t) AS DOUBLE)
        |        / CAST(greatest(length(na.t), length(nb.t)) AS DOUBLE), 6) AS sim6
        |FROM cand c
        |JOIN norm na ON na.doc_id = c.id_a
        |JOIN norm nb ON nb.doc_id = c.id_b
        |ORDER BY c.id_a, c.id_b""".stripMargin,

    "embedding_dups" ->
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
        |)
        |SELECT id_a, id_b, round(dot/(na.nrm*nb.nrm), 6) AS cos6
        |FROM dots
        |JOIN norms na ON na.vec_id = id_a
        |JOIN norms nb ON nb.vec_id = id_b
        |WHERE dot/(na.nrm*nb.nrm) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_topk" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |    AND a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), ranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id, round(cos, 6) AS cos6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // the ann_topk scorer restricted to different-label candidates —
    // the label filter runs BEFORE the rank window, like the Spark plan
    "hard_negatives" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), lab AS (
        |  SELECT vec_id, label FROM embeddings
        |), dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |    AND a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), ranked AS (
        |  SELECT s.query_id, s.cand_id, s.cos,
        |    la.label AS q_label, lb.label AS neighbor_label,
        |    row_number() OVER (PARTITION BY s.query_id
        |      ORDER BY s.cos DESC, s.cand_id) AS rank
        |  FROM sims s
        |  JOIN lab la ON la.vec_id = s.query_id
        |  JOIN lab lb ON lb.vec_id = s.cand_id
        |  WHERE la.label <> lb.label
        |)
        |SELECT query_id, q_label, rank, cand_id AS neighbor_id,
        |  neighbor_label, round(cos, 6) AS cos6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // reciprocal-kNN pair mining, AUDIT-exact form: the ann_topk scorer
    // in BOTH directions, pairs kept only when each side is inside the
    // other's top-5 (a < b emits each pair once)
    "rnn_pairs_exact" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS src, b.vec_id AS cand_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT src, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = src
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), ranked AS (
        |  SELECT src, cand_id, cos, rank FROM (
        |    SELECT src, cand_id, cos, row_number() OVER (
        |      PARTITION BY src ORDER BY cos DESC, cand_id) AS rank
        |    FROM sims) t WHERE rank <= 5
        |)
        |SELECT x.src AS a, x.cand_id AS b, x.rank AS rank_ab,
        |  y.rank AS rank_ba, round(x.cos, 6) AS cos6
        |FROM ranked x JOIN ranked y
        |  ON y.src = x.cand_id AND y.cand_id = x.src AND x.src < x.cand_id
        |ORDER BY a, b""".stripMargin,

    // reciprocal-kNN DEFAULT, through the banded-LSH retriever — the
    // 100 TB shape: candidates from the banded self-join (same
    // plane/band CTEs as ann_lsh_topk) under the hot-bucket df-cut
    // guard (sampled h60 census, cut = max(1, 200·100/1000) = 20),
    // each EXACTLY cosine-scored and ranked, then the same reciprocity
    // tail as rnn_pairs_exact. Only recall is probabilistic; every
    // emitted pair is exact, and the oracle rebuilds the identical
    // candidate set — guard included.
    "rnn_pairs" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), planes AS (
        |  SELECT p, i,
        |    (('0x' || substr(md5(p::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT
        |      % 2000001 - 1000000) / CAST(1000000 AS DOUBLE) AS wt
        |  FROM range(0, 64) rp(p), range(0, 64) ri(i)
        |), proj AS (
        |  SELECT e.vec_id, pl.p, sum(e.x * pl.wt) AS pr
        |  FROM elems e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2
        |), bands AS (
        |  SELECT vec_id, p // 4 AS band,
        |    CAST(sum(CASE WHEN pr >= 0
        |      THEN (CAST(1 AS BIGINT) << CAST(p % 4 AS INT)) ELSE 0 END)
        |      AS BIGINT) AS bv
        |  FROM proj GROUP BY 1, 2
        |), hotb AS (
        |  SELECT band, bv FROM bands
        |  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 1000 < 100
        |  GROUP BY 1, 2 HAVING count(*) > 20
        |), keptb AS (
        |  SELECT b.vec_id, b.band, b.bv FROM bands b
        |  LEFT JOIN hotb h ON h.band = b.band AND h.bv = b.bv
        |  WHERE h.band IS NULL
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS cand_id
        |  FROM keptb a JOIN keptb b
        |    ON b.band = a.band AND b.bv = a.bv AND b.vec_id <> a.vec_id
        |), dots AS (
        |  SELECT c.src, c.cand_id, sum(a.x * b.x) AS dot
        |  FROM cand c
        |  JOIN elems a ON a.vec_id = c.src
        |  JOIN elems b ON b.vec_id = c.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT d.src, d.cand_id, d.dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.src
        |  JOIN norms nb ON nb.vec_id = d.cand_id
        |), ranked AS (
        |  SELECT src, cand_id, cos, rank FROM (
        |    SELECT src, cand_id, cos, row_number() OVER (
        |      PARTITION BY src ORDER BY cos DESC, cand_id) AS rank
        |    FROM sims) t WHERE rank <= 5
        |)
        |SELECT x.src AS a, x.cand_id AS b, x.rank AS rank_ab,
        |  y.rank AS rank_ba, round(x.cos, 6) AS cos6
        |FROM ranked x JOIN ranked y
        |  ON y.src = x.cand_id AND y.cand_id = x.src AND x.src < x.cand_id
        |ORDER BY a, b""".stripMargin,

    // MMR diversified re-rank: top-20 candidate cut, then the greedy
    // λ=0.7 selection unrolled five steps — every score is the exact
    // integer 7·rel_micro − 3·maxsim_micro on micro-FLOORED cosines,
    // ties to the smallest vec_id, empty-set maxsim = 0
    "mmr_rerank" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), qd AS (
        |  SELECT b.vec_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |  WHERE a.vec_id = 0 AND b.vec_id <> 0
        |  GROUP BY 1
        |), scored AS (
        |  SELECT q.vec_id,
        |    CASE WHEN na.nrm * nb.nrm <> 0
        |      THEN q.dot/(na.nrm*nb.nrm) ELSE 0 END AS cos
        |  FROM qd q
        |  JOIN norms na ON na.vec_id = 0
        |  JOIN norms nb ON nb.vec_id = q.vec_id
        |), cand AS (
        |  SELECT vec_id, CAST(floor(cos * 1000000) AS BIGINT) AS rel
        |  FROM scored ORDER BY cos DESC, vec_id LIMIT 20
        |), pdots AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |  WHERE a.vec_id IN (SELECT vec_id FROM cand)
        |    AND b.vec_id IN (SELECT vec_id FROM cand)
        |    AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), psim AS (
        |  SELECT i, j, CAST(floor(
        |    CASE WHEN na.nrm * nb.nrm <> 0
        |      THEN dot/(na.nrm*nb.nrm) ELSE 0 END * 1000000) AS BIGINT)
        |    AS sim
        |  FROM pdots
        |  JOIN norms na ON na.vec_id = i
        |  JOIN norms nb ON nb.vec_id = j
        |), s1 AS (
        |  SELECT vec_id, rel, CAST(0 AS BIGINT) AS maxsim,
        |    7*rel AS score
        |  FROM cand ORDER BY 7*rel DESC, vec_id LIMIT 1
        |), s2 AS (
        |  SELECT c.vec_id, c.rel, m.maxsim, 7*c.rel - 3*m.maxsim AS score
        |  FROM cand c JOIN (
        |    SELECT p.i AS vec_id, max(p.sim) AS maxsim FROM psim p
        |    WHERE p.j IN (SELECT vec_id FROM s1) GROUP BY 1) m
        |    USING (vec_id)
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |), sel2 AS (
        |  SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2
        |), s3 AS (
        |  SELECT c.vec_id, c.rel, m.maxsim, 7*c.rel - 3*m.maxsim AS score
        |  FROM cand c JOIN (
        |    SELECT p.i AS vec_id, max(p.sim) AS maxsim FROM psim p
        |    WHERE p.j IN (SELECT vec_id FROM sel2) GROUP BY 1) m
        |    USING (vec_id)
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |), sel3 AS (
        |  SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3
        |), s4 AS (
        |  SELECT c.vec_id, c.rel, m.maxsim, 7*c.rel - 3*m.maxsim AS score
        |  FROM cand c JOIN (
        |    SELECT p.i AS vec_id, max(p.sim) AS maxsim FROM psim p
        |    WHERE p.j IN (SELECT vec_id FROM sel3) GROUP BY 1) m
        |    USING (vec_id)
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |), sel4 AS (
        |  SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4
        |), s5 AS (
        |  SELECT c.vec_id, c.rel, m.maxsim, 7*c.rel - 3*m.maxsim AS score
        |  FROM cand c JOIN (
        |    SELECT p.i AS vec_id, max(p.sim) AS maxsim FROM psim p
        |    WHERE p.j IN (SELECT vec_id FROM sel4) GROUP BY 1) m
        |    USING (vec_id)
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |)
        |SELECT CAST(1 AS BIGINT) AS step, vec_id, rel AS rel_micro,
        |  maxsim AS maxsim_micro, score AS mmr_scaled FROM s1
        |UNION ALL SELECT 2, vec_id, rel, maxsim, score FROM s2
        |UNION ALL SELECT 3, vec_id, rel, maxsim, score FROM s3
        |UNION ALL SELECT 4, vec_id, rel, maxsim, score FROM s4
        |UNION ALL SELECT 5, vec_id, rel, maxsim, score FROM s5
        |ORDER BY step""".stripMargin,

    // label purity per write-time IVF cell, replayed from the SAME aux
    // cell dump ann_ivf_topk verifies against; majority ties to the
    // smallest label like the Spark min(struct) election
    "ivf_purity" ->
      """WITH cl AS (
        |  SELECT c.c_id, e.label
        |  FROM read_parquet('__AUX__/ivf_cells/*.parquet') c
        |  JOIN embeddings e USING (vec_id)
        |), cnts AS (
        |  SELECT c_id, label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM cl GROUP BY 1, 2
        |), tot AS (
        |  SELECT c_id, CAST(sum(cnt) AS BIGINT) AS n_vecs
        |  FROM cnts GROUP BY 1
        |), maj AS (
        |  SELECT c_id, label AS maj_label, cnt AS maj_cnt FROM (
        |    SELECT c_id, label, cnt, row_number() OVER (
        |      PARTITION BY c_id ORDER BY cnt DESC, label) AS rn
        |    FROM cnts) WHERE rn = 1
        |)
        |SELECT c_id, n_vecs, maj_label, maj_cnt,
        |  maj_cnt * 1000000 // n_vecs AS purity_micro
        |FROM tot JOIN maj USING (c_id) ORDER BY c_id""".stripMargin,

    // IVF search replayed over the write-time index state (__AUX__ =
    // Verify's aux dump: the coarse quantizer and the cell-per-vector
    // layout — ingest-time data, like the tables). DuckDB independently
    // recomputes BOTH query-time halves: probe selection (score
    // dot(q,c)/|c|, zero-norm guard, rank desc with ties to the lowest
    // c_id — mirroring Similarity.annIvfWith) and the exact cosine top-k
    // over the probed cells (same CTE shape as ann_topk).
    "ann_ivf_topk" ->
      """WITH cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), qdot AS (
        |  SELECT e.vec_id AS query_id, c.c_id, sum(e.x * c.w) AS dot
        |  FROM elems e JOIN cents c ON c.pos = e.i - 1
        |  WHERE e.vec_id <= 4
        |  GROUP BY 1, 2
        |), probes AS (
        |  SELECT query_id, c_id FROM (
        |    SELECT q.query_id, q.c_id, row_number() OVER (
        |      PARTITION BY q.query_id ORDER BY
        |        CASE WHEN n.cn = 0 THEN -1e308 ELSE q.dot / n.cn END DESC,
        |        q.c_id) AS r
        |    FROM qdot q JOIN cnorm n ON n.c_id = q.c_id) t
        |  WHERE r <= 4
        |), cands AS (
        |  SELECT p.query_id, cl.vec_id AS cand_id
        |  FROM probes p
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE cl.vec_id <> p.query_id
        |), dots AS (
        |  SELECT cd.query_id, cd.cand_id, sum(a.x * b.x) AS dot
        |  FROM cands cd
        |  JOIN elems a ON a.vec_id = cd.query_id
        |  JOIN elems b ON b.vec_id = cd.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), ranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id, round(cos, 6) AS cos6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // Portable h60 (md5-first-15-hex) keying — same family the minhash
    // oracle rebuilds, so the sampled set is bit-identical across engines.
    "sample_hash" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 100
        |ORDER BY doc_id""".stripMargin,

    // Per-stratum keep-rates mirrored as a CASE; same h60 formula as
    // sample_hash, so selection is engine-identical.
    "stratified_sample" ->
      """SELECT doc_id, lang AS stratum
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
        |  < (CASE WHEN lang = 'de' THEN 500 WHEN lang = 'en' THEN 100 ELSE 0 END)
        |ORDER BY doc_id""".stripMargin,

    // Priority sampling (Duffield–Thorup): priority = h60 div weight with
    // INTEGER division on both engines — no float quotient anywhere, so
    // the k winners are bit-identical (DuckDB `//` = floor division,
    // Spark `div`; both operands nonnegative, floor == trunc).
    "priority_sample" ->
      """SELECT doc_id, source, n_chars,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // n_chars AS priority
        |FROM documents
        |WHERE n_chars > 0
        |ORDER BY priority, doc_id
        |LIMIT 100""".stripMargin,

    // Same h60 shard formula as sample_hash, so the layout is
    // engine-identical; integer sums cast off HUGEINT.
    "shard_balance" ->
      """SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16
        |      AS shard
        |  FROM documents) t
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    // quasi-identifier = (source, lang, integer length bucket); groups
    // under k = 5 are the re-identification handles
    "k_anonymity" ->
      """SELECT source, lang, n_chars // 500 AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        |FROM documents
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // The bounded-heap aggregate is exact, so the oracle is the window
    // form it replaces at scale.
    "group_topk" ->
      """SELECT source, rank, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 3
        |ORDER BY source, rank""".stripMargin,

    // Same plane/band CTEs as ann_lsh_topk (16 bands × 4 bits), candidate
    // pairs from shared band values, exact-cosine verify at 0.4, then the
    // dedup_groups recursive-CTE closure; kept corpus = ids that are not
    // a non-representative member of any component.
    "semantic_dedup" ->
      """WITH RECURSIVE elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), planes AS (
        |  SELECT p, i,
        |    (('0x' || substr(md5(p::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT
        |      % 2000001 - 1000000) / CAST(1000000 AS DOUBLE) AS wt
        |  FROM range(0, 64) rp(p), range(0, 64) ri(i)
        |), proj AS (
        |  SELECT e.vec_id, pl.p, sum(e.x * pl.wt) AS pr
        |  FROM elems e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2
        |), bands AS (
        |  SELECT vec_id, p // 4 AS band,
        |    CAST(sum(CASE WHEN pr >= 0
        |      THEN (CAST(1 AS BIGINT) << CAST(p % 4 AS INT)) ELSE 0 END)
        |      AS BIGINT) AS bv
        |  FROM proj GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT c.id_a, c.id_b, sum(a.x * b.x) AS dot
        |  FROM cand c
        |  JOIN elems a ON a.vec_id = c.id_a
        |  JOIN elems b ON b.vec_id = c.id_b AND b.i = a.i
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT d.id_a, d.id_b FROM dots d
        |  JOIN norms na ON na.vec_id = d.id_a
        |  JOIN norms nb ON nb.vec_id = d.id_b
        |  WHERE d.dot / (na.nrm * nb.nrm) >= 0.4
        |), und AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        |), members AS (SELECT DISTINCT a AS id FROM und
        |), grp AS (
        |  SELECT m.id, least(m.id, min(r.dst)) AS rep
        |  FROM members m JOIN reach r ON r.src = m.id GROUP BY m.id
        |), dropped AS (SELECT id FROM grp WHERE id <> rep)
        |SELECT e.vec_id, e.label FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT id FROM dropped)
        |ORDER BY e.vec_id""".stripMargin,

    // Cross-corpus variant of semantic_dedup: new batch (vec_id%5=0)
    // probes corpus (vec_id%5<>0) band buckets; inline exact-cosine
    // verify mirrored as dots over candidate pairs.
    "semantic_dedup_against" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), planes AS (
        |  SELECT p, i,
        |    (('0x' || substr(md5(p::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT
        |      % 2000001 - 1000000) / CAST(1000000 AS DOUBLE) AS wt
        |  FROM range(0, 64) rp(p), range(0, 64) ri(i)
        |), proj AS (
        |  SELECT e.vec_id, pl.p, sum(e.x * pl.wt) AS pr
        |  FROM elems e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2
        |), bands AS (
        |  SELECT vec_id, p // 4 AS band,
        |    CAST(sum(CASE WHEN pr >= 0
        |      THEN (CAST(1 AS BIGINT) << CAST(p % 4 AS INT)) ELSE 0 END)
        |      AS BIGINT) AS bv
        |  FROM proj GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS new_id, b.vec_id AS corpus_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bv = b.bv
        |  WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT c.new_id, c.corpus_id, sum(a.x * b.x) AS dot
        |  FROM cand c
        |  JOIN elems a ON a.vec_id = c.new_id
        |  JOIN elems b ON b.vec_id = c.corpus_id AND b.i = a.i
        |  GROUP BY 1, 2
        |)
        |SELECT d.new_id, d.corpus_id,
        |  round(d.dot / (na.nrm * nb.nrm), 6) AS cos6
        |FROM dots d
        |JOIN norms na ON na.vec_id = d.new_id
        |JOIN norms nb ON nb.vec_id = d.corpus_id
        |WHERE d.dot / (na.nrm * nb.nrm) >= 0.4
        |ORDER BY new_id, corpus_id""".stripMargin,

    "source_quota" ->
      """SELECT doc_id, source, rank_in_source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank_in_source
        |  FROM documents) t
        |WHERE rank_in_source <= 50
        |ORDER BY doc_id""".stripMargin,

    // Token-offset chunking into 512-token sequences, shard-parallel over
    // the portable h60 doc hash — every assignment reproduced by the
    // window cumsum below.
    "pack_sequences" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
        |    CAST(len(list_filter(string_split(t, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM norm
        |), cum AS (
        |  SELECT doc_id, shard, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM tok
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(shard * 1099511627776 + tokens_before // 512 AS BIGINT) AS seq_id,
        |  CAST(tokens_before % 512 AS BIGINT) AS offset_in_seq
        |FROM cum ORDER BY doc_id""".stripMargin,

    // Boundary-splitting spans: one row per (doc, overlapped 512-token
    // window); seq_id = (shard << 40) + window index, offsets doc-relative.
    "pack_spans" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
        |    CAST(len(list_filter(string_split(t, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM norm
        |), cum AS (
        |  SELECT doc_id, shard, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM tok
        |), spans AS (
        |  SELECT doc_id, shard, n_tokens, tokens_before,
        |    unnest(generate_series(CAST(tokens_before // 512 AS BIGINT),
        |      CAST((tokens_before + n_tokens - 1) // 512 AS BIGINT))) AS s
        |  FROM cum WHERE n_tokens > 0
        |)
        |SELECT doc_id,
        |  CAST(shard * 1099511627776 + s AS BIGINT) AS seq_id,
        |  CAST(greatest(0, s * 512 - tokens_before) AS BIGINT) AS start_tok,
        |  CAST(least(n_tokens, (s + 1) * 512 - tokens_before) AS BIGINT) AS end_tok
        |FROM spans ORDER BY doc_id, seq_id""".stripMargin,

    // Eval slice = portable-hash permille of doc_id (mirrored); a training
    // doc is contaminated when it shares ≥1 distinct 3-gram with the slice.
    "decontaminate" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), shl AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS slot,
        |    list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, slot, unnest(shs) AS s FROM shl
        |), ev AS (
        |  SELECT DISTINCT s FROM post WHERE slot < 20
        |)
        |SELECT p.doc_id, count(*) AS n_hit_ngrams
        |FROM post p JOIN ev ON ev.s = p.s
        |WHERE p.slot >= 20
        |GROUP BY 1 HAVING count(*) >= 1
        |ORDER BY doc_id""".stripMargin,

    // Graded decontamination: per-train-doc fraction of distinct
    // 3-grams shared with the eval slice, zero-hit docs included.
    // Integer micro ratio (nonneg ⇒ div = // on both engines).
    // Release-audit rollup of decontaminate_frac: same CTE chain, then
    // equal-population deciles over (fraction, doc_id); exact integer
    // mean via sum // count.
    "contamination_deciles" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), shl AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS slot,
        |    list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, slot, unnest(shs) AS s FROM shl
        |), ev AS (
        |  SELECT DISTINCT s FROM post WHERE slot < 20
        |), hits AS (
        |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM post p JOIN ev ON ev.s = p.s
        |  WHERE p.slot >= 20 GROUP BY 1
        |), frac AS (
        |  SELECT l.doc_id,
        |    CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |    CAST(CASE WHEN len(l.shs) > 0
        |      THEN coalesce(h.n_hits, 0) * 1000000 // len(l.shs)
        |      ELSE 0 END AS BIGINT) AS contam_frac_micro
        |  FROM shl l LEFT JOIN hits h USING (doc_id)
        |  WHERE l.slot >= 20
        |), dec AS (
        |  SELECT n_hits, contam_frac_micro, ntile(10) OVER (
        |    ORDER BY contam_frac_micro, doc_id) AS decile FROM frac
        |)
        |SELECT decile, count(*) AS n_docs,
        |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
        |  CAST(sum(contam_frac_micro) // count(*) AS BIGINT)
        |    AS mean_contam_micro
        |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin,

    "decontaminate_frac" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), shl AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS slot,
        |    list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT doc_id, slot, unnest(shs) AS s FROM shl
        |), ev AS (
        |  SELECT DISTINCT s FROM post WHERE slot < 20
        |), hits AS (
        |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM post p JOIN ev ON ev.s = p.s
        |  WHERE p.slot >= 20 GROUP BY 1
        |)
        |SELECT l.doc_id, CAST(len(l.shs) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(CASE WHEN len(l.shs) > 0
        |    THEN coalesce(h.n_hits, 0) * 1000000 // len(l.shs)
        |    ELSE 0 END AS BIGINT) AS contam_frac_micro
        |FROM shl l LEFT JOIN hits h USING (doc_id)
        |WHERE l.slot >= 20
        |ORDER BY l.doc_id""".stripMargin,

    // Reference-vocab bigram coverage: top-500 corpus bigrams by doc
    // frequency (ties by bigram string — deterministic cutoff), per-doc
    // distinct-bigram hit ratio. Integer counts; one rounded division.
    "lm_coverage" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), big AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS bs FROM toks
        |), post AS (
        |  SELECT doc_id, unnest(bs) AS b FROM big
        |), vocab AS (
        |  SELECT b FROM (
        |    SELECT b, count(*) AS df FROM post GROUP BY 1
        |    ORDER BY df DESC, b LIMIT 500)
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hits FROM post
        |  WHERE b IN (SELECT b FROM vocab) GROUP BY 1
        |)
        |SELECT g.doc_id, CAST(len(g.bs) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_in_ref,
        |  CASE WHEN len(g.bs) > 0
        |    THEN round(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / len(g.bs), 6)
        |    ELSE 0.0 END AS coverage6
        |FROM big g LEFT JOIN hits h ON h.doc_id = g.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    // Laplace-smoothed bigram LM trained on the corpus itself; each
    // bigram's log-prob is floored onto the integer micro grid BEFORE the
    // per-doc sum (a float sum of hundreds of ln() terms is
    // order-dependent), so both engines sum exact BIGINTs; the single
    // float division of exact integers at the end is deterministic.
    // V = |{w1} ∪ {w2}| over bigram TYPES (single-token docs are outside
    // the model's event space by construction — documented in Scaladoc).
    // unigram + bigram censuses off one tokenize; ONE ln() on the
    // literal ratio cb·n1²/(n2·c1·c2), micro-floored; (pmi desc, bigram)
    // total order makes the k-cutoff deterministic
    "bigram_pmi" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
        |    SELECT unnest(w) AS w FROM toks) GROUP BY 1
        |), n1 AS (
        |  SELECT CAST(sum(cw) AS BIGINT) AS n1 FROM uni
        |), big AS (
        |  SELECT unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS b FROM toks
        |), bc AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS cb FROM big
        |  GROUP BY 1 HAVING count(*) >= 5
        |), n2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n2 FROM big
        |), j AS (
        |  SELECT bc.b AS bigram, bc.cb, u1.cw AS c1, u2.cw AS c2,
        |    CAST(floor(ln(
        |      (CAST(bc.cb AS DOUBLE) * CAST(n1.n1 AS DOUBLE) * CAST(n1.n1 AS DOUBLE)) /
        |      (CAST(n2.n2 AS DOUBLE) * CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS pmi_micro
        |  FROM bc
        |  JOIN uni u1 ON u1.w = split_part(bc.b, ' ', 1)
        |  JOIN uni u2 ON u2.w = split_part(bc.b, ' ', 2)
        |  CROSS JOIN n1 CROSS JOIN n2
        |)
        |SELECT bigram, cb, c1, c2, pmi_micro FROM j
        |ORDER BY pmi_micro DESC, bigram LIMIT 20""".stripMargin,

    // directed skip-gram co-occurrence census: b follows a within 5
    // positions, corpus-wide counts, min-count cut, (n desc, a, b) order
    "skipgram_cooc" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), wl AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w
        |  FROM norm
        |), occ AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)),
        |    j -> {'j': j, 'tok': w[j]})) AS u
        |  FROM wl
        |), t AS (
        |  SELECT doc_id, u.j AS j, u.tok AS tok FROM occ
        |), pairs AS (
        |  SELECT a.tok AS a, b.tok AS b, CAST(count(*) AS BIGINT) AS n_cooc
        |  FROM t a JOIN t b ON b.doc_id = a.doc_id
        |    AND b.j > a.j AND b.j <= a.j + 5
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, n_cooc FROM pairs WHERE n_cooc >= 5
        |ORDER BY n_cooc DESC, a, b LIMIT 50""".stripMargin,

    "lm_perplexity" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), big AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS b FROM toks
        |), tf AS (
        |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM big GROUP BY 1, 2
        |), lm AS (
        |  SELECT b, CAST(sum(tf) AS BIGINT) AS cb,
        |    split_part(b, ' ', 1) AS w1 FROM tf GROUP BY 1
        |), hist AS (
        |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cw FROM lm GROUP BY 1
        |), vocab AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v FROM (
        |    SELECT w1 AS w FROM lm UNION SELECT split_part(b, ' ', 2) FROM lm)
        |), per AS (
        |  SELECT doc_id,
        |    CAST(sum(tf * CAST(floor(ln(
        |      (CAST(cb AS DOUBLE) + 1.0) /
        |      (CAST(cw AS DOUBLE) + CAST(v AS DOUBLE))) * 1000000.0)
        |    AS BIGINT)) AS BIGINT) AS lp,
        |    CAST(sum(tf) AS BIGINT) AS n
        |  FROM tf JOIN lm USING (b) JOIN hist USING (w1) CROSS JOIN vocab
        |  GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(p.lp, 0) AS BIGINT) AS logprob_micro,
        |  CASE WHEN coalesce(p.n, 0) > 0
        |    THEN round(CAST(p.lp AS DOUBLE) / p.n, 6)
        |    ELSE 0.0 END AS avg_logprob_micro6
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // interpolated Kneser–Ney (D = 3/4): per seen bigram,
    // P = ((4c−3)·NB + 3·F1·P2) / (4·CW·NB) assembled in DOUBLE with
    // the IDENTICAL expression tree as the Spark side (each op one
    // correctly-rounded IEEE step), ln micro-floored BEFORE the per-doc
    // sum — the lm_perplexity determinism contract
    "kn_perplexity" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), big AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS b FROM toks
        |), tf AS (
        |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM big GROUP BY 1, 2
        |), lm AS (
        |  SELECT b, CAST(sum(tf) AS BIGINT) AS cb,
        |    split_part(b, ' ', 1) AS w1,
        |    split_part(b, ' ', 2) AS w2 FROM tf GROUP BY 1
        |), ctx AS (
        |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cw,
        |    CAST(count(*) AS BIGINT) AS n1f FROM lm GROUP BY 1
        |), pred AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS nprec FROM lm GROUP BY 1
        |), nb AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nbig FROM lm
        |), per AS (
        |  SELECT doc_id,
        |    CAST(sum(tf * CAST(floor(ln(
        |      ((4.0 * CAST(cb AS DOUBLE) - 3.0) * CAST(nbig AS DOUBLE)
        |        + 3.0 * CAST(n1f AS DOUBLE) * CAST(nprec AS DOUBLE)) /
        |      (4.0 * CAST(cw AS DOUBLE) * CAST(nbig AS DOUBLE))) * 1000000.0)
        |    AS BIGINT)) AS BIGINT) AS lp,
        |    CAST(sum(tf) AS BIGINT) AS n
        |  FROM tf JOIN lm USING (b) JOIN ctx USING (w1) JOIN pred USING (w2)
        |  CROSS JOIN nb
        |  GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(p.lp, 0) AS BIGINT) AS kn_logprob_micro,
        |  CASE WHEN coalesce(p.n, 0) > 0
        |    THEN round(CAST(p.lp AS DOUBLE) / p.n, 6)
        |    ELSE 0.0 END AS avg_kn_logprob_micro6
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Gopher word-level repetition gates: character mass of an n-gram =
    // count × len(gram) (internal spaces included); duplicated-5-gram
    // mass can exceed the text (overlaps) — threshold signal by design.
    // Pure integer ratios on the micro grid; nonneg ⇒ div == // on both
    // engines. Top-gram tie breaks to the smallest gram string (Spark
    // side: sort-free min(struct(-cnt, gram)) partial aggregate).
    "gopher_repetition" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, t, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), c2 AS (
        |  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |      THEN list_transform(generate_series(1, len(w)-1),
        |           i -> w[i] || ' ' || w[i+1])
        |      ELSE [] END) AS b FROM toks) GROUP BY 1, 2
        |), top2 AS (
        |  SELECT doc_id, cnt AS top2_cnt, b AS top2_gram FROM (
        |    SELECT doc_id, b, cnt, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY cnt DESC, b) AS rn FROM c2)
        |  WHERE rn = 1
        |), c5 AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(w) >= 5
        |      THEN list_transform(generate_series(1, len(w)-4),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                w[i+3] || ' ' || w[i+4])
        |      ELSE [] END) AS g FROM toks) GROUP BY 1, 2
        |), dup5 AS (
        |  SELECT doc_id, CAST(sum(cnt * len(g)) AS BIGINT) AS dup5_chars
        |  FROM c5 WHERE cnt >= 2 GROUP BY 1
        |)
        |SELECT s.doc_id, CAST(len(s.t) AS BIGINT) AS n_chars,
        |  CAST(coalesce(t.top2_cnt, 0) AS BIGINT) AS top2_cnt,
        |  coalesce(t.top2_gram, '') AS top2_gram,
        |  CAST(CASE WHEN len(s.t) > 0
        |    THEN coalesce(t.top2_cnt, 0) * len(coalesce(t.top2_gram, ''))
        |         * 1000000 // len(s.t)
        |    ELSE 0 END AS BIGINT) AS top2_frac_micro,
        |  CAST(CASE WHEN len(s.t) > 0
        |    THEN coalesce(d.dup5_chars, 0) * 1000000 // len(s.t)
        |    ELSE 0 END AS BIGINT) AS dup5_frac_micro
        |FROM norm s LEFT JOIN top2 t USING (doc_id)
        |  LEFT JOIN dup5 d USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Reciprocal-rank fusion of the BM25 depth-100 list (same CTEs as
    // bm25_scores, ranked on the 6-dp-rounded score, doc_id ties) and
    // the cosine depth-100 list for query vector 0 (same CTE shape as
    // ann_topk). Each contribution is the exact integer 10⁹//(60+rank);
    // a doc on one list only keeps the other contribution at 0.
    "hybrid_rrf" ->
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
        |), bm AS (
        |  SELECT doc_id,
        |    round(sum(
        |      ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |               (CAST(df AS DOUBLE) + 0.5)) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) /
        |        (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6) AS bm25
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY doc_id
        |), lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_lex
        |  FROM (SELECT doc_id, bm25 FROM bm
        |        ORDER BY bm25 DESC, doc_id LIMIT 100)
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT b.vec_id AS doc_id, sum(a.x*b.x) AS dot
        |  FROM elems a JOIN elems b ON a.i = b.i
        |    AND a.vec_id = 0 AND b.vec_id <> 0
        |  GROUP BY 1
        |), sims AS (
        |  SELECT doc_id, CASE WHEN na.nrm * nb.nrm <> 0
        |    THEN dot / (na.nrm * nb.nrm) END AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = 0
        |  JOIN norms nb ON nb.vec_id = doc_id
        |), sem AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_sem
        |  FROM (SELECT doc_id, cos FROM sims
        |        ORDER BY cos DESC, doc_id LIMIT 100)
        |)
        |SELECT doc_id,
        |  CAST(coalesce(l.rank_lex, 0) AS BIGINT) AS rank_lex,
        |  CAST(coalesce(s.rank_sem, 0) AS BIGINT) AS rank_sem,
        |  CAST(CASE WHEN l.rank_lex IS NOT NULL
        |         THEN 1000000000 // (60 + l.rank_lex) ELSE 0 END
        |     + CASE WHEN s.rank_sem IS NOT NULL
        |         THEN 1000000000 // (60 + s.rank_sem) ELSE 0 END
        |    AS BIGINT) AS rrf_nano
        |FROM lex l FULL JOIN sem s USING (doc_id)
        |ORDER BY rrf_nano DESC, doc_id LIMIT 20""".stripMargin,

    // DSIR importance weights: bigrams hashed into 4096 buckets by the
    // portable h60 (md5-prefix, reproduced below), Laplace-smoothed
    // target-vs-raw log-ratio per bucket floored onto the micro grid
    // (ONE ln per bucket), doc weight = exact integer Σ tf·lr. Target
    // domain = sources src0/src1; selected = top-100 by (weight, doc_id).
    "dsir_weights" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), big AS (
        |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
        |    THEN list_transform(generate_series(1, len(w)-1),
        |         i -> w[i] || ' ' || w[i+1])
        |    ELSE [] END) AS b FROM toks
        |), tf AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(b), 1, 15))::BIGINT % 4096 AS bk,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM big GROUP BY 1, 2
        |), raw AS (
        |  SELECT bk, CAST(sum(tf) AS BIGINT) AS cr FROM tf GROUP BY 1
        |), tgt AS (
        |  SELECT bk, CAST(sum(tf) AS BIGINT) AS ct FROM tf
        |  WHERE doc_id IN (SELECT doc_id FROM documents
        |                   WHERE source IN ('src0', 'src1'))
        |  GROUP BY 1
        |), scal AS (
        |  SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
        |         (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS nt
        |), lr AS (
        |  SELECT bk, CAST(floor(ln(
        |    ((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) *
        |     (CAST(nr AS DOUBLE) + 4096.0)) /
        |    ((CAST(cr AS DOUBLE) + 1.0) *
        |     (CAST(coalesce(nt, 0) AS DOUBLE) + 4096.0))) * 1000000.0)
        |  AS BIGINT) AS lr_micro
        |  FROM raw LEFT JOIN tgt USING (bk) CROSS JOIN scal
        |), weights AS (
        |  SELECT doc_id, CAST(sum(tf * lr_micro) AS BIGINT) AS w,
        |    CAST(sum(tf) AS BIGINT) AS n
        |  FROM tf JOIN lr USING (bk) GROUP BY 1
        |), scored AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(ww.n, 0) AS BIGINT) AS n_bigrams,
        |    CAST(coalesce(ww.w, 0) AS BIGINT) AS logratio_micro
        |  FROM documents d LEFT JOIN weights ww USING (doc_id)
        |), topk AS (
        |  SELECT doc_id FROM scored
        |  ORDER BY logratio_micro DESC, doc_id LIMIT 100
        |)
        |SELECT s.doc_id, s.n_bigrams, s.logratio_micro,
        |  CAST(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS selected
        |FROM scored s LEFT JOIN topk t USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    "repetition_score" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), stats AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
        |    CAST(len(list_distinct(CASE WHEN len(w) >= 3
        |      THEN list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [] END)) AS BIGINT) AS n_distinct
        |  FROM toks
        |)
        |SELECT doc_id, n_ngrams, n_distinct,
        |  CASE WHEN n_ngrams > 0
        |    THEN round(1.0 - CAST(n_distinct AS DOUBLE) / n_ngrams, 6)
        |    ELSE 0.0 END AS dup_ratio
        |FROM stats ORDER BY doc_id""".stripMargin,

    // The bloom bitmap's set positions are pure checked-integer md5
    // arithmetic, so the oracle reproduces the filter EXACTLY — false
    // positives included (m = 2^20 bits, k = 4 of the minhash family).
    "decontaminate_bloom" -> {
      val p = graft.functions.PortableHash.MinhashP
      val seeds = graft.functions.PortableHash.minhashParams(4).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH norm AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
         |), toks AS (
         |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
         |), shl AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS slot,
         |    list_distinct(CASE WHEN len(w) >= 3
         |      THEN list_transform(generate_series(1, len(w)-2),
         |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         |      ELSE [] END) AS shs FROM toks
         |), post AS (
         |  SELECT doc_id, slot, unnest(shs) AS s FROM shl
         |), seeds(seed, a, b) AS (VALUES $seeds
         |), evpos AS (
         |  SELECT DISTINCT
         |    (a * (('0x' || substr(md5(s), 1, 15))::BIGINT % $p) + b) % $p % 1048576 AS pos
         |  FROM (SELECT DISTINCT s FROM post WHERE slot < 20) ev(s), seeds
         |), trainpos AS (
         |  SELECT doc_id, s, seed,
         |    (a * (('0x' || substr(md5(s), 1, 15))::BIGINT % $p) + b) % $p % 1048576 AS pos
         |  FROM post, seeds WHERE slot >= 20
         |), passed AS (
         |  SELECT doc_id, s FROM trainpos t JOIN evpos e ON e.pos = t.pos
         |  GROUP BY doc_id, s HAVING count(*) = 4
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams FROM passed
         |GROUP BY 1 HAVING count(*) >= 1
         |ORDER BY doc_id""".stripMargin
    },

    "vocab_topk" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |)
        |SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM tok GROUP BY 1
        |ORDER BY n_occurrences DESC, tok LIMIT 50""".stripMargin,

    // Gini impurity of the token multiset — the integer-exact entropy
    // surrogate: (n² − Σc²)·10⁶ div n² on exact counts
    "token_gini" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), cnt AS (
        |  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM cnt GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(p.n_types, 0) AS BIGINT) AS n_types,
        |  CASE WHEN coalesce(p.n_tokens, 0) > 0
        |    THEN (p.n_tokens * p.n_tokens - p.s2) * 1000000 //
        |      (p.n_tokens * p.n_tokens)
        |    ELSE 0 END AS gini_micro
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // every ADJACENT pair occurrence (non-distinct, unlike the shingle
    // SET): generate_series(1, len-1) indexes each neighbor pair
    "bpe_pair_counts" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS toks FROM norm
        |), pairs AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS pair
        |  FROM tok, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM pairs GROUP BY 1
        |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin,

    // novelty = fraction of a doc's distinct trigram shingles whose
    // corpus document-frequency is exactly 1 (integer counts, one 6-dp
    // ratio); docs without shingles score 0
    "ngram_novelty" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), shing AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END)) AS sh
        |  FROM toks
        |), dfs AS (
        |  SELECT sh, count(*) AS df FROM shing GROUP BY 1
        |), per AS (
        |  SELECT s.doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM shing s JOIN dfs d USING (sh) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN coalesce(p.n_shingles, 0) > 0
        |    THEN round(CAST(p.n_novel AS DOUBLE) / p.n_shingles, 6)
        |    ELSE 0.0 END AS novelty6
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // window=200, stride=150: n_chunks = 1 + ceil(max(0,len-200)/150);
    // substr is 1-based chars in both engines.
    "chunk_docs" ->
      """WITH sized AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    1 + (greatest(len - 200, 0) + 149) // 150 AS n_chunks
        |  FROM documents WHERE length(text) > 0
        |), idx AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1)) AS chunk_idx
        |  FROM sized
        |)
        |SELECT doc_id, chunk_idx, chunk_idx * 150 + 1 AS start_pos,
        |  CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS BIGINT)
        |    AS n_chars,
        |  md5(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS chunk_md5
        |FROM idx
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // tf·10⁶ div df (integer division) is the portable tf-idf ranking
    // surrogate — see TextAnalysis.tfidfTopTerm.
    "tfidf_top_term" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS term FROM norm
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2
        |), df AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * 1000000 // df.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |                       ORDER BY tf.tf * 1000000 // df.df DESC, tf.term) AS rn
        |  FROM tf JOIN df USING (term)
        |)
        |SELECT doc_id, term, tf, df, score FROM scored
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Count-Min cells from the checked-integer minhash family: the oracle
    // rebuilds the identical 4×16384 sketch, collisions included.
    "vocab_cms" -> {
      val p = graft.functions.PortableHash.MinhashP
      val seeds = graft.functions.PortableHash.minhashParams(4).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""WITH norm AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
         |), tok AS (
         |  SELECT unnest(list_filter(string_split(t, ' '),
         |    x -> len(x) > 0)) AS tok FROM norm
         |), h AS (
         |  SELECT tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT % $p AS h1 FROM tok
         |), seeds(seed, a, b) AS (VALUES $seeds
         |), cells AS (
         |  SELECT seed, (a * h1 + b) % $p % 16384 AS pos, count(*) AS cnt
         |  FROM h, seeds GROUP BY 1, 2
         |), top AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $p AS h1
         |  FROM tok GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 50
         |)
         |SELECT t.tok, t.n_occurrences, CAST(min(c.cnt) AS BIGINT) AS cms_est
         |FROM top t, seeds s
         |JOIN cells c ON c.seed = s.seed AND c.pos = (s.a * t.h1 + s.b) % $p % 16384
         |GROUP BY t.tok, t.n_occurrences
         |ORDER BY t.n_occurrences DESC, t.tok""".stripMargin
    },

    // Order-independent shard manifest: XOR-combined portable content
    // hashes over (doc_id, md5(text)) — same h60 family, same hash-mod
    // sharding as shard_balance.
    "shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 16 AS shard,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      md5(text)), 1, 15))::BIGINT AS fp
        |  FROM documents
        |)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  CAST(bit_xor(fp) AS BIGINT) AS fingerprint
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // manifest diff: the shard_manifest CTE computed over the corpus and
    // over the corpus minus src7, full-joined null-safe on shard —
    // changed = fingerprints differ (IS DISTINCT FROM)
    "manifest_diff" ->
      """WITH m_old AS (
        |  SELECT shard, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars, bit_xor(fp) AS fp
        |  FROM (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 16 AS shard,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      md5(text)), 1, 15))::BIGINT AS fp
        |    FROM documents) GROUP BY 1
        |), m_new AS (
        |  SELECT shard, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars, bit_xor(fp) AS fp
        |  FROM (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 16 AS shard,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      md5(text)), 1, 15))::BIGINT AS fp
        |    FROM documents WHERE source <> 'src7') GROUP BY 1
        |)
        |SELECT coalesce(o.shard, n.shard) AS shard,
        |  CAST(coalesce(o.n_docs, 0) AS BIGINT) AS old_docs,
        |  CAST(coalesce(n.n_docs, 0) AS BIGINT) AS new_docs,
        |  CAST(coalesce(n.n_docs, 0) - coalesce(o.n_docs, 0) AS BIGINT)
        |    AS docs_delta,
        |  CAST(coalesce(n.chars, 0) - coalesce(o.chars, 0) AS BIGINT)
        |    AS chars_delta,
        |  o.fp IS DISTINCT FROM n.fp AS changed
        |FROM m_old o FULL OUTER JOIN m_new n ON o.shard = n.shard
        |ORDER BY 1""".stripMargin,

    // t-closeness over the same QI, sensitive = lang: per-group TVD vs
    // the corpus language blend, integer-exact (deviations widened
    // through HUGEINT, one final micro-floor division); groups past
    // t = 0.25 are skew handles even when they pass l-diversity
    "t_closeness" ->
      """WITH base AS (
        |  SELECT source, lang, n_chars // 500 AS len_bucket FROM documents
        |), cells AS (
        |  SELECT source, len_bucket, lang, count(*) AS v_n
        |  FROM base GROUP BY 1, 2, 3
        |), qi AS (
        |  SELECT source, len_bucket, count(*) AS group_n
        |  FROM base GROUP BY 1, 2
        |), langs AS (
        |  SELECT lang, count(*) AS lang_n FROM base GROUP BY 1
        |), tot AS (SELECT count(*) AS total_n FROM base),
        |terms AS (
        |  SELECT q.source, q.len_bucket, q.group_n, t.total_n,
        |    abs(CAST(coalesce(c.v_n, 0) AS HUGEINT) * t.total_n
        |      - CAST(l.lang_n AS HUGEINT) * q.group_n) AS dev
        |  FROM qi q CROSS JOIN langs l CROSS JOIN tot t
        |  LEFT JOIN cells c ON c.source = q.source
        |    AND c.len_bucket = q.len_bucket AND c.lang = l.lang
        |)
        |SELECT source, len_bucket, CAST(group_n AS BIGINT) AS group_n,
        |  CAST(sum(dev) * 1000000
        |    // (CAST(2 AS HUGEINT) * group_n * total_n) AS BIGINT)
        |    AS tvd_micro,
        |  CAST(CASE WHEN sum(dev) * 1000000
        |      // (CAST(2 AS HUGEINT) * group_n * total_n) > 250000
        |    THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        |FROM terms
        |GROUP BY source, len_bucket, group_n, total_n
        |ORDER BY source, len_bucket""".stripMargin,

    // l-diversity over QI = (source, length bucket), sensitive = lang:
    // groups with under 3 distinct languages are homogeneity handles
    "l_diversity" ->
      """SELECT source, n_chars // 500 AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive,
        |  CAST(CASE WHEN count(DISTINCT lang) < 3 THEN 1 ELSE 0 END
        |    AS BIGINT) AS at_risk
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // Integer-exact mirror of Sampling.epochAllocate's two-round
    // largest-remainder allocation under per-source epoch caps
    // (capacity = 2 × chars, budget 280000, isqrt weights, ties by
    // source; ONE redistribution round, clamped — the documented spec).
    "epoch_allocate" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1
        |), capw AS (
        |  SELECT source, n_docs, chars, chars * 2 AS capacity,
        |    CAST(floor(sqrt(chars)) AS BIGINT) AS wt
        |  FROM counts
        |), bb AS (
        |  SELECT CASE WHEN csum < 280000 THEN csum ELSE 280000 END AS b,
        |    wsum
        |  FROM (SELECT CAST(sum(wt) AS BIGINT) AS wsum,
        |          CAST(sum(capacity) AS BIGINT) AS csum FROM capw)
        |), base AS (
        |  SELECT source, n_docs, chars, capacity, wt,
        |    CASE WHEN wsum > 0 THEN wt * b // wsum ELSE 0 END AS fl,
        |    CASE WHEN wsum > 0 THEN wt * b % wsum ELSE 0 END AS rem
        |  FROM capw, bb
        |), sh1 AS (
        |  SELECT (SELECT b FROM bb) -
        |    (SELECT coalesce(sum(fl), 0) FROM base) AS short1
        |), a1 AS (
        |  SELECT source, n_docs, chars, capacity, wt,
        |    fl + CASE WHEN rr <= short1 THEN 1 ELSE 0 END AS a
        |  FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
        |          AS rr FROM base), sh1
        |), sat AS (
        |  SELECT *, a > capacity AS is_over FROM a1
        |), surplus AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN is_over THEN a - capacity
        |    END), 0) AS BIGINT) AS s FROM sat
        |), base2 AS (
        |  SELECT p.source, p.wt,
        |    CASE WHEN wsum2 > 0 THEN p.wt * s // wsum2 ELSE 0 END AS fl2,
        |    CASE WHEN wsum2 > 0 THEN p.wt * s % wsum2 ELSE 0 END AS rem2
        |  FROM (SELECT * FROM sat WHERE NOT is_over) p, surplus,
        |    (SELECT CAST(coalesce(sum(wt), 0) AS BIGINT) AS wsum2
        |     FROM sat WHERE NOT is_over)
        |), sh2 AS (
        |  SELECT (SELECT s FROM surplus) -
        |    (SELECT coalesce(sum(fl2), 0) FROM base2) AS short2
        |), r2 AS (
        |  SELECT source,
        |    fl2 + CASE WHEN rr2 <= short2 THEN 1 ELSE 0 END AS add2
        |  FROM (SELECT *, row_number() OVER (ORDER BY rem2 DESC, source)
        |          AS rr2 FROM base2), sh2
        |)
        |SELECT t.source, t.n_docs, t.chars,
        |  CAST(t.capacity AS BIGINT) AS capacity,
        |  CAST(CASE WHEN t.is_over THEN t.capacity
        |    ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END
        |    AS BIGINT) AS alloc_chars,
        |  CAST(CASE WHEN t.chars > 0 THEN
        |    (CASE WHEN t.is_over THEN t.capacity
        |      ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END)
        |      * 1000000 // t.chars ELSE 0 END AS BIGINT) AS epochs_micro
        |FROM sat t LEFT JOIN r2 ON r2.source = t.source
        |ORDER BY t.source""".stripMargin,

    // Integer-exact mirror of Sampling.temperatureMix: isqrt weights,
    // integer floor-division targets, largest-remainder (ties by source).
    "temperature_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
        |), w AS (
        |  SELECT source, CAST(floor(sqrt(n_docs)) AS BIGINT) AS wt FROM counts
        |), tot AS (
        |  SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM w
        |), base AS (
        |  SELECT source, wt * 200 // wsum AS fl, wt * 200 % wsum AS rem
        |  FROM w, tot
        |), shortfall AS (
        |  SELECT 200 - sum(fl) AS short FROM base
        |), ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr FROM base
        |), targets AS (
        |  SELECT source,
        |    CAST(fl + CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT) AS target
        |  FROM ranked, shortfall
        |), picks AS (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |      doc_id) AS pick_rank
        |  FROM documents
        |)
        |SELECT p.doc_id, p.source, CAST(p.pick_rank AS BIGINT) AS pick_rank,
        |  t.target
        |FROM picks p JOIN targets t USING (source)
        |WHERE p.pick_rank <= t.target
        |ORDER BY doc_id""".stripMargin,

    "token_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_ish,
        |  len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "quality_score" ->
      """WITH norm AS (
        |  SELECT doc_id, text, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, text, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE) AS nstop,
        |    CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS DOUBLE) AS sumlen
        |  FROM toks
        |), r AS (
        |  SELECT doc_id,
        |    CASE WHEN ntok > 0 THEN nstop/ntok ELSE 0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct/nchars ELSE 0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN sumlen/ntok ELSE 0 END AS mean_word_len,
        |    nchars FROM m
        |)
        |SELECT doc_id,
        |  round(stop_ratio, 6) AS stop_ratio,
        |  round(punct_ratio, 6) AS punct_ratio,
        |  round(mean_word_len, 6) AS mean_word_len,
        |  round((least(nchars/CAST(200 AS DOUBLE), 1.0)
        |       + least(stop_ratio*CAST(5 AS DOUBLE), 1.0)
        |       + greatest(CAST(0 AS DOUBLE), 1.0 - punct_ratio*CAST(10 AS DOUBLE))
        |       + CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |              THEN 1.0 ELSE 0.5 END) / CAST(4 AS DOUBLE), 6) AS quality
        |FROM r ORDER BY doc_id""".stripMargin,

    // winnowing (MOSS): per-window min of the portable 60-bit gram
    // hashes; matching on the surviving fingerprints with an exact
    // df-cut; jaccard threshold applied on the unrounded double
    "winnow_pairs" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), grams AS (
        |  SELECT doc_id, i AS pos,
        |    ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
        |      1, 15))::BIGINT AS h
        |  FROM toks, unnest(generate_series(1, len(w) - 2)) AS g(i)
        |  WHERE len(w) >= 3
        |), wins AS (
        |  SELECT doc_id, min(h) OVER ww AS mh, count(*) OVER ww AS nw
        |  FROM grams
        |  WINDOW ww AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |), fps AS (
        |  SELECT DISTINCT doc_id, mh FROM wins WHERE nw = 4
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1
        |), hot AS (
        |  SELECT mh FROM (SELECT mh, count(*) AS df FROM fps GROUP BY 1) d
        |  WHERE df > 10
        |), kept AS (
        |  SELECT doc_id, mh FROM fps WHERE mh NOT IN (SELECT mh FROM hot)
        |), common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        |  FROM kept a JOIN kept b ON a.mh = b.mh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, n_common,
        |  round(CAST(n_common AS DOUBLE) /
        |    CAST(na.n_fp + nb.n_fp - n_common AS DOUBLE), 6) AS jaccard6
        |FROM common
        |JOIN sizes na ON na.doc_id = id_a
        |JOIN sizes nb ON nb.doc_id = id_b
        |WHERE CAST(n_common AS DOUBLE) /
        |  CAST(na.n_fp + nb.n_fp - n_common AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

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
        |ORDER BY d.doc_id""".stripMargin,

    // integer milli-score; nonnegative numerators so // == Spark div
    "readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> len(x) > 0)) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 AND n_sentences > 0
        |    THEN 206835 - (1015 * n_words) // n_sentences -
        |      (84600 * n_syllables) // n_words
        |    END AS flesch_milli
        |FROM c ORDER BY doc_id""".stripMargin,

    // the oracle's single-partition ntile window IS the spec; the Spark
    // side derives the identical buckets from the length histogram
    "length_deciles" ->
      """WITH ranked AS (
        |  SELECT CAST(length(text) AS BIGINT) AS n_chars,
        |    ntile(10) OVER (ORDER BY length(text), doc_id) AS decile
        |  FROM documents
        |)
        |SELECT decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM ranked GROUP BY decile ORDER BY decile""".stripMargin,

    "lang_id" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sc AS (
        |  SELECT doc_id,
        |    len(list_filter(w, x -> list_contains(['the','and','of','is','a'], x))) AS he,
        |    len(list_filter(w, x -> list_contains(['der','und','die','das','ist'], x))) AS hd,
        |    len(list_filter(w, x -> list_contains(['le','et','les','des','est'], x))) AS hf,
        |    len(list_filter(w, x -> list_contains(['el','y','los','de','es'], x))) AS hs
        |  FROM toks
        |)
        |SELECT doc_id, he AS hits_en,
        |  CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |       WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |       WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
        |       WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |       ELSE 'es' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,

    // Same curve over the per-doc-DISTINCT trigram census (the postings
    // relation the candidate-join family shares).
    "ngram_growth" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), wl AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w
        |  FROM norm
        |), tk AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w) - 2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END)) AS tok FROM wl
        |), b AS (
        |  SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket
        |  FROM documents
        |), cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1
        |), fd AS (
        |  SELECT tok, min(doc_id) AS fdoc FROM tk GROUP BY 1
        |), nv AS (
        |  SELECT b.bucket, CAST(count(*) AS BIGINT) AS new_vocab
        |  FROM fd JOIN b ON b.doc_id = fd.fdoc GROUP BY 1
        |), bt AS (
        |  SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(coalesce(cnt.n, 0)) AS BIGINT) AS n_toks
        |  FROM b LEFT JOIN cnt USING (doc_id) GROUP BY 1
        |)
        |SELECT bt.bucket,
        |  CAST(sum(bt.n_docs) OVER w AS BIGINT) AS cum_docs,
        |  CAST(sum(bt.n_toks) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nv.new_vocab, 0)) OVER w AS BIGINT) AS cum_vocab
        |FROM bt LEFT JOIN nv USING (bucket)
        |WINDOW w AS (ORDER BY bt.bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bt.bucket""".stripMargin,

    // Exact Heaps curve: first occurrence = min(doc_id) over the census;
    // cumulative windows over the 10-row bucket relation, BIGINT casts
    // (DuckDB widens window sums to HUGEINT).
    "vocab_growth" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), b AS (
        |  SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS bucket
        |  FROM documents
        |), cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1
        |), fd AS (
        |  SELECT tok, min(doc_id) AS fdoc FROM tk GROUP BY 1
        |), nv AS (
        |  SELECT b.bucket, CAST(count(*) AS BIGINT) AS new_vocab
        |  FROM fd JOIN b ON b.doc_id = fd.fdoc GROUP BY 1
        |), bt AS (
        |  SELECT b.bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(coalesce(cnt.n, 0)) AS BIGINT) AS n_toks
        |  FROM b LEFT JOIN cnt USING (doc_id) GROUP BY 1
        |)
        |SELECT bt.bucket,
        |  CAST(sum(bt.n_docs) OVER w AS BIGINT) AS cum_docs,
        |  CAST(sum(bt.n_toks) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nv.new_vocab, 0)) OVER w AS BIGINT) AS cum_vocab
        |FROM bt LEFT JOIN nv USING (bucket)
        |WINDOW w AS (ORDER BY bt.bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bt.bucket""".stripMargin,

    // Same scoring CTEs as curate_pipeline with source carried; per-doc
    // quality micro-floored, then exact BIGINT min/mean/max per source.
    "quality_by_source" ->
      """WITH norm AS (
        |  SELECT doc_id, source, text, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, source, text, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), m AS (
        |  SELECT doc_id, source,
        |    CAST(len(w) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE) AS nstop,
        |    CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS DOUBLE) AS sumlen
        |  FROM toks
        |), r AS (
        |  SELECT source,
        |    CASE WHEN ntok > 0 THEN nstop/ntok ELSE 0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct/nchars ELSE 0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN sumlen/ntok ELSE 0 END AS mean_word_len,
        |    nchars FROM m
        |), q AS (
        |  SELECT source, CAST(floor(
        |    round((least(nchars/CAST(200 AS DOUBLE), 1.0)
        |         + least(stop_ratio*CAST(5 AS DOUBLE), 1.0)
        |         + greatest(CAST(0 AS DOUBLE), 1.0 - punct_ratio*CAST(10 AS DOUBLE))
        |         + CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |                THEN 1.0 ELSE 0.5 END) / CAST(4 AS DOUBLE), 6)
        |    * 1000000) AS BIGINT) AS q
        |  FROM r
        |)
        |SELECT source, count(*) AS n_docs,
        |  min(q) AS min_q_micro,
        |  CAST(sum(q) // count(*) AS BIGINT) AS mean_q_micro,
        |  max(q) AS max_q_micro
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    // quality_by_source's per-doc q CTE with doc_id carried, then the
    // within-source (q, doc_id) rank mapped to the exact micro
    // percentile (rank-1)*1e6 // (n-1); single-doc sources at 0
    "quality_calibration" ->
      """WITH norm AS (
        |  SELECT doc_id, source, text, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, source, text, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), m AS (
        |  SELECT doc_id, source,
        |    CAST(len(w) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE) AS nstop,
        |    CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS DOUBLE) AS sumlen
        |  FROM toks
        |), r AS (
        |  SELECT doc_id, source,
        |    CASE WHEN ntok > 0 THEN nstop/ntok ELSE 0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct/nchars ELSE 0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN sumlen/ntok ELSE 0 END AS mean_word_len,
        |    nchars FROM m
        |), q AS (
        |  SELECT doc_id, source, CAST(floor(
        |    round((least(nchars/CAST(200 AS DOUBLE), 1.0)
        |         + least(stop_ratio*CAST(5 AS DOUBLE), 1.0)
        |         + greatest(CAST(0 AS DOUBLE), 1.0 - punct_ratio*CAST(10 AS DOUBLE))
        |         + CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |                THEN 1.0 ELSE 0.5 END) / CAST(4 AS DOUBLE), 6)
        |    * 1000000) AS BIGINT) AS q_micro
        |  FROM r
        |), ranked AS (
        |  SELECT doc_id, source, q_micro,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY q_micro, doc_id) AS rnk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM q
        |)
        |SELECT doc_id, source, q_micro,
        |  CAST(CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
        |       ELSE 0 END AS BIGINT) AS pctl_micro
        |FROM ranked ORDER BY doc_id""".stripMargin,

    // Multinomial NB source attribution: add-1-smoothed log-weights
    // micro-floored ONCE at the sources×vocab model grid, exact BIGINT
    // score sums, argmax with score-desc/source-asc tie order (the
    // Spark min(struct) election), sources² confusion counts.
    "source_confusion" ->
      """WITH norm AS (
        |  SELECT doc_id, source, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tk AS (
        |  SELECT doc_id, source, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), dtf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM tk GROUP BY 1, 2
        |), cnt AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2
        |), st AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cnt GROUP BY 1
        |), vt AS (SELECT DISTINCT tok FROM cnt),
        |vc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vt),
        |pr AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS nd
        |  FROM documents GROUP BY 1
        |), nt AS (SELECT CAST(sum(nd) AS BIGINT) AS ndt FROM pr),
        |w AS (
        |  SELECT st.source, vt.tok,
        |    CAST(floor(ln((CAST(coalesce(cnt.c, 0) AS DOUBLE) + 1)
        |      / (st.ns + vc.v)) * 1000000) AS BIGINT) AS w
        |  FROM st CROSS JOIN vt CROSS JOIN vc
        |  LEFT JOIN cnt ON cnt.source = st.source AND cnt.tok = vt.tok
        |), pw AS (
        |  SELECT source, CAST(floor(ln(CAST(nd AS DOUBLE) / ndt)
        |    * 1000000) AS BIGINT) AS pw
        |  FROM pr CROSS JOIN nt
        |), sc AS (
        |  SELECT dtf.doc_id, w.source,
        |    CAST(sum(tf * w.w) AS BIGINT) + max(pw.pw) AS score
        |  FROM dtf JOIN w USING (tok) JOIN pw ON pw.source = w.source
        |  GROUP BY 1, 2
        |), pred AS (
        |  SELECT doc_id, source AS pred_source FROM (
        |    SELECT doc_id, source, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, source) AS rn
        |    FROM sc) WHERE rn = 1
        |)
        |SELECT d.source, p.pred_source, CAST(count(*) AS BIGINT) AS n
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same marker CTE as lang_id with the label carried; langs² matrix.
    "lang_confusion" ->
      """WITH norm AS (
        |  SELECT lang, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT lang, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), sc AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> list_contains(['the','and','of','is','a'], x))) AS he,
        |    len(list_filter(w, x -> list_contains(['der','und','die','das','ist'], x))) AS hd,
        |    len(list_filter(w, x -> list_contains(['le','et','les','des','est'], x))) AS hf,
        |    len(list_filter(w, x -> list_contains(['el','y','los','de','es'], x))) AS hs
        |  FROM toks
        |), pred AS (
        |  SELECT lang,
        |    CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |         WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |         WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
        |         WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |         ELSE 'es' END AS lang_pred
        |  FROM sc
        |)
        |SELECT lang, lang_pred, count(*) AS n FROM pred
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // OLS of micro-floored ln(freq) on ln(rank) over the tie-broken
    // top-100 ranks; moment sums exact, ONE double division, 6 dp.
    "zipf_slope" ->
      """WITH norm AS (
        |  SELECT source, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tk AS (
        |  SELECT source, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), cnt AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2
        |), ranked AS (
        |  SELECT source, c, row_number() OVER (
        |    PARTITION BY source ORDER BY c DESC, tok) AS r
        |  FROM cnt
        |), pts AS (
        |  SELECT source,
        |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM ranked WHERE r <= 100
        |), mom AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM pts GROUP BY 1
        |)
        |SELECT source, n_ranks,
        |  CASE WHEN n_ranks * sxx - sx * sx = 0 THEN NULL
        |  ELSE round(CAST(n_ranks * sxy - sx * sy AS DOUBLE) /
        |             CAST(n_ranks * sxx - sx * sx AS DOUBLE), 6)
        |  END AS slope6
        |FROM mom ORDER BY source""".stripMargin,

    // Composed curation run: quality + langID scoring → filters → exact
    // dedup keep-lowest-id. Same building blocks as the standalone oracles.
    "curate_pipeline" ->
      """WITH norm AS (
        |  SELECT doc_id, text, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, text, list_filter(string_split(t, ' '), x -> len(x) > 0) AS w FROM norm
        |), m AS (
        |  SELECT doc_id, text,
        |    CAST(len(w) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(w, x -> list_contains(
        |      ['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE) AS nstop,
        |    CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS npunct,
        |    CAST(length(text) AS DOUBLE) AS nchars,
        |    CAST(COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS DOUBLE) AS sumlen,
        |    len(list_filter(w, x -> list_contains(['the','and','of','is','a'], x))) AS he,
        |    len(list_filter(w, x -> list_contains(['der','und','die','das','ist'], x))) AS hd,
        |    len(list_filter(w, x -> list_contains(['le','et','les','des','est'], x))) AS hf,
        |    len(list_filter(w, x -> list_contains(['el','y','los','de','es'], x))) AS hs
        |  FROM toks
        |), r AS (
        |  SELECT doc_id, text,
        |    CASE WHEN ntok > 0 THEN nstop/ntok ELSE 0 END AS stop_ratio,
        |    CASE WHEN nchars > 0 THEN npunct/nchars ELSE 0 END AS punct_ratio,
        |    CASE WHEN ntok > 0 THEN sumlen/ntok ELSE 0 END AS mean_word_len,
        |    nchars, he, hd, hf, hs FROM m
        |), scored AS (
        |  SELECT doc_id, text,
        |    round((least(nchars/CAST(200 AS DOUBLE), 1.0)
        |         + least(stop_ratio*CAST(5 AS DOUBLE), 1.0)
        |         + greatest(CAST(0 AS DOUBLE), 1.0 - punct_ratio*CAST(10 AS DOUBLE))
        |         + CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |                THEN 1.0 ELSE 0.5 END) / CAST(4 AS DOUBLE), 6) AS quality,
        |    CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |         WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |         WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
        |         WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |         ELSE 'es' END AS lang_pred
        |  FROM r
        |)
        |SELECT min(doc_id) AS doc_id, count(*) AS n_copies, min(quality) AS quality
        |FROM scored
        |WHERE lang_pred = 'en' AND quality >= 0.7
        |GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin,

    // Same email/digit-run patterns as TextAnalysis.scrubPii — the
    // Java-regex ∩ RE2 dialect guarantees identical matches.
    "scrub_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_longnums,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same recurrence as graft.functions.RollingHash over the normalized
    // ASCII text (code points == bytes there).
    "doc_fingerprint" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |)
        |SELECT doc_id,
        |  COALESCE(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, c) -> (a*31 + c) % 288230376151711717), 0) AS fingerprint
        |FROM norm ORDER BY doc_id""".stripMargin,

    // All numeric columns CAST to BIGINT: DuckDB's sum/list_sum promote to
    // HUGEINT, which the driver hashes as float64 and mismatches Spark's
    // int64. Generator text is ASCII (asserted in TextMultimodalSpec), so
    // code points == UTF-8 bytes and unicode(c) sums equal the byte sums.
    "media_summary" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST((length(text) + 63) // 64 AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS byte_sum,
        |  md5(text) AS md5
        |FROM documents ORDER BY media_id""".stripMargin,

    // perceptual hash replayed from the bytes: 60 interleaved stripe
    // means vs the whole-media mean (all toward-zero micro integers —
    // nonneg, so // matches the engine's Java division), bit c set ⇒
    // + 2^c (c ≤ 59, positive BIGINT), 15-bit chunks via >>/&, exact
    // Hamming via bit_count(xor). Stripes shorter texts never fill are
    // absent rows here and mean-0 bits (< thr) on the engine — same 0
    "media_phash_dups" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, string_split(text, '') AS cs
        |  FROM documents WHERE length(text) > 0
        |), e AS (
        |  SELECT media_id, generate_subscripts(cs, 1) AS i,
        |    unicode(unnest(cs)) AS b
        |  FROM m
        |), tot AS (
        |  SELECT media_id,
        |    CAST(sum(b) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |      AS thr
        |  FROM e GROUP BY 1
        |), cell AS (
        |  SELECT media_id, (i - 1) % 60 AS c,
        |    CAST(sum(b) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2
        |), bits AS (
        |  SELECT cl.media_id, cl.c,
        |    CASE WHEN cl.s * 1000000 // cl.n >= t.thr THEN 1 ELSE 0 END
        |      AS bit
        |  FROM cell cl JOIN tot t ON t.media_id = cl.media_id
        |), fp AS (
        |  SELECT media_id,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << c)) AS BIGINT) AS ph
        |  FROM bits GROUP BY 1
        |), banded AS (
        |  SELECT media_id, ph, chunk, (ph >> (chunk * 15)) & 32767 AS cv
        |  FROM fp, unnest([0, 1, 2, 3]) AS t(chunk)
        |), cands AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
        |    a.ph AS ph_a, b.ph AS ph_b
        |  FROM banded a JOIN banded b
        |    ON a.chunk = b.chunk AND a.cv = b.cv
        |    AND a.media_id < b.media_id
        |)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS dist
        |FROM cands
        |WHERE bit_count(xor(ph_a, ph_b)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // transitive closure over the same perceptual-hash pair relation:
    // the dedup_groups recursive-reach chain, least-reachable-id rep
    "media_phash_groups" ->
      """WITH RECURSIVE m AS (
        |  SELECT doc_id AS media_id, string_split(text, '') AS cs
        |  FROM documents WHERE length(text) > 0
        |), e AS (
        |  SELECT media_id, generate_subscripts(cs, 1) AS i,
        |    unicode(unnest(cs)) AS b
        |  FROM m
        |), tot AS (
        |  SELECT media_id,
        |    CAST(sum(b) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |      AS thr
        |  FROM e GROUP BY 1
        |), cell AS (
        |  SELECT media_id, (i - 1) % 60 AS c,
        |    CAST(sum(b) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2
        |), bits AS (
        |  SELECT cl.media_id, cl.c,
        |    CASE WHEN cl.s * 1000000 // cl.n >= t.thr THEN 1 ELSE 0 END
        |      AS bit
        |  FROM cell cl JOIN tot t ON t.media_id = cl.media_id
        |), fp AS (
        |  SELECT media_id,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << c)) AS BIGINT) AS ph
        |  FROM bits GROUP BY 1
        |), banded AS (
        |  SELECT media_id, ph, chunk, (ph >> (chunk * 15)) & 32767 AS cv
        |  FROM fp, unnest([0, 1, 2, 3]) AS t(chunk)
        |), mpairs AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM banded a JOIN banded b
        |    ON a.chunk = b.chunk AND a.cv = b.cv
        |    AND a.media_id < b.media_id
        |  WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |), und AS (
        |  SELECT id_a AS a, id_b AS b FROM mpairs
        |  UNION ALL SELECT id_b, id_a FROM mpairs
        |), reach(src, dst) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        |), mem AS (SELECT DISTINCT a AS id FROM und)
        |SELECT mm.id AS media_id, least(mm.id, min(r.dst)) AS rep_id
        |FROM mem mm JOIN reach r ON r.src = mm.id
        |GROUP BY mm.id ORDER BY media_id""".stripMargin,

    // the decode→frame-sample codec path, integer-exact per sampled
    // frame: 64-byte frames (decodeStub), every 4th kept, byte sums via
    // unicode() over the ASCII generator text (chars == bytes, asserted
    // in TextMultimodalSpec), micro mean = floor division of nonnegatives
    "media_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(length(text) AS BIGINT) AS n_bytes
        |  FROM documents WHERE length(text) > 0
        |), f AS (
        |  SELECT media_id, text,
        |    unnest(range(0, (n_bytes + 63) // 64)) AS frame_idx
        |  FROM m
        |), s AS (
        |  SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |    substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS fr
        |  FROM f WHERE frame_idx % 4 = 0
        |)
        |SELECT media_id, frame_idx,
        |  CAST(length(fr) AS BIGINT) AS frame_len,
        |  CAST(list_sum(list_transform(string_split(fr, ''),
        |    c -> unicode(c))) AS BIGINT) AS frame_sum,
        |  CAST(list_sum(list_transform(string_split(fr, ''),
        |    c -> unicode(c))) * 1000000 // length(fr) AS BIGINT)
        |    AS mean_micro
        |FROM s ORDER BY media_id, frame_idx""".stripMargin,

    // byte-range fetch plan: pure arithmetic on the byte length (ASCII
    // generator text ⇒ chars == bytes, asserted in TextMultimodalSpec)
    "media_chunk_plan" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |    CAST(length(text) AS BIGINT) AS n_bytes
        |  FROM documents WHERE length(text) > 0)
        |, c AS (
        |  SELECT media_id, kind, n_bytes,
        |    unnest(range(0, (n_bytes - 1) // 256 + 1)) AS chunk_idx
        |  FROM m)
        |SELECT media_id, kind, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 256 AS BIGINT) AS byte_start,
        |  CAST(least(n_bytes, (chunk_idx + 1) * 256) AS BIGINT) AS byte_end
        |FROM c
        |ORDER BY media_id, chunk_idx""".stripMargin,

    // Two-sample chi-square drift between time halves; every numerator a
    // square (nonnegative), so // == truncating div == floor on both
    // engines; intermediates ride HUGEINT, final CAST to BIGINT (the
    // driver hashes HUGEINT differently).
    "value_drift" ->
      """WITH m AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |  FROM events
        |), b AS (
        |  SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |    CAST(sum(CASE WHEN epoch_us(ts) <= m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN epoch_us(ts) > m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1
        |  FROM events, m GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1, count(*) AS n_bins
        |  FROM b GROUP BY 1
        |)
        |SELECT b.event_type, max(t.n0) AS n_early, max(t.n1) AS n_late,
        |  max(t.n_bins) AS n_bins,
        |  CASE WHEN max(t.n0) = 0 OR max(t.n1) = 0 THEN NULL
        |    ELSE CAST(sum((CAST(c0 AS HUGEINT) * n1 -
        |                   CAST(c1 AS HUGEINT) * n0) *
        |                  (CAST(c0 AS HUGEINT) * n1 -
        |                   CAST(c1 AS HUGEINT) * n0) * 1000000
        |                  // (c0 + c1))
        |         // (CAST(max(t.n0) AS HUGEINT) * max(t.n1)) AS BIGINT)
        |    END AS chi2_micro
        |FROM b JOIN t ON b.event_type = t.event_type
        |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,

    // PSI over the same halves/bins as value_drift; each Laplace-
    // smoothed term micro-floored to BIGINT before the sum (the
    // lm_perplexity float-determinism surrogate).
    "psi_drift" ->
      """WITH m AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |  FROM events
        |), b AS (
        |  SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        |    CAST(sum(CASE WHEN epoch_us(ts) <= m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN epoch_us(ts) > m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1
        |  FROM events, m GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(count(*) AS BIGINT) AS nb
        |  FROM b GROUP BY 1
        |)
        |SELECT b.event_type, max(t.n0) AS n_early, max(t.n1) AS n_late,
        |  max(t.nb) AS n_bins,
        |  CASE WHEN max(t.n0) = 0 OR max(t.n1) = 0 THEN NULL
        |    ELSE CAST(sum(CAST(floor(
        |      ((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) -
        |       (CAST(c0 + 1 AS DOUBLE) / (n0 + nb))) *
        |      ln((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) /
        |         (CAST(c0 + 1 AS DOUBLE) / (n0 + nb))) * 1000000)
        |      AS BIGINT)) AS BIGINT)
        |    END AS psi_micro
        |FROM b JOIN t ON b.event_type = t.event_type
        |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,

    // Per-source unigram KL vs the corpus blend; same normalization CTE
    // as vocab_jaccard, micro-floored ln terms, BIGINT sums.
    "source_kl" ->
      """WITH norm AS (
        |  SELECT source, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tk AS (
        |  SELECT source, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), cnt AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2
        |), st AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ns,
        |    CAST(count(*) AS BIGINT) AS vocab FROM cnt GROUP BY 1
        |), tt AS (
        |  SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1
        |), g AS (
        |  SELECT CAST(sum(ns) AS BIGINT) AS n FROM st
        |)
        |SELECT cnt.source, max(st.ns) AS n_tokens, max(st.vocab) AS vocab,
        |  CAST(sum(CAST(floor(
        |    (CAST(c AS DOUBLE) / ns) *
        |    ln((CAST(c AS DOUBLE) / ns) /
        |       (CAST(ct AS DOUBLE) / n)) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS kl_micro
        |FROM cnt JOIN tt USING (tok) JOIN st USING (source) CROSS JOIN g
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Per-source Jensen–Shannon divergence vs the corpus blend: the
    // source_kl CTE chain extended with the full source × vocab grid
    // (absent cells restored by the left join — their q·ln2 mass is
    // part of the distance), one micro-floor per grid cell (½ folded
    // into the ×500000 scale), BIGINT sum.
    "js_divergence" ->
      """WITH norm AS (
        |  SELECT source, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), tk AS (
        |  SELECT source, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), cnt AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2
        |), st AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cnt GROUP BY 1
        |), tt AS (
        |  SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1
        |), g AS (
        |  SELECT CAST(sum(ns) AS BIGINT) AS n FROM st
        |), grid AS (
        |  SELECT st.source, st.ns, tt.tok, tt.ct, coalesce(cnt.c, 0) AS c
        |  FROM st CROSS JOIN tt
        |  LEFT JOIN cnt ON cnt.source = st.source AND cnt.tok = tt.tok
        |)
        |SELECT source, max(ns) AS n_tokens,
        |  CAST(sum(CAST(floor((
        |    CASE WHEN c = 0 THEN CAST(0 AS DOUBLE)
        |         ELSE (CAST(c AS DOUBLE) / ns) *
        |           ln((CAST(c AS DOUBLE) / ns) /
        |              ((CAST(c AS DOUBLE) / ns + CAST(ct AS DOUBLE) / n) / 2))
        |    END
        |    + (CAST(ct AS DOUBLE) / n) *
        |      ln((CAST(ct AS DOUBLE) / n) /
        |         ((CAST(c AS DOUBLE) / ns + CAST(ct AS DOUBLE) / n) / 2))
        |  ) * 500000) AS BIGINT)) AS BIGINT) AS js_micro
        |FROM grid CROSS JOIN g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Per-source 1-D Wasserstein over n_chars//50 length buckets:
    // W₁ = Σ_b |CDF_s − CDF_c|·gap(b) in bucket units (gap = distance
    // to the next occupied bucket — the CDF step holds across empty
    // buckets), integer-exact — the cumulative deviations widened
    // through HUGEINT, one micro-floor division at the end (mirrors
    // the Spark DECIMAL(38,0) ladder).
    "emd_length_drift" ->
      """WITH base AS (
        |  SELECT source, n_chars // 50 AS b FROM documents
        |), cell AS (
        |  SELECT source, b, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2
        |), st AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cell GROUP BY 1
        |), bk AS (
        |  SELECT b, CAST(sum(c) AS BIGINT) AS cb,
        |    coalesce(lead(b) OVER (ORDER BY b) - b, 0) AS gap
        |  FROM cell GROUP BY b
        |), g AS (
        |  SELECT CAST(sum(cb) AS BIGINT) AS n FROM bk
        |), grid AS (
        |  SELECT st.source, st.ns, bk.b, bk.cb, bk.gap,
        |    coalesce(cell.c, 0) AS c
        |  FROM st CROSS JOIN bk
        |  LEFT JOIN cell ON cell.source = st.source AND cell.b = bk.b
        |), cum AS (
        |  SELECT source, ns, b, gap,
        |    sum(c) OVER (PARTITION BY source ORDER BY b) AS cum_s,
        |    sum(cb) OVER (PARTITION BY source ORDER BY b) AS cum_c
        |  FROM grid
        |)
        |SELECT source, ns AS n_docs,
        |  CAST(sum(abs(CAST(cum_s AS HUGEINT) * n
        |      - CAST(cum_c AS HUGEINT) * ns) * gap) * 1000000
        |    // (CAST(ns AS HUGEINT) * n) AS BIGINT) AS emd_micro
        |FROM cum CROSS JOIN g GROUP BY source, ns, n
        |ORDER BY source""".stripMargin,

    // Full pairwise source-vocabulary mixing matrix; same normalization
    // CTE as lexical_richness, counts stay BIGINT throughout.
    "vocab_jaccard" ->
      """WITH norm AS (
        |  SELECT source, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), v AS (
        |  SELECT DISTINCT source, unnest(list_filter(string_split(t, ' '),
        |    x -> len(x) > 0)) AS tok FROM norm
        |), sz AS (
        |  SELECT source, count(*) AS vs FROM v GROUP BY 1
        |), i AS (
        |  SELECT a.source AS sa, b.source AS sb, count(*) AS n_inter
        |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT x.source AS source_a, y.source AS source_b,
        |  x.vs AS vocab_a, y.vs AS vocab_b,
        |  coalesce(i.n_inter, 0) AS n_inter,
        |  coalesce(i.n_inter, 0) * 1000000
        |    // (x.vs + y.vs - coalesce(i.n_inter, 0)) AS jaccard_micro
        |FROM sz x JOIN sz y ON x.source < y.source
        |LEFT JOIN i ON i.sa = x.source AND i.sb = y.source
        |ORDER BY source_a, source_b""".stripMargin,

    // Two-sample KS: max empirical-CDF gap over distinct values between
    // the same wall-clock halves as value_drift; exact HUGEINT
    // cross-products, final CAST to BIGINT.
    "ks_drift" ->
      """WITH m AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |  FROM events
        |), c AS (
        |  SELECT event_type, value,
        |    CAST(sum(CASE WHEN epoch_us(ts) <= m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN epoch_us(ts) > m.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1
        |  FROM events, m GROUP BY 1, 2
        |), k AS (
        |  SELECT event_type, value, c0, c1,
        |    sum(c0) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS UNBOUNDED PRECEDING) AS k0,
        |    sum(c1) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS UNBOUNDED PRECEDING) AS k1
        |  FROM c
        |), t AS (
        |  SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
        |    CAST(sum(c1) AS BIGINT) AS n1
        |  FROM c GROUP BY 1
        |)
        |SELECT k.event_type, max(t.n0) AS n_early, max(t.n1) AS n_late,
        |  CASE WHEN max(t.n0) = 0 OR max(t.n1) = 0 THEN NULL
        |    ELSE CAST(max(abs(CAST(k.k0 AS HUGEINT) * t.n1 -
        |                      CAST(k.k1 AS HUGEINT) * t.n0)) * 1000000
        |      // (CAST(max(t.n0) AS HUGEINT) * max(t.n1)) AS BIGINT)
        |    END AS ks_micro
        |FROM k JOIN t ON k.event_type = t.event_type
        |GROUP BY k.event_type ORDER BY k.event_type""".stripMargin,

    // Exact-integer damped PageRank, three unrolled iterations over the
    // same cosine pair CTE as dup_triangles; per-edge floors then
    // order-independent integer sums — bit-portable. DuckDB sum() widens
    // to HUGEINT, final CAST back to BIGINT.
    "dup_pagerank" ->
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
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), deg AS (
        |  SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1
        |), r0 AS (
        |  SELECT id, CAST(1000000 AS BIGINT) AS r FROM deg
        |), r1 AS (
        |  SELECT e.dst AS id,
        |    150000 + CAST(sum((r.r * 85) // (d.deg * 100)) AS BIGINT) AS r
        |  FROM edges e JOIN r0 r ON r.id = e.src
        |  JOIN deg d ON d.id = e.src GROUP BY 1
        |), r2 AS (
        |  SELECT e.dst AS id,
        |    150000 + CAST(sum((r.r * 85) // (d.deg * 100)) AS BIGINT) AS r
        |  FROM edges e JOIN r1 r ON r.id = e.src
        |  JOIN deg d ON d.id = e.src GROUP BY 1
        |), r3 AS (
        |  SELECT e.dst AS id,
        |    150000 + CAST(sum((r.r * 85) // (d.deg * 100)) AS BIGINT) AS r
        |  FROM edges e JOIN r2 r ON r.id = e.src
        |  JOIN deg d ON d.id = e.src GROUP BY 1
        |)
        |SELECT deg.id AS vec_id, deg.deg AS degree, r3.r AS pr_micro
        |FROM deg JOIN r3 ON r3.id = deg.id
        |ORDER BY vec_id""".stripMargin,

    // Per-label centroid shift between vec_id halves, exact integers:
    // micro-floored dims with a +1e6 offset (positive means ⇒ truncating
    // div IS floor on both engines); per-dim means bounded by the value
    // range, so every column is BIGINT — no HUGEINT (tripwire-safe).
    // label-centroid cosine matrix: the per-label integer SUM vectors
    // stand in for the centroids (counts cancel in cosine); HUGEINT
    // intermediates, one guarded sqrt·sqrt·divide on exact ints
    "label_sim_matrix" ->
      """WITH elems AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), nvec AS (
        |  SELECT label, i,
        |    CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS n
        |  FROM elems GROUP BY 1, 2
        |), norms AS (
        |  SELECT label, sum(CAST(n AS HUGEINT) * n) AS n2
        |  FROM nvec GROUP BY 1
        |), dots AS (
        |  SELECT a.label AS la, b.label AS lb,
        |    sum(CAST(a.n AS HUGEINT) * b.n) AS dot
        |  FROM nvec a JOIN nvec b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2
        |)
        |SELECT la, lb,
        |  CASE WHEN na.n2 > 0 AND nb.n2 > 0
        |    THEN round(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
        |  END AS cos6
        |FROM dots
        |JOIN norms na ON na.label = dots.la
        |JOIN norms nb ON nb.label = dots.lb
        |ORDER BY la, lb""".stripMargin,

    "embedding_drift" ->
      """WITH m AS (
        |  SELECT (min(vec_id) + max(vec_id)) // 2 AS mid FROM embeddings
        |), elems AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CASE WHEN vec_id <= m.mid THEN 0 ELSE 1 END AS half,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
        |      AS BIGINT) + 1000000 AS xi
        |  FROM embeddings, m
        |), dims AS (
        |  SELECT label, i,
        |    CAST(sum(CASE WHEN half = 0 THEN xi END) AS BIGINT) AS s0,
        |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c0,
        |    CAST(sum(CASE WHEN half = 1 THEN xi END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1
        |  FROM elems GROUP BY 1, 2
        |), diffs AS (
        |  SELECT label, c0, c1,
        |    CASE WHEN c0 = 0 OR c1 = 0 THEN NULL
        |      ELSE (s0 // c0) - (s1 // c1) END AS d
        |  FROM dims
        |)
        |SELECT label, max(c0) AS n_ref, max(c1) AS n_new,
        |  CAST(sum(d * d) AS BIGINT) AS shift2_micro2,
        |  max(abs(d)) AS max_dim_shift_micro
        |FROM diffs GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
