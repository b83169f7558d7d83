package graft

/** Plan-shape regressions: the scale-critical physical properties asserted
  * directly on the executed plans, so a refactor can't silently lose a
  * pushdown, prune, broadcast, or top-k strategy. */
class PlanSpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("trends: range + equality predicates reach the parquet scan") {
    val p = planOf("trends_10min")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(ts,"), "raw ts lower bound not pushed")
    assert(p.contains("LessThanOrEqual(ts,"), "raw ts upper bound not pushed")
    assert(p.contains("EqualTo(event_type,purchase)"))
  }

  test("q1: shipdate filter pushed, unused columns pruned from the scan") {
    val p = planOf("q1_pricing")
    assert(p.contains("LessThanOrEqual(l_shipdate,"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      p.split("ReadSchema").last)
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads unused columns: $readSchema")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(planOf("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q3/q5 join dims via broadcast at this SF (size-based, AQE-degradable)") {
    assert(planOf("q3_shipping").contains("BroadcastHashJoin"))
    assert(planOf("q5_region_revenue").contains("BroadcastHashJoin"))
  }

  test("curate pipeline is join-free: one scan, one dedup shuffle") {
    // optimized (logical) plan: nodes appear exactly once, so occurrence
    // counts are meaningful (formatted physical output echoes each node in
    // both the tree and the details section)
    val p = SparkEntry.queries("curate_pipeline")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), "curate_pipeline composes scores via a join")
    assert(p.split("Relation \\[").length - 1 == 1,
      "curate_pipeline scans documents more than once")
    // the expensive token pass is evaluated once per row, not duplicated
    // into a pushed-down predicate copy of the projection chain
    assert(p.split("token_profile\\(").length - 1 == 1,
      "token_profile duplicated — filter pushed through the scoring projection")
  }

  test("runtime bloom-filter pruning injects on a selective shuffle join") {
    // the 100 TB fact⋈filtered-dim shape: when the dim side is filtered
    // and the join must shuffle, Catalyst can build a bloom filter on the
    // dim keys and push it into the fact scan — rows that cannot join are
    // dropped before the exchange. Thresholds are sized for clusters, so
    // lower them to demonstrate on test data; restore after.
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", 0)
      val li = Tables.lineitem(spark, sf0001)
      val part = Tables.part(spark, sf0001).filter(col("p_type") === "PROMO")
      val plan = li.join(part, li("l_partkey") === part("p_partkey"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter"),
        "no runtime bloom filter injected into the fact side")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("dedup/minhash joins are equi-joins, never cartesian") {
    Seq("ngram_jaccard_pairs", "minhash_lsh_pairs", "simhash_pairs",
        "dedup_against", "semantic_dedup", "semantic_dedup_against",
        "rnn_pairs", "media_phash_dups", "tf_cosine_pairs").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("NB/JS grids cross only AGGREGATE-bounded relations, pairs stay equi-joined") {
    // the sources×vocab model grids are deliberate crosses of two
    // bounded aggregates; what must never appear is a cartesian over
    // DATA — every data-sized relation (doc tf census, postings) joins
    // by key. BroadcastNestedLoopJoin over the bounded side is the
    // expected physical form of the grid cross.
    Seq("source_confusion", "js_divergence", "emd_length_drift",
        "t_closeness", "blocking_quality").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("priority sample rides TakeOrderedAndProject off a shuffle-free scan") {
    val p = planOf("priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "k smallest priorities must not plan a global sort")
    // priority is a scan projection: no exchange below the TakeOrdered
    assert(!p.contains("Exchange hashpartitioning"),
      "priority computation must stay map-side")
  }

  test("ngram jaccard: hot-shingle df-cut is live, as a broadcast anti-join") {
    // the REGISTERED query reads the family's checkpointed prefix
    // (LogicalRDD), so the guard is asserted on the generator it
    // materializes — the operator-API form builds the full plan
    val q = graft.operators.Dedup.ngramJaccardPairs(
      Tables.documents(spark, sf0001), threshold = 0.8)
    val p = q.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftAnti"), "df-cut skew guard not in the plan")
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      "hot-shingle set should broadcast into the anti-join")
  }

  test("ann_lsh signature is the native expression, no interpreted HOFs") {
    val p = SparkEntry.queries("ann_lsh_topk")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("plane_signature"), "plane_signature not in the plan")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "interpreted HOF lambdas back in the LSH signature path")
  }

  test("decontaminate broadcasts the eval n-gram set; corpus shuffles only for the hit count") {
    // asserted on the OPERATOR chain: the registered query now reads
    // the memoized fraction relation (fracFor — shared with
    // decontaminate_frac/contamination_deciles), so the broadcast shape
    // lives inside the memo build (the bm25 precedent)
    val p = graft.operators.TextAnalysis.decontaminationFraction(
      Tables.documents(spark, sf0001)).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"),
      "eval n-gram set should broadcast against the corpus scan")
    assert(!p.contains("SortMergeJoin"),
      "corpus postings shuffled into the eval join — wrong shape at scale")
    // and the gated binary flag serves the checkpointed relation
    val gated = SparkEntry.queries("decontaminate")(spark, sf0001)
    assert(gated.queryExecution.executedPlan.toString
      .contains("Scan ExistingRDD"),
      "gated decontaminate must read the memoized fraction checkpoint")
  }

  test("repetition score plans as a pure projection: no join, no aggregate") {
    val p = SparkEntry.queries("repetition_score")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Join") && !p.contains("Aggregate"),
      "repetition_score is not map-side")
    assert(p.split("Relation \\[").length - 1 == 1)
  }

  test("vocab top-k plans as TakeOrderedAndProject over a partial agg") {
    val p = planOf("vocab_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "vocabulary top-k fell back to a global sort")
    assert(p.contains("HashAggregate"), "token counts not hash-aggregated")
  }

  test("temperature mix broadcasts the targets; one corpus window shuffle") {
    val p = planOf("temperature_mix")
    assert(p.contains("BroadcastHashJoin"),
      "per-source targets should broadcast against the ranked corpus")
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled into the targets join — targets are driver-sized")
  }

  test("coarse-group rank/quantile queries ride the cell or histogram closed forms") {
    // a window partitioned by a handful of statuses/types is a
    // data-sized task at 100 TB; every Window in these plans must be
    // either (group, cell)-partitioned or aggregate-bounded (the value
    // histogram)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // pack_sequences/pack_spans now read the memoized layout checkpoint
    // (registry.Memo.packLayoutFor), so the guard runs on the OPERATOR
    // chain (the full tokenize + prefix-sum prefix) — the bm25 precedent
    val docs = Tables.documents(spark, sf0001)
    val operatorPlans = Seq(
      "pack_sequences(op)" ->
        graft.operators.Sampling.packSequences(docs),
      "pack_spans(op)" ->
        graft.operators.Sampling.packSequenceSpans(docs))
    val queryPlans = Seq("rank_bands", "quantiles_disc_by_type",
      "winsorize_values", "trimmed_mean", "equidepth_histogram",
      "quality_calibration", "temperature_mix")
      .map(q => q -> SparkEntry.queries(q)(spark, sf0001))
    for ((q, df) <- queryPlans ++ operatorPlans) {
      val plan = df.queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow
          if !w.partitionSpec.exists(_.toString.contains("__cell")) &&
            w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q plans a window not bounded by cell or aggregate: $bad")
    }
    // and the gated pack family serves the checkpointed layout — no
    // re-tokenize on the gated paths
    for (q <- Seq("pack_sequences", "pack_spans", "epoch_order")) {
      val gated = SparkEntry.queries(q)(spark, sf0001)
      assert(gated.queryExecution.executedPlan.toString
        .contains("Scan ExistingRDD"),
        s"gated $q must read the memoized layout checkpoint")
    }
  }

  test("report ntiles ride the closed form: no unpartitioned window over a data-sized input") {
    // vocab_growth/ngram_growth (doc-cardinality), contamination_deciles
    // (per-doc fractions) and rfm_segments (per-user grid) all STATE ntile
    // in the oracle but must never plan a single-task global sort: the only
    // unpartitioned Window nodes allowed are the cumulative passes over
    // aggregate-bounded relations (cell/bucket histograms).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (q <- Seq("vocab_growth", "ngram_growth", "contamination_deciles",
        "rfm_segments", "length_deciles")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q plans an unpartitioned Window over a non-aggregated input")
    }
  }

  test("winnow_pairs and dup_spans ride the memoized positions census — no re-tokenize") {
    for (q <- Seq("winnow_pairs", "dup_spans")) {
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("LogicalRDD"),
        s"$q does not read the checkpointed positions prefix")
      assert(!p.contains("word_ngrams"),
        s"$q re-derives the trigram positions census in-plan")
    }
  }

  test("exact ANN gates rank via the bounded heap — no window over corpus-sized partitions") {
    // annBruteForce/knnClassify/hardNegatives broadcast a handful of
    // queries against the whole corpus, so ANY per-query window
    // partition is corpus-sized (a per-query full sort). The r12-r13
    // rework routes ranking through the TopKRows bounded-heap
    // aggregate on the OrderBits key: these plans must contain no
    // Window node at all (elections downstream are min(struct) or
    // aggregate-bounded).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("ann_topk", "hard_negatives", "knn_classify")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan
      val wins = plan.collect { case w: LWindow => w }
      assert(wins.isEmpty,
        s"$q plans a Window — the bounded-heap rank regressed: $wins")
      assert(plan.toString.contains("topk_rows"),
        s"$q no longer ranks via the TopKRows aggregate")
    }
  }

  test("NO registered query plans an unpartitioned window over an unbounded input") {
    // the repo-wide invariant behind the report-ntile closed forms: an
    // unpartitioned Window is a single task holding its whole input, so
    // it is only admissible over a relation already bounded by an
    // Aggregate (histograms, rollups) or a Limit (top-k lists). Every
    // query in the registry is swept — a future operator reintroducing a
    // global-sort window fails here by name.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Window => LWindow}
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.child.collectFirst {
            case a: Aggregate => a
            case l: GlobalLimit => l
            case l: LocalLimit => l
          }.isEmpty => w
      }
      if (bad.nonEmpty) Some(s"$q (${bad.length})") else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned data-sized windows in: ${offenders.mkString(", ")}")
  }

  test("gapfill spine joins broadcast — no shuffle of the generated range") {
    val p = planOf("trends_gapfill")
    assert(p.contains("Range ("), "spine should be a distributed Range scan")
    assert(p.contains("BroadcastHashJoin"),
      "result-cardinality agg should broadcast into the spine")
  }

  test("tfidf: ONE corpus scan — df rides a window, not a re-aggregated join") {
    // the query now reads the memoized token prefix (a LogicalRDD
    // checkpoint scan), so count BOTH scan shapes: exactly one total
    // means df is window-formulated, never a join re-scan
    val p = SparkEntry.queries("tfidf_top_term")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    val scans = (p.split("Relation \\[").length - 1) +
      (p.split("LogicalRDD \\[").length - 1)
    assert(scans == 1,
      s"tfidf_top_term re-scans documents (join-formulated df):\n$p")
  }

  test("q6: all three range predicates reach the parquet scan") {
    val p = planOf("q6_forecast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"))
    assert(p.contains("GreaterThanOrEqual(l_discount,"))
    assert(p.contains("LessThan(l_quantity,"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"q6 scan reads unused columns: $readSchema")
  }

  test("q4 plans the correlated EXISTS as a semi join, not an aggregate rewrite") {
    val p = SparkEntry.queries("q4_priority_counts")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("LeftSemi"), "EXISTS should plan as a LEFT SEMI join")
  }

  test("kmv rank filter plans as a window group limit, not a full sort+filter") {
    val p = SparkEntry.queries("kmv_distinct")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "row_number ≤ k should prune per-partition before the window")
  }

  test("q7 broadcasts both nation aliases; facts shuffle once") {
    val p = planOf("q7_nation_volume")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "both nation dim aliases should broadcast")
  }

  test("q21 decorrelates to one lineitem scan (window counts, no self-joins)") {
    val p = SparkEntry.queries("q21_late_suppliers")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    val liScans = p.linesIterator.count(l =>
      l.contains("Relation [") && l.contains("l_orderkey"))
    assert(liScans == 1, s"q21 scans lineitem $liScans times, expected 1")
  }

  test("funnel chains three step windows over ONE user shuffle") {
    val p = SparkEntry.queries("funnel_steps")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "funnel should shuffle once on user_id; step windows share the exchange")
  }

  test("dispersion is a single partial→final aggregate: one shuffle, one scan") {
    val p = SparkEntry.queries("dispersion_by_type")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1)
    assert("Scan parquet".r.findAllIn(p).length == 1)
  }

  test("q2 decorrelates the min-cost subquery: one lineitem scan, window min") {
    val p = SparkEntry.queries("q2_min_cost_supplier")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    val liScans = p.linesIterator.count(l =>
      l.contains("Relation [") && l.contains("l_partkey"))
    assert(liScans == 1, s"q2 scans lineitem $liScans times, expected 1")
    assert(p.contains("windowspecdefinition"),
      "per-part best cost should ride a window, not a re-aggregated join")
  }

  test("q20 plans the nested IN chain as semi joins; fact scanned once") {
    val p = SparkEntry.queries("q20_bulk_shippers")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.split("LeftSemi").length - 1 >= 2,
      "both IN subqueries should plan as LEFT SEMI joins")
    val liScans = p.linesIterator.count(l =>
      l.contains("Relation [") && l.contains("l_orderkey"))
    assert(liScans == 1, s"q20 scans lineitem $liScans times, expected 1")
  }

  test("q16 anti-joins the excluded suppliers via broadcast") {
    val p = planOf("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), "NOT IN should plan as a LEFT ANTI join")
    assert(p.contains("BroadcastHashJoin"),
      "driver-small excluded set should broadcast")
  }

  test("minhash verify carries sizes through the band join: ≤4 corpus scans") {
    // 2 signature-pass references (identical subtrees, runtime-reusable
    // exchange) + 2 verify posting scans; the old sizes joins added 2 more
    val p = SparkEntry.queries("minhash_lsh_pairs")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.split("Relation \\[").length - 1 <= 4,
      "minhash_lsh_pairs re-scans documents for sizes")
  }

  test("ann_ivf_sq_topk: one corpus scan, broadcast probe join, codes-only scoring") {
    val p = planOf("ann_ivf_sq_topk")
    // the int8-code serving path: candidates come from ONE corpus scan
    // (codes + cell assignment are map-side projections of it), probes
    // broadcast, never a cartesian — the annIvfPq plan contract
    assert(p.split("\\(\\d+\\) Scan parquet").length - 1 == 1,
      s"SQ8 serving must scan the corpus exactly once:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "probe join must broadcast the nProbe·|queries| rows")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"SQ8 serving plans a nested-loop join:\n$p")
    // scoring runs on the code arrays (zip_with/aggregate), not on a
    // second vector fetch: no dot-product over embedding above the join
    assert(p.contains("zip_with"),
      "score must be the integer code-grid dot (zip_with over codes)")
  }

  test("join_size_audit: runs entirely off the materialized key tables, pairs never materialize") {
    val p = planOf("join_size_audit")
    // the exact half joins two per-key COUNT tables — the pair relation
    // itself must never appear (that's the whole point of the audit);
    // a data-sized cartesian would mean the operator ran the join
    assert(!p.contains("CartesianProduct"),
      s"join_size_audit plans a data-sized cartesian:\n$p")
    // the output assembly crosses four SINGLE-ROW aggregates (n_left,
    // n_right, exact, estimate) — the bounded BNLJ form is expected
    assert(p.contains("BroadcastNestedLoopJoin"),
      "expected the bounded 1-row assembly crosses")
    // the per-side per-key count table is the checkpointed sufficient
    // statistic: every branch (counts, exact, cells) reads IT, so the
    // final plan contains ZERO re-scans of the data — each side was
    // scanned exactly once, at prefix materialization
    assert(p.split("\\(\\d+\\) Scan parquet").length - 1 == 0 &&
      p.contains("Scan ExistingRDD"),
      s"audit must run off the materialized key tables, never re-scan:\n$p")
  }

  test("hll_shard_merge: cells-sized merge off the checkpointed registers, no window") {
    val p = planOf("hll_shard_merge")
    // the shard register table is the checkpointed prefix (one corpus
    // scan at materialization); the query plan merges CELLS only
    assert(p.split("\\(\\d+\\) Scan parquet").length - 1 == 0 &&
      p.contains("Scan ExistingRDD"),
      s"shard merge must run off the register cells, never re-scan:\n$p")
    // both levels are hash aggregates over register cells; a Window or
    // cartesian here would mean the merge stopped being sketch-sized
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"shard merge must stay aggregate-only:\n$p")
  }

  test("temporal joins stay equi-keyed: no nested-loop/cartesian anywhere") {
    // session_overlaps states an interval inequality; the bin bucketing
    // must turn it into a hash/merge join on __bin, never a BNLJ
    Seq("session_overlaps", "dup_triangles", "range_join_counts").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join:\n$p")
    }
  }

  test("round-5 pair ops stay equi-keyed: no nested-loop/cartesian") {
    // (type_pair_lift is excluded: its crossJoin broadcasts the 1-row
    // n_users scalar — an intentional, bounded nested loop)
    Seq("winnow_pairs", "temporal_copresence",
        "lead_lag_corr", "pair_correlation_daily").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join:\n$p")
    }
  }

  test("winnowing df-cut is live, as a broadcast anti-join") {
    val p = planOf("winnow_pairs")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"hot-fingerprint cut must be a broadcast anti-join:\n$p")
  }

  test("length deciles: 2 pruned scans, one reused exchange, one tiny BNLJ") {
    val p = planOf("length_deciles")
    // histogram (cum) + total branches — identical agg subplans whose
    // exchange AQE reuses at runtime; both scans prune to the text column
    val opt = SparkEntry.queries("length_deciles")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(opt.split("Relation \\[").length - 1 == 2,
      s"histogram and total should be the only corpus scans:\n$opt")
    // ONE rank lookup join: nested-loop by necessity, but the BROADCAST
    // side is the 2k-row rank table and the streamed side the
    // (≤ distinct-lengths) histogram — corpus-size-independent
    assert(p.split("\\(\\d+\\) BroadcastNestedLoopJoin").length - 1 == 1,
      s"both bucket edges must resolve through one lookup pass:\n$p")
    val df = SparkEntry.queries("length_deciles")(spark, sf0001)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "the histogram exchange must be shared between cum and total")
  }

  test("bm25: tf and dl share one tokenize pass via a reused exchange") {
    // tf (term-filtered) and dl (per-doc length) both derive from the
    // same (doc_id, term) count aggregate; its exchange must be
    // materialized once, not re-tokenize the corpus per consumer.
    // Asserted on the OPERATOR: the registered query now reads the
    // memoized checkpoint (shared with hybrid_rrf), so the exchange
    // reuse lives inside the memo build.
    val df = graft.operators.TextAnalysis.bm25Scores(
      Tables.documents(spark, sf0001))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "tokCounts exchange must be shared between tf and dl")
    // and the registered query serves the checkpointed relation — no
    // re-tokenize (no exchange at all) on the gated path
    val gated = SparkEntry.queries("bm25_scores")(spark, sf0001)
    assert(gated.queryExecution.executedPlan.toString
      .contains("Scan ExistingRDD"),
      "gated bm25_scores must read the memoized checkpoint")
  }

  test("source_kl: one tokenize — census exchange shared by all derived totals") {
    // srcTot, termTot and the corpus grand total all re-aggregate the
    // (source, token) census; its exchange must materialize once
    val df = SparkEntry.queries("source_kl")(spark, sf0001)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "(source, token) census exchange must be shared across totals")
  }

  test("lm perplexity: LM table, history counts and V reuse the one tokenize pass") {
    // the (doc, bigram) count aggregate is referenced by the scoring
    // join AND (via the bigram census) by hist and V — the corpus must
    // be tokenized once, every derived frame reading the materialized
    // exchange
    val df = SparkEntry.queries("lm_perplexity")(spark, sf0001)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "(doc, bigram) aggregate exchange must be shared across LM frames")
  }

  test("dsir: raw census and doc weights share the (doc, bucket) aggregate") {
    // tf is referenced by the scoring join AND by the raw bucket census;
    // the corpus must be tokenized+hashed once, and the log-ratio table
    // must reach the scoring join as a broadcast, never a shuffle
    val df = SparkEntry.queries("dsir_weights")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      "(doc, bucket) tf exchange must be shared")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "log-ratio table must broadcast to the scoring join")
  }

  test("daily-bar family: tick-sized work is ONE sort-free hash aggregate") {
    Seq("stochastic_k", "money_flow_index", "chaikin_ad").foreach { q =>
      val p = planOf(q)
      // the daily high/low/close/volume extraction is min_by/max_by in a
      // hash aggregate — a row_number formulation would plan a
      // WindowGroupLimit + data-sized sort before the aggregate
      assert(!p.contains("WindowGroupLimit"),
        s"$q extracts daily bars via row_number, not max_by:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
        s"$q shuffles more than agg + daily-relation window:\n$p")
    }
  }

  test("market aggregates keep ONE data-sized shuffle") {
    // vwap/hourly/volume profile: scan → partial agg → single exchange →
    // final agg (+ the output sort's range exchange, which is rows-bounded)
    Seq("vwap_hourly", "hourly_seasonality", "volume_profile").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
        s"$q shuffles more than once:\n$p")
    }
  }

  test("vol_signature fans the frequency list out of ONE tick scan") {
    val p = SparkEntry.queries("vol_signature")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(p.split("Relation \\[").length - 1 == 1,
      s"vol_signature scans events more than once:\n$p")
  }

  test("vpin_buckets rides ONE per-instrument sort for both running windows") {
    val p = SparkEntry.queries("vpin_buckets")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one data-sized hash exchange (instrument) feeds the shared sort;
    // the final orderBy adds only a rows-bounded range exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"vpin_buckets shuffles more than once:\n$p")
    // the data-sized (instrument, tick-order) sort appears ONCE — the
    // second Window rides it; the output orderBy is a separate
    // rows-bounded range sort and doesn't count
    assert("Sort \\[event_type[^\\]]*ts_ns".r.findAllIn(p).length == 1,
      s"vpin_buckets re-sorts the ticks per window:\n$p")
  }

  test("bigram_pmi cuts to k via TakeOrderedAndProject, no global sort") {
    val p = SparkEntry.queries("bigram_pmi")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"bigram_pmi sorts the whole PMI relation:\n$p")
  }

  test("shard_balance / k_anonymity: one scan, one aggregate, no join") {
    Seq("shard_balance", "k_anonymity").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      assert(p.contains("HashAggregate"), s"$q lost its hash aggregate:\n$p")
    }
  }

  test("funnel_window: every step is union+window — no join operator anywhere") {
    // each as-of step is a union + ordered window; a per-user quadratic
    // self-join sneaking in would show as a Join node
    val p = SparkEntry.queries("funnel_window")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"funnel_window grew a join:\n$p")
  }

  test("max_concurrency / order_backlog: sweeps stay equi/broadcast-joined, never nested-loop") {
    Seq("max_concurrency", "order_backlog").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q fell into a nested loop:\n$p")
    }
  }

  test("rnn_pairs_exact: reciprocity join is hash-equi over the checkpointed kNN relation") {
    // the all-pairs scorer runs once (eagerly) into the localCheckpoint;
    // the FINAL plan must join that ≤ N·k relation to its transpose with
    // an equi join — never a nested loop over the corpus again
    val p = graft.operators.Similarity
      .mutualKnnExact(Tables.embeddings(spark, sf0001), k = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"rnn_pairs_exact re-derives pairs with a nested loop:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"rnn_pairs_exact reciprocity join is not equi-keyed:\n$p")
  }

  test("against-family self-exclusion is a broadcast anti-join on batch ids") {
    // the replay-invariance cut (r14): index rows under the probing
    // batch's own ids anti-join out of the candidate set; the batch id
    // relation must BROADCAST (candidates are batch-bounded — a
    // shuffled anti-join here would key a corpus-scale exchange on the
    // batch), and the canonicalization/URL blocklist gate carries the
    // same shape
    Seq("dedup_against", "semantic_dedup_against", "chunk_dedup_against",
        "host_blocklist_filter").foreach { q =>
      val p = planOf(q)
      assert(p.contains("LeftAnti"), s"$q lost its anti-join:\n$p")
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$q anti-join side is not broadcast:\n$p")
    }
  }

  test("rnn_pairs DEFAULT plans no corpus-squared join anywhere") {
    // the registered default must be the bounded LSH retriever: no
    // CartesianProduct, no BroadcastNestedLoopJoin in the whole plan
    val p = graft.operators.Similarity
      .mutualKnn(Tables.embeddings(spark, sf0001), k = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"default rnn_pairs is not the bounded retriever:\n$p")
  }
}
