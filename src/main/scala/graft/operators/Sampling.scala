package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling for training-data pipelines — the two
 * selection shapes a 100 TB curation run actually needs:
 *
 *  - hash-mod sampling: a reproducible "random" subset. Keyed on a
 *    portable content hash, so the SAME rows are selected on every run,
 *    every engine, every partitioning — re-runnable experiments and an
 *    exact SQL oracle. Map-side (a filter on a scan projection): no
 *    shuffle, scales linearly.
 *  - per-source quotas: cap each source's contribution (source balancing).
 *    One shuffle keyed by source. A single mega-source is the skew risk;
 *    at 100 TB pre-aggregate per-source counts first and only window the
 *    sources over quota (the common case passes through map-side).
 */
object Sampling {

  /** Keep rows whose portable key hash lands below `permille`/1000 —
    * an exact, engine-reproducible ~permille‰ sample. */
  def hashSample(documents: DataFrame, keyCol: String = "doc_id",
      permille: Int = 100): DataFrame = {
    import graft.functions.PortableHash.h60
    documents
      .filter(pmod(h60(col(keyCol).cast("string")), lit(1000L)) < permille)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** WEIGHTED priority sampling (Duffield–Thorup "priority sampling"):
    * each row gets priority = hash/weight and the k smallest priorities
    * win, so P(selected) grows with weight — longer documents (more
    * tokens) are proportionally likelier to be kept, the "sample by token
    * mass, not by document count" selection a pretraining mix wants.
    *
    * The classic scheme draws u ~ U(0,1] and keeps the k largest w/u;
    * here u is replaced by the portable h60 content hash (deterministic,
    * engine-reproducible) and the comparison inverted to h60 div w with
    * INTEGER division — no doubles anywhere, so the selected set is
    * bit-identical in the DuckDB oracle (a float pow/log formulation
    * differs in ulps across libm implementations and a boundary ulp flips
    * a selection). Ties (same quotient) break by doc_id: total order,
    * exact top-k.
    *
    * Scale shape: priority is a scan projection (map-side, no shuffle);
    * the k smallest ride a TakeOrderedAndProject (per-partition bounded
    * heaps → driver merge of k×partitions rows), never a global sort.
    * 100 TB: identical plan — the only cross-node traffic is k rows per
    * partition. */
  def prioritySample(documents: DataFrame, k: Int = 100,
      weightCol: String = "n_chars"): DataFrame = {
    import graft.functions.PortableHash.h60
    documents
      // guard degenerate weights: w ≤ 0 would divide-by-zero or flip sign;
      // such rows get +∞-equivalent priority via a NULL filter (none exist
      // in the corpus; the guard is for API safety)
      .filter(col(weightCol) > 0)
      .withColumn("__h", h60(col("doc_id").cast("string")))
      // `div` = INTEGER division (repo convention): h60 spans 60 bits, a
      // double quotient loses bits past the 53-bit mantissa and floor()
      // of it can land on the wrong side of a selection boundary
      .withColumn("priority", expr(s"__h div $weightCol"))
      .select(col("doc_id"), col("source"), col(weightCol), col("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** Temperature-based source MIXING — the data-mixing operator of a
    * pretraining run: per-source keep-targets ∝ √count (the α = 0.5
    * temperature that up-weights small, curated sources against the web
    * crawl), normalized to a total `budget`. Selection within a source is
    * by portable-hash order (h60), so the chosen subset is deterministic
    * and engine-reproducible.
    *
    * All target arithmetic is INTEGER-exact (isqrt weights, integer
    * floor-division, largest-remainder on integer remainders, ties by
    * source name): a float formulation (pow / a distributed double sum)
    * is not bit-portable across engines or even across runs — combine
    * order varies — and one ulp at a floor() boundary flips a target.
    * Largest-remainder also makes Σ targets == budget EXACTLY; per-source
    * rounding can drift the total by one per source.
    *
    * √-upweighting can hand a tiny source a target LARGER than its row
    * count; a naive `pick_rank <= target` then silently returns fewer than
    * `budget` rows. Targets therefore allocate by WATERFALL: any source
    * whose share exceeds its capacity is capped at n_docs and the surplus
    * re-allocated over the uncapped pool by the same weights + largest
    * remainder, repeating until every target fits (≤ #sources rounds, on
    * driver-sized data). Σ targets == min(budget, Σ n_docs) EXACTLY. The
    * registered query's oracle mirrors the non-saturating path (its data
    * cannot saturate); the saturating path is property-tested against a
    * scalar reference in SamplingSpec.
    *
    * Shape at 100 TB: the per-source count aggregate is map-side combined
    * and its result is driver-sized by definition (sources number in the
    * hundreds — same contract as the IVF centroid table), so targets
    * compute on the driver and broadcast back. The per-source pick rank
    * comes from [[graft.operators.Ranks.withRankStats]]' source-grouped
    * cell-partitioned closed form — a mega-source is a data-sized group,
    * so a plain source-keyed rank window would funnel it through one
    * task; the hash-valued primary spreads uniformly over the cells, so
    * every ranking task holds ~n/4096 rows regardless of source skew. */
  def temperatureMix(documents: DataFrame, budget: Long = 200): DataFrame = {
    import graft.functions.PortableHash.h60
    import documents.sparkSession.implicits._
    val counts = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    def isqrt(n: Long): Long = math.sqrt(n.toDouble).toLong
    // one largest-remainder share of `b` over `pool` (source, n_docs,
    // weight); w·b through BigInt — at 1e12-doc budgets the Long product
    // sits one decade from wrapping, and driver-sized exactness is free
    def allocate(pool: Seq[(String, Long, Long)], b: Long): Map[String, Long] = {
      val wsum = BigInt(pool.map(_._3).sum)
      val base = pool.map { case (s, _, w) =>
        (s, (BigInt(w) * b / wsum).toLong, BigInt(w) * b % wsum) }
      val short = (b - base.map(_._2).sum).toInt
      val plusOne = base.sortBy { case (s, _, rem) => (-rem, s) }
        .take(short).map(_._1).toSet
      base.map { case (s, fl, _) =>
        s -> (fl + (if (plusOne(s)) 1L else 0L))
      }.toMap
    }
    // waterfall: cap saturated sources at capacity, re-share the surplus
    // over the uncapped pool; strictly shrinks the pool, so ≤ #sources
    // rounds. Invariant: remaining ≤ pool capacity (seeded by the min).
    var fixed = Map.empty[String, Long]
    var pool = counts.map { case (s, n) => (s, n, isqrt(n)) }.toSeq
    var remaining = budget min counts.map(_._2).sum
    while (pool.nonEmpty && remaining > 0) {
      val alloc = allocate(pool, remaining)
      val over = pool.filter { case (s, n, _) => alloc(s) > n }
      if (over.isEmpty) { fixed ++= alloc; pool = Nil }
      else {
        fixed ++= over.map { case (s, n, _) => s -> n }
        remaining -= over.map(_._2).sum
        val capped = over.map(_._1).toSet
        pool = pool.filterNot { case (s, _, _) => capped(s) }
      }
    }
    val targets = counts.map { case (s, n) =>
      (s, n, fixed.getOrElse(s, 0L))
    }.toSeq.toDF("source", "n_docs", "target")
    graft.operators.Ranks.withRankStats(
      documents.select(col("doc_id"), col("source")),
      Seq("source"), h60(col("doc_id").cast("string")),
      Seq(col("doc_id")), "pick_rank", "__n")
      .drop("__n")
      .join(broadcast(targets.select(col("source"), col("target"))), Seq("source"))
      .filter(col("pick_rank") <= col("target"))
      .select(col("doc_id"), col("source"), col("pick_rank"), col("target"))
      .orderBy(col("doc_id"))
  }

  /** STRATIFIED hash-mod sampling: a different keep-rate per stratum —
    * the language/source-rebalancing cousin of [[hashSample]] (e.g. keep
    * all of a rare language, 10% of the dominant one). Same portable-hash
    * selection, so the subset is reproducible on any engine or
    * partitioning; the rate lookup is a literal CASE over the stratum
    * column (strata number in the tens/hundreds — driver-sized, like the
    * temperatureMix targets), so the whole operator stays a map-side
    * filter on the scan: no shuffle, no join, linear at 100 TB. */
  def stratifiedSample(documents: DataFrame, stratumCol: String = "lang",
      permille: Map[String, Int] = Map("en" -> 100, "de" -> 500),
      defaultPermille: Int = 0): DataFrame = {
    import graft.functions.PortableHash.h60
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (els, (k, p)) => when(col(stratumCol) === k, lit(p)).otherwise(els)
    }
    documents
      .filter(pmod(h60(col("doc_id").cast("string")), lit(1000L)) < rate)
      .select(col("doc_id"), col(stratumCol).as("stratum"))
      .orderBy(col("doc_id"))
  }

  /** Keep at most `quota` documents per source, by ascending doc_id
    * (deterministic; swap the ordering column for a quality score to keep
    * the best instead of the first). */
  def sourceQuota(documents: DataFrame, quota: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        row_number().over(w).as("rank_in_source"))
      .filter(col("rank_in_source") <= quota)
      .orderBy(col("doc_id"))
  }

  /** Pack documents into fixed token-budget training sequences by
    * token-offset chunking: within a hash-shard, documents are laid out in
    * doc_id order and each is assigned to sequence floor(tokens_before /
    * budget) — the standard corpus-sharding layout for pretraining runs.
    *
    * Shard-parallel by construction: documents lay out in doc_id order
    * within `shard = h60(doc_id) mod nShards`. nShards is a SEMANTIC
    * knob (it changes the assignment), so it cannot double as the
    * parallelism escape hatch — the shard-local exclusive cumsum instead
    * comes from [[graft.operators.Ranks.withPrefixSum]]'s two-phase
    * closed form (per-(shard, cell) sums cumulated over the bounded
    * histogram + a within-cell running sum), identical values with no
    * corpus/nShards-row window task anywhere. Fully deterministic and
    * engine-portable, so the DuckDB oracle reproduces every assignment.
    * Token count here is the whitespace-token proxy from
    * `n_chars`-bearing sources; swap in a real tokenizer count column
    * without touching the layout logic. */
  /** Map-side packing metadata: (doc_id, shard, n_tokens) — the ONLY
    * part of the layout that reads text. Public so the streaming ledger
    * ([[graft.streaming.StreamPack]]) can fold exactly this projection
    * per micro-batch and share the layout code below by construction. */
  def packMeta(documents: DataFrame, nShards: Int = 8): DataFrame = {
    import graft.functions.PortableHash.h60
    import graft.functions.TokenProfile
    import graft.functions.TextOps.normalize
    documents.select(col("doc_id"),
      pmod(h60(col("doc_id").cast("string")), lit(nShards.toLong)).as("shard"),
      TokenProfile.token_profile(normalize(col("text")))
        .getField("n_tok").cast("long").as("n_tokens"))
  }

  /** Shard-local token layout over the metadata relation: adds
    * `tokens_before` via the closed-form prefix sum. */
  def layoutFromMeta(meta: DataFrame): DataFrame =
    graft.operators.Ranks.withPrefixSum(meta,
      Seq("shard"), col("doc_id"), Nil, col("n_tokens"), "tokens_before")

  /** Shard-local token layout: (doc_id, shard, n_tokens, tokens_before) —
    * the shared cumulative layer under both packing shapes. */
  private def tokenLayout(documents: DataFrame, nShards: Int) =
    layoutFromMeta(packMeta(documents, nShards))

  /** seq_id = (shard << 40) + shard-local sequence index: 2⁴⁰ sequences of
    * headroom per shard (≈5.6×10¹⁴ tokens at the default budget) before ids
    * could collide across shards — a plain `shard * 10⁶` offset overflows
    * into the neighbor shard's id space at ~512M tokens/shard, far below
    * the 100 TB contract. */
  private def seqId(seqIdx: Column): Column =
    shiftleft(col("shard"), 40) + seqIdx

  def packSequences(documents: DataFrame, budgetTokens: Long = 512,
      nShards: Int = 8): DataFrame =
    packSequencesFromMeta(packMeta(documents, nShards), budgetTokens)

  /** The sequence-assignment arithmetic over a (doc_id, shard, n_tokens)
    * metadata relation — shared verbatim by the batch operator and the
    * streaming ledger, so streamed ≡ batch by construction. */
  def packSequencesFromMeta(meta: DataFrame,
      budgetTokens: Long = 512): DataFrame =
    packSequencesFromLayout(layoutFromMeta(meta), budgetTokens)

  /** The readout half over an already-cumulated layout relation
    * (doc_id, shard, n_tokens, tokens_before) — map-side arithmetic
    * only, so the pack family's gated queries can share ONE memoized
    * layout (registry.Memo.packLayoutFor) instead of each re-running
    * the tokenize + prefix-sum prefix. */
  def packSequencesFromLayout(layout: DataFrame,
      budgetTokens: Long = 512): DataFrame =
    layout
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        seqId(floor(col("tokens_before") / budgetTokens).cast("long"))
          .as("seq_id"),
        (col("tokens_before") % budgetTokens).as("offset_in_seq"))
      .orderBy(col("doc_id"))

  /** Sequence-boundary SPANS: real pretraining packing splits a document
    * across the sequences it straddles instead of letting sequences run
    * ragged. A doc occupying shard-token interval
    * [tokens_before, tokens_before + n_tokens) contributes one row per
    * overlapped budget window: (doc_id, seq_id, start_tok, end_tok) with
    * doc-relative token offsets (end exclusive), so
    * Σ (end_tok - start_tok) = n_tokens and every sequence except each
    * shard's last is exactly `budgetTokens` full. Pure arithmetic over the
    * same shard-parallel cumsum — the explode fan-out is
    * ceil(n_tokens/budget) rows per doc, map-side after the one window
    * shuffle. Empty docs (0 tokens) occupy no span. */
  def packSequenceSpans(documents: DataFrame, budgetTokens: Long = 512,
      nShards: Int = 8): DataFrame =
    packSequenceSpansFromLayout(tokenLayout(documents, nShards), budgetTokens)

  /** Span readout over an already-cumulated layout relation — the
    * [[packSequencesFromLayout]] sibling for the straddle-splitting
    * shape (explode + span arithmetic, map-side after the layout). */
  def packSequenceSpansFromLayout(layout: DataFrame,
      budgetTokens: Long = 512): DataFrame =
    layout
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tokens_before"),
        explode(sequence(
          floor(col("tokens_before") / budgetTokens).cast("long"),
          floor((col("tokens_before") + col("n_tokens") - 1) / budgetTokens)
            .cast("long"))).as("s"))
      .select(col("doc_id"), seqId(col("s")).as("seq_id"),
        greatest(lit(0L), col("s") * budgetTokens - col("tokens_before"))
          .as("start_tok"),
        least(col("n_tokens"),
          (col("s") + 1) * budgetTokens - col("tokens_before")).as("end_tok"))
      .orderBy(col("doc_id"), col("seq_id"))

  /** DETERMINISTIC TRAINING-ORDER SHUFFLE — the reproducible-training
    * read the packing family stops just short of: every packed
    * sequence ([[packSequences]]) gets its epoch-`e` position from the
    * portable h60 of (seed, epoch, seq_id) — any engine, any
    * partitioning, any rerun produces the SAME order, which is what
    * makes a training run replayable mid-epoch and auditable after the
    * fact (the fixed-seed shuffle every serious pretraining loop pins;
    * a per-epoch reshuffle falls out of the epoch term in the key).
    * Output: (epoch, pos, seq_id) for epochs 0..`epochs`−1, pos
    * 1-based within epoch, ties (h60 collisions) to the smallest
    * seq_id.
    *
    * Scale shape: one map-side projection (distinct seq_ids × epochs
    * rows, each keyed by a codegen'd md5 fold) feeding the closed-form
    * distributed rank ([[graft.operators.Ranks.withRankStats]] — cell
    * histogram + within-cell ranks, no epoch-sized window task
    * anywhere), so the order materializes shard-parallel at any corpus
    * size. The oracle replays the identical md5-derived keys and
    * ranks. */
  def epochOrder(documents: DataFrame, epochs: Int = 3, seed: Long = 42L,
      budgetTokens: Long = 512, nShards: Int = 8): DataFrame =
    epochOrderFromLayout(tokenLayout(documents, nShards), epochs, seed,
      budgetTokens)

  /** [[epochOrder]] over an already-cumulated layout relation — the
    * pack family's third consumer of the shared memoized layout. */
  def epochOrderFromLayout(layout: DataFrame, epochs: Int = 3,
      seed: Long = 42L, budgetTokens: Long = 512): DataFrame = {
    import graft.functions.PortableHash.h60
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val seqs = packSequencesFromLayout(layout, budgetTokens)
      .select(col("seq_id")).distinct()
    val keyed = seqs
      .select(col("seq_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .select(col("epoch").cast("long").as("epoch"), col("seq_id"),
        h60(concat_ws(":", lit(seed), col("epoch"), col("seq_id")))
          .as("k"))
    graft.operators.Ranks.withRankStats(keyed, Seq("epoch"), col("k"),
        Seq(col("seq_id")), "pos", "__n")
      .select(col("epoch"), col("pos"), col("seq_id"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** MIXTURE READ ORDER — [[epochAllocate]]'s plan made EXECUTABLE:
    * the char-level allocation realizes at document granularity (each
    * doc of source s repeats floor(epochs) times, plus one extra copy
    * for the first frac(epochs)·n_docs docs under the h60 priority
    * order — the deterministic doc-level rendering of a fractional
    * epoch), and every (doc, copy) pair then takes its global training
    * position from the portable h60 of (seed, doc_id, copy) — the
    * [[epochOrder]] shuffle applied to the weighted multiset. The
    * output IS the order a data-constrained training run reads:
    * upweighted sources appear more often, dropped sources vanish, and
    * any engine/partitioning/rerun produces the identical stream.
    *
    * Integer contract: copies come from epochs_micro alone
    * (floor = div 10⁶; the extra-copy quota is the exact
    * frac_micro·n_docs div 10⁶), so the realized char mass tracks the
    * allocation in expectation under the priority order without any
    * float. Scale shape: the allocator is driver-side
    * (source-cardinality); doc ranks and the global position both ride
    * the closed-form distributed rank — no global sort task; the
    * explode fans ≤ maxEpochs rows per doc. */
  def mixOrder(documents: DataFrame, budgetChars: Long = 280000L,
      maxEpochs: Int = 2, seed: Long = 42L,
      allocIn: Option[DataFrame] = None): DataFrame = {
    import graft.functions.PortableHash.h60
    // `allocIn` (if supplied) must be epochAllocate's result relation at
    // the SAME (budgetChars, maxEpochs) — the gated query injects the
    // memoized allocation shared with `epoch_allocate` (driver-sized)
    val alloc = allocIn
      .getOrElse(epochAllocate(documents, budgetChars, maxEpochs))
      .select(col("source"), col("n_docs"), col("epochs_micro"))
    val ranked = graft.operators.Ranks.withRankStats(
      documents.select(col("doc_id"), col("source"),
        h60(col("doc_id").cast("string")).as("pr")),
      Seq("source"), col("pr"), Seq(col("doc_id")), "dr", "__n")
    val copies = ranked.join(broadcast(alloc), Seq("source"))
      .select(col("doc_id"),
        (expr("epochs_micro div 1000000") +
          when(col("dr") <=
            expr("(epochs_micro % 1000000) * n_docs div 1000000"), 1L)
            .otherwise(0L)).as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
    val keyed = copies.select(col("doc_id"), col("copy_idx"),
      h60(concat_ws(":", lit(seed), col("doc_id"), col("copy_idx")))
        .as("k"))
    graft.operators.Ranks.withRankStats(keyed, Nil, col("k"),
        Seq(col("doc_id"), col("copy_idx")), "pos", "__n")
      .select(col("pos"), col("doc_id"), col("copy_idx"))
      .orderBy(col("pos"))
  }

  /** Deterministic shard assignment + balance audit — the write-path
    * planning read before materializing training shards: every doc maps
    * to shard = h60(doc_id) mod `nShards` (the same portable hash as
    * [[hashSample]], so the layout is reproducible on any engine and
    * stable across reruns — no round-robin, no RNG), and the report is
    * one row per shard with its doc count, character mass, and id range.
    * A skewed `chars` column here means skewed training files; the fix
    * is more shards or a composite key, both re-auditable with this same
    * query. Map-side hash + one shard-cardinality aggregate — nothing
    * data-sized crosses the shuffle at any corpus scale. */
  /** Re-shard MOVEMENT audit — the ops read before growing a sharded
    * corpus store ([[shardBalance]]'s fix is "more shards"; this one
    * prices that fix): for a shard-count change old → new, the doc
    * mass that must physically move under (a) hash-MOD placement and
    * (b) RENDEZVOUS (highest-random-weight, Thaler–Ravishankar 1996)
    * placement, where each doc lands on argmax_s h(doc:s). Mod
    * re-shards nearly everything (only keys with h mod lcm aligned
    * stay — 20% for 16→20); rendezvous moves EXACTLY the docs whose
    * extended argmax lands on a new shard (≈ (new−old)/new, the
    * minimal-movement optimum) and — the defining property — never
    * moves a doc between two OLD shards, because adding candidates
    * cannot change the winner among the old ones.
    *
    * Both placements are pure map-side expressions over the portable
    * hash (the rendezvous weights are `new` md5s per doc inside one
    * codegen'd array transform); the only shuffle is the 1-row
    * aggregate. Output: one row per scheme with moved counts and the
    * integral micro fraction. */
  def reshardPlan(documents: DataFrame, oldShards: Int = 16,
      newShards: Int = 20): DataFrame = {
    import graft.functions.PortableHash.h60
    require(oldShards > 0 && newShards > oldShards,
      s"need newShards > oldShards > 0, got $oldShards -> $newShards")
    val h = h60(col("doc_id").cast("string"))
    val w = transform(sequence(lit(0), lit(newShards - 1)),
      s => h60(concat(col("doc_id").cast("string"), lit(":"),
        s.cast("string"))))
    documents
      .select(h.as("h"), w.as("w"))
      .select(
        (pmod(col("h"), lit(oldShards.toLong)) =!=
          pmod(col("h"), lit(newShards.toLong))).as("mod_moved"),
        (array_position(col("w"), array_max(col("w"))) >
          lit(oldShards.toLong)).as("rdv_moved"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("mod_moved"), 1L).otherwise(0L)).as("mod_n"),
        sum(when(col("rdv_moved"), 1L).otherwise(0L)).as("rdv_n"))
      .select(explode(array(
        struct(lit("mod").as("scheme"), col("n_docs"),
          col("mod_n").as("n_moved")),
        struct(lit("rendezvous").as("scheme"), col("n_docs"),
          col("rdv_n").as("n_moved")))).as("r"))
      .select(col("r.scheme").as("scheme"), col("r.n_docs").as("n_docs"),
        col("r.n_moved").as("n_moved"),
        // empty-corpus guard: the summary rows still emit, micro = NULL
        expr("CAST(CASE WHEN r.n_docs > 0 THEN r.n_moved * 1000000" +
          " div r.n_docs END AS BIGINT)").as("moved_micro"))
      .orderBy(col("scheme"))
  }

  def shardBalance(documents: DataFrame, nShards: Int = 16): DataFrame = {
    import graft.functions.PortableHash.h60
    documents
      .select(col("doc_id"), col("n_chars"),
        pmod(h60(col("doc_id").cast("string")), lit(nShards.toLong))
          .as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  /** Reproducible-export SHARD MANIFEST — the receipt a training run
    * records next to every exported shard so a re-export (or a consumer
    * on another engine) can prove it reads the same bytes: per shard,
    * the doc count, character mass, id range, and an ORDER-INDEPENDENT
    * content fingerprint — XOR of a per-doc portable hash over
    * (doc_id, md5(text)). XOR is the right combine for a distributed
    * writer: commutative/associative (any partitioning, any task order,
    * same value — a SUM of 60-bit hashes would overflow BIGINT at
    * corpus scale), sensitive to any single-doc change, and cheap to
    * maintain incrementally (XOR the delta's hashes in). The id pair in
    * the per-doc hash makes doc-content SWAPS visible (two docs
    * exchanging texts preserves the bag of content hashes but not the
    * (id, content) pairs). One map-side projection + one shard-keyed
    * aggregate: linear, skew-free (hash-mod sharding), no second scan.
    * Same portable md5-derived h60 as every sketch here, so the DuckDB
    * oracle rebuilds the manifest bit-for-bit. */
  def shardManifest(documents: DataFrame, nShards: Int = 16): DataFrame = {
    import graft.functions.PortableHash.h60
    documents
      .select(col("doc_id"), col("n_chars"),
        pmod(h60(col("doc_id").cast("string")), lit(nShards.toLong))
          .as("shard"),
        h60(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))).as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr("bit_xor(fp)").as("fingerprint"))
      .orderBy(col("shard"))
  }

  /** MANIFEST DIFF — which export shards need re-writing: compares the
    * [[shardManifest]] of two corpus states (previous export vs current,
    * or corpus vs a curated view) shard-by-shard and flags every shard
    * whose content fingerprint differs. This is the incremental-export
    * planner: after a delete/curation pass touching 0.1% of docs, only
    * the shards whose XOR fingerprint moved are re-written — the other
    * 99%+ of export files are provably byte-identical (the manifest IS
    * the proof, doc-swap-sensitive per [[shardManifest]]). Null-safe
    * full outer join on the shard-cardinality manifests — metadata
    * arithmetic; the corpora are each scanned once by their own
    * manifest aggregate and never joined row-to-row. */
  def manifestDiff(oldDocs: DataFrame, newDocs: DataFrame,
      nShards: Int = 16): DataFrame = {
    val o = shardManifest(oldDocs, nShards)
      .select(col("shard"), col("n_docs").as("old_docs"),
        col("chars").as("old_chars"), col("fingerprint").as("old_fp"))
    val n = shardManifest(newDocs, nShards)
      .select(col("shard"), col("n_docs").as("new_docs"),
        col("chars").as("new_chars"), col("fingerprint").as("new_fp"))
    o.join(n, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("old_docs"), lit(0L)).as("old_docs"),
        coalesce(col("new_docs"), lit(0L)).as("new_docs"),
        (coalesce(col("new_docs"), lit(0L)) -
          coalesce(col("old_docs"), lit(0L))).as("docs_delta"),
        (coalesce(col("new_chars"), lit(0L)) -
          coalesce(col("old_chars"), lit(0L))).as("chars_delta"),
        (!(col("old_fp") <=> col("new_fp"))).as("changed"))
      .orderBy(col("shard"))
  }

  /** DATA-CONSTRAINED EPOCH ALLOCATION (the Muennighoff et al. 2023
    * "scaling data-constrained language models" planning step): split a
    * total training-character budget across sources when repeating a
    * source past a few epochs stops helping — each source contributes at
    * most `maxEpochs × its corpus mass`, small sources are upweighted by
    * the same isqrt temperature as [[temperatureMix]], and the plan
    * reports per-source allocated mass and the implied epoch count.
    *
    * Exact integer spec (mirrored by the oracle):
    *   1. B = min(budget, Σ capacity) with capacity = maxEpochs × chars;
    *   2. round 1: largest-remainder share of B by isqrt(chars) weight
    *      (ties by source) over ALL sources;
    *   3. sources allocated past capacity are CLAMPED to it; their
    *      surplus is re-shared once, largest-remainder by weight over
    *      the unsaturated pool, again clamped. ONE redistribution round
    *      (not the full waterfall): the spec stays portable SQL, and the
    *      residual a second overshoot would strand is derivable as
    *      B − Σ alloc_chars (zero unless the pool is near-saturated).
    *   4. epochs_micro = alloc × 10⁶ div chars — the per-source repeat
    *      factor on the micro grid.
    *
    * Scale shape: one map-combined per-source aggregate over the corpus;
    * the allocation itself runs on the driver over the source-cardinality
    * relation (tens/hundreds — the temperatureMix/IVF-centroid
    * contract) and returns as a broadcastable plan table. */
  def epochAllocate(documents: DataFrame, budgetChars: Long = 280000L,
      maxEpochs: Int = 2): DataFrame = {
    import documents.sparkSession.implicits._
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val countsDf = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("chars"))
    graft.plans.PlanTrace.record("epoch_counts",
      graft.plans.PlanFingerprint.structSha(countsDf))
    val counts = countsDf
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val alloc = allocateByMass(
      counts.map { case (s, _, c) => (s, c) }, budgetChars, maxEpochs)
    counts.toSeq.map { case (s, n, c) =>
      (s, n, c, maxEpochs * c, alloc(s),
        if (c > 0) alloc(s) * 1000000L / c else 0L)
    }.toDF("source", "n_docs", "chars", "capacity", "alloc_chars",
      "epochs_micro")
      .orderBy(col("source"))
  }

  /** The two-round largest-remainder allocator over (source, pricing
    * mass) — the driver-side core [[epochAllocate]] and
    * [[epochAllocateDedup]] share: capacity = maxEpochs × mass, isqrt
    * temperature weights, one clamped redistribution round (the
    * documented spec; see epochAllocate's scaladoc for the integer
    * contract both SQL mirrors replay). */
  private def allocateByMass(masses: Seq[(String, Long)],
      budgetChars: Long, maxEpochs: Int): Map[String, Long] = {
    def isqrt(n: Long): Long = math.sqrt(n.toDouble).toLong
    // one largest-remainder share of `b` over (source, weight) — the
    // temperatureMix allocator, with the w·b products through BigInt:
    // at full scale (chars ~1e18 ⇒ weights ~1e9, budgets ~1e18) the
    // Long product wraps silently and mis-allocates. Driver-sized
    // arithmetic, so exact BigInt costs nothing. NOTE: the registered
    // queries' SQL mirrors compute the same products in BIGINT and hold
    // for wt·B < 2^63 — beyond that DuckDB raises (loud, not wrong).
    def share(pool: Seq[(String, Long)], b: Long): Map[String, Long] = {
      val wsum = BigInt(pool.map(_._2).sum)
      if (wsum == 0 || b <= 0L) return pool.map(_._1 -> 0L).toMap
      val base = pool.map { case (s, w) =>
        (s, (BigInt(w) * b / wsum).toLong, BigInt(w) * b % wsum) }
      val shortBy = (b - base.map(_._2).sum).toInt
      val plusOne = base.sortBy { case (s, _, rem) => (-rem, s) }
        .take(shortBy).map(_._1).toSet
      base.map { case (s, fl, _) =>
        s -> (fl + (if (plusOne(s)) 1L else 0L))
      }.toMap
    }
    val cap = masses.map { case (s, c) => s -> maxEpochs * c }.toMap
    val w = masses.map { case (s, c) => (s, isqrt(c)) }
    val b = budgetChars min cap.values.sum
    val r1 = share(w, b)
    val sat = masses.map(_._1).filter(s => r1(s) > cap(s)).toSet
    val surplus = sat.toSeq.map(s => r1(s) - cap(s)).sum
    val r2 = share(w.filterNot { case (s, _) => sat(s) }, surplus)
    masses.map { case (s, _) =>
      s -> (if (sat(s)) cap(s)
            else (r1(s) + r2.getOrElse(s, 0L)) min cap(s))
    }.toMap
  }

  /** DEDUP-ADJUSTED epoch allocation — [[epochAllocate]] pricing UNIQUE
    * characters per source instead of raw ones: a boilerplate-heavy
    * feed's repeated mass is not new training signal, so a
    * data-constrained plan that budgets by raw chars over-allocates
    * exactly the sources dedup will later gut. A doc's mass counts as
    * unique when it is not in any near-dup group, or is its group's
    * KEEPER (rep_id = doc_id — the min-label election of
    * [[Dedup.dedupGroups]]'s membership relation, passed in so the
    * memoized LSH+CC prefix is shared, never re-run). Capacity,
    * weights, budget clamp and epoch factor all run on unique mass;
    * raw `chars` rides along so the report shows what the adjustment
    * changed.
    *
    * Scale shape: one doc_id-keyed left join of the vanishing
    * group-members relation into the corpus scan, one map-combined
    * per-source aggregate, then the driver-side source-cardinality
    * allocator — identical cost to [[epochAllocate]] plus the
    * broadcastable membership join. */
  def epochAllocateDedup(documents: DataFrame, groups: DataFrame,
      budgetChars: Long = 280000L, maxEpochs: Int = 2): DataFrame = {
    import documents.sparkSession.implicits._
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val uniq = col("rep_id").isNull || col("rep_id") === col("doc_id")
    val countsDf = documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(groups.select(col("doc_id"), col("rep_id")),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("chars"),
        sum(when(uniq, coalesce(col("n_chars"), lit(0L))).otherwise(0L))
          .cast("long").as("unique_chars"))
    graft.plans.PlanTrace.record("epoch_dedup_counts",
      graft.plans.PlanFingerprint.structSha(countsDf))
    val counts = countsDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val alloc = allocateByMass(
      counts.map { case (s, _, _, u) => (s, u) }, budgetChars, maxEpochs)
    counts.toSeq.map { case (s, n, c, u) =>
      (s, n, c, u, maxEpochs * u, alloc(s),
        if (u > 0) alloc(s) * 1000000L / u else 0L)
    }.toDF("source", "n_docs", "chars", "unique_chars", "capacity",
      "alloc_chars", "epochs_micro")
      .orderBy(col("source"))
  }
}
