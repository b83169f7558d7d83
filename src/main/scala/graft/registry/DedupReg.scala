package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Dedup family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object DedupReg {
  // ── Dedup family (training-data pipeline) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    // the candidate-join family fans out from one shingled prefix
    // (postingsFor), jaccard + containment additionally from one
    // overlap generator (overlapFor)
    "ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairsFrom(overlapFor(s, dir), threshold = 0.8)),
    "tf_cosine_pairs" -> ((s, dir) => Dedup.tfCosinePairs(
      Tables.documents(s, dir), shingleTfIn = Some(shingleTfFor(s, dir)))),
    "tfidf_cosine_pairs" -> ((s, dir) => Dedup.tfidfCosinePairs(
      Tables.documents(s, dir), shingleTfIn = Some(shingleTfFor(s, dir)))),
    "minhash_lsh_pairs" -> ((s, dir) => Dedup.minhashVerifyFrom(
      lshCandidatesFor(s, dir), postingsFor(s, dir), threshold = 0.8)),
    // fuzzy chunk-level dedup: near-dup PARAGRAPHS (lightly edited
    // boilerplate) the digest-exact chunk_dedup cannot see; both
    // consumers share the memoized reps + verified-pairs prefix
    "chunk_minhash_pairs" -> ((s, dir) =>
      Dedup.chunkMinhashDecode(chunkPairsFor(s, dir))),
    "chunk_fuzzy_audit" -> ((s, dir) =>
      Dedup.chunkFuzzyAuditFrom(chunkRepsFor(s, dir),
        chunkPairsFor(s, dir))),
    // chunk-granularity against-check: incoming batch (doc_id ≡ 0
    // mod 5) probes the corpus side's representative-chunk band state —
    // memoized write-time index (chunkIndexFor), so the gate times the
    // batch-proportional probe, not a per-run index rebuild
    "chunk_dedup_against" -> { (s, dir) =>
      val (sigs, posts, hot) = chunkIndexFor(s, dir)
      Dedup.chunkDedupAgainstStore(
        Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(5)) === 0),
        sigs, posts, hot)
    },
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
    // boilerplate census + strip over the block-seeded corpus (8-token
    // blocks barely repeat naturally — max 2 docs share one at sf0.01 —
    // so the GATE prepends two block-ALIGNED 16-token template headers
    // to the doc_id mod-7/mod-11 cohorts, built identically in both
    // engines: the oracle pins nonzero cross-engine census + strip,
    // not vacuous zero parity; the encoding_audit seeding precedent)
    // both boilerplate gates read the MEMOIZED raw block census
    // (Memo.bpCensusFor) — the readout/strip halves are census-sized;
    // only the strip re-explodes blocks (its reassembly needs them)
    "boilerplate_census" -> ((s, dir) =>
      Dedup.boilerplateReadout(bpCensusFor(s, dir))),
    "boilerplate_strip" -> ((s, dir) =>
      Dedup.boilerplateStrip(decorateBoilerplate(Tables.documents(s, dir)),
        Dedup.boilerplateReadout(bpCensusFor(s, dir)))),
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
    // ingest-check twin: per NEW doc (doc_id ≡ 0 mod 5), the spans
    // already covered by the CORPUS split's content — probed from the
    // persisted write-time window-hash census (store.SubstrStore),
    // the same asymmetric contract as dedup_against / semantic checks
    "dup_substrings_against" -> ((s, dir) =>
      Dedup.dupSubstringsAgainst(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0),
        graft.store.SubstrStore.readWindowCensus(s, substrStoreFor(s, dir)))),
    // the APPLY half of the ingest check: admit each NEW doc CLEANED —
    // corpus-covered spans removed via the dupSubstringsApply coverage
    // walk over the same persisted-census probe
    "dup_substrings_against_apply" -> ((s, dir) =>
      Dedup.dupSubstringsAgainstApply(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0),
        graft.store.SubstrStore.readWindowCensus(s, substrStoreFor(s, dir)))),
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
    // ingest planning: estimated NEW distinct-shingle fraction the
    // incoming slice (doc_id ≡ 0 mod 5) adds over the corpus split —
    // KMV union-sample algebra, oracle-exact including sketch error
    "ingest_novelty_kmv" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.ingestNoveltyKmv(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    }
  )

  /** The two seeded template headers — EXACTLY 16 space-separated
    * tokens each (two whole 8-token blocks), PREPENDED so every seeded
    * doc carries them block-ALIGNED (16 ≡ 0 mod 8 also keeps the doc's
    * own blocks intact, just shifted two indices). */
  private[graft] val BpHeader7 =
    "subscribe to our newsletter terms of service apply" +
      " all rights reserved click here to unsubscribe now"
  private[graft] val BpHeader11 =
    "cookie notice this site uses cookies by continuing" +
      " you accept our tracking and analytics cookie policy"

  /** Deterministic boilerplate seeding under the two gates — the
    * [[TextReg.decorateEncoding]] precedent applied to template chrome. */
  private[graft] def decorateBoilerplate(documents: DataFrame): DataFrame =
    documents.withColumn("text", concat(
      when(pmod(col("doc_id"), lit(7)) === 3, lit(BpHeader7 + " "))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 5, lit(BpHeader11 + " "))
        .otherwise(lit("")),
      col("text")))

  /** The seeding CASE as DuckDB SQL — oracle twin of
    * [[decorateBoilerplate]]. */
  private val BpDecorateSql: String =
    s"""CASE WHEN doc_id % 7 = 3 THEN '$BpHeader7 ' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 5 THEN '$BpHeader11 ' ELSE '' END ||
       |    text""".stripMargin

  /** Shared oracle CTE chain: seeded corpus → 8-token blocks (the
    * line_dedup slicing) → per-(source, block) distinct-doc census. */
  private val BpBlocksCtes: String =
    s"""dec AS (
       |  SELECT doc_id, source, $BpDecorateSql AS text FROM documents
       |), toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM dec
       |), blocks AS (
       |  SELECT doc_id, source, i AS block_idx,
       |    array_to_string(t[(i*8+1):(i*8+8)], ' ') AS block
       |  FROM toks, unnest(generate_series(CAST(0 AS BIGINT),
       |    CAST((len(t) + 7) // 8 AS BIGINT) - 1)) AS g(i)
       |), census AS (
       |  SELECT source, block, count(DISTINCT doc_id) AS n_docs
       |  FROM blocks GROUP BY 1, 2
       |)""".stripMargin

  def sql: Map[String, String] = Map(
    // C4/CCNet-style boilerplate census: blocks in ≥ 3 distinct docs of
    // one source (the seeded headers; natural repeats stay under 3)
    "boilerplate_census" ->
      s"""WITH $BpBlocksCtes
         |SELECT source, block, CAST(n_docs AS BIGINT) AS n_docs
         |FROM census WHERE n_docs >= 3
         |ORDER BY source, block""".stripMargin,
    // APPLY half: strip flagged blocks per source, md5 receipt of the
    // ordered reassembly (all-stripped docs hash the empty string)
    "boilerplate_strip" ->
      s"""WITH $BpBlocksCtes, fl AS (
         |  SELECT b.doc_id, b.block_idx, b.block,
         |    (c.block IS NOT NULL) AS is_bp
         |  FROM blocks b LEFT JOIN (
         |    SELECT source, block FROM census WHERE n_docs >= 3) c
         |    ON b.source = c.source AND b.block = c.block
         |)
         |SELECT doc_id, count(*) AS n_blocks,
         |  CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_stripped,
         |  md5(coalesce(string_agg(block, ' ' ORDER BY block_idx)
         |    FILTER (WHERE NOT is_bp), '')) AS clean_md5
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
    // the corpus_overlap_kmv estimator with sides labeled by the
    // ingest split; novelty = batch-only fraction of the union sample
    "ingest_novelty_kmv" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'batch' ELSE 'corpus' END
        |      AS side,
        |    trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents
        |), toks AS (
        |  SELECT side, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), sh AS (
        |  SELECT side, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w)-2),
        |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS shs FROM toks
        |), post AS (
        |  SELECT side, unnest(shs) AS s FROM sh
        |), hashes AS (
        |  SELECT DISTINCT side,
        |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM post
        |), sketch AS (
        |  SELECT side, h FROM (
        |    SELECT side, h, row_number() OVER (
        |      PARTITION BY side ORDER BY h) AS rn FROM hashes) t
        |  WHERE rn <= 128
        |), uni AS (
        |  SELECT h,
        |    max(CASE WHEN side = 'batch' THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN side = 'corpus' THEN 1 ELSE 0 END) AS in_b
        |  FROM sketch GROUP BY 1
        |), ranked AS (
        |  SELECT h, in_a, in_b,
        |    row_number() OVER (ORDER BY h) AS rn FROM uni
        |)
        |SELECT CAST(count(*) AS BIGINT) AS k_used,
        |  CAST(sum(in_a) AS BIGINT) AS n_batch,
        |  CAST(sum(in_b) AS BIGINT) AS n_corpus,
        |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_both,
        |  CASE WHEN CAST(sum(in_a) AS BIGINT) > 0 THEN
        |    CAST((CAST(sum(in_a) AS BIGINT)
        |      - CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
        |          THEN 1 ELSE 0 END) AS BIGINT)) * 1000000
        |      // CAST(sum(in_a) AS BIGINT) AS BIGINT) END
        |    AS novelty_micro,
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
        |        THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |      // CAST(count(*) AS BIGINT) AS BIGINT) END
        |    AS jaccard_micro
        |FROM ranked WHERE rn <= 128""".stripMargin,
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
    // Cross-corpus exact-substring check: same census/hash CTEs, but a
    // batch-side (doc_id % 5 = 0) window start is duplicated iff its
    // hash exists in the CORPUS split's (doc_id % 5 <> 0) distinct-hash
    // census — the persisted SubstrStore state replayed from raw data —
    // then the identical gaps-and-islands span fold.
    "dup_substrings_against" ->
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
        |), corpus AS (
        |  SELECT DISTINCT h FROM hashed WHERE doc_id % 5 <> 0
        |), ds AS (
        |  SELECT doc_id, pos FROM hashed
        |  WHERE doc_id % 5 = 0 AND h IN (SELECT h FROM corpus)
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
    // The against-APPLY: the dup_substrings_against census/corpus/ds
    // CTEs (batch = doc_id % 5 = 0 probing the corpus split's distinct
    // hashes) feeding the dup_substrings_apply coverage-walk tail —
    // every batch token within 20 of the latest corpus-covered start
    // at-or-before it is removed, cleaned text reassembled in token
    // order, per-doc kept/removed tallies
    "dup_substrings_against_apply" ->
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
        |), corpus AS (
        |  SELECT DISTINCT h FROM hashed WHERE doc_id % 5 <> 0
        |), ds AS (
        |  SELECT doc_id, pos FROM hashed
        |  WHERE doc_id % 5 = 0 AND h IN (SELECT h FROM corpus)
        |), tokpos0 AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(w)),
        |    i -> struct_pack(pos := i - 1, tok := w[i])) AS tl
        |  FROM toks WHERE doc_id % 5 = 0
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
        |  SELECT doc_id, len(w) AS n_tokens FROM toks WHERE doc_id % 5 = 0
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
    // Fuzzy chunk-level dedup: the minhash chain at chunk granularity
    // (chunk cut → exact-collapse to representatives → h60 signatures →
    // band collisions → exact-Jaccard verify, df-cut live), decoded to
    // (doc, chunk) coordinates via the shared cid integer arithmetic.
    "chunk_minhash_pairs" ->
      s"""WITH ${Memo.chunkMinhashCtes()}
         |SELECT id_a // ${graft.operators.Dedup.ChunkIdBase} AS doc_a,
         |  id_a % ${graft.operators.Dedup.ChunkIdBase} AS idx_a,
         |  id_b // ${graft.operators.Dedup.ChunkIdBase} AS doc_b,
         |  id_b % ${graft.operators.Dedup.ChunkIdBase} AS idx_b,
         |  jaccard6
         |FROM cpairs ORDER BY 1, 2, 3, 4""".stripMargin,
    // Chunk-granularity against-check: the same chain with corpus-side
    // rep collapse, uncollapsed incoming chunks, corpus-only df census
    // cutting both sides, and new × corpus candidates.
    "chunk_dedup_against" ->
      s"""WITH ${Memo.chunkAgainstCtes()}
         |SELECT id_a // ${graft.operators.Dedup.ChunkIdBase} AS new_doc,
         |  id_a % ${graft.operators.Dedup.ChunkIdBase} AS new_idx,
         |  id_b // ${graft.operators.Dedup.ChunkIdBase} AS corpus_doc,
         |  id_b % ${graft.operators.Dedup.ChunkIdBase} AS corpus_idx,
         |  jaccard6
         |FROM cpairs ORDER BY 1, 2, 3, 4""".stripMargin,
    // Per-doc audit over the same chain: representative chunks kept,
    // and how many fuzzy-duplicate an earlier representative (the
    // pair's higher cid is the victim — keeper convention).
    "chunk_fuzzy_audit" ->
      s"""WITH ${Memo.chunkMinhashCtes()},
         |victims AS (SELECT DISTINCT id_b AS cid FROM cpairs)
         |SELECT r.cid // ${graft.operators.Dedup.ChunkIdBase} AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_rep_chunks,
         |  CAST(sum(CASE WHEN v.cid IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_fuzzy_dup
         |FROM reps r LEFT JOIN victims v ON r.cid = v.cid
         |GROUP BY 1 ORDER BY 1""".stripMargin,
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
        |ORDER BY id_a, id_b""".stripMargin
  )
}
