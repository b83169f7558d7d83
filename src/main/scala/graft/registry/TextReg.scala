package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Text family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object TextReg {
  // ── Text analysis ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_stats" -> ((s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))),
    // corpus-mix concentration: exact Gini + top-decile share of char
    // MASS across sources — the "is one domain the corpus" read a
    // mixing plan takes before weighting (the giniFrom shared core)
    "source_gini" -> ((s, dir) => {
      import graft.operators.Profiling
      Profiling.giniFrom(Tables.documents(s, dir)
        .groupBy(col("source").as("k"))
        .agg(sum(coalesce(col("n_chars"), lit(0L))).cast("long")
          .as("cnt")))
    }),
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
    // per-doc language CONSISTENCY: 32-token chunks scored with the
    // lang_id markers; mixed docs are what a lang filter silently keeps
    "code_switch" -> ((s, dir) =>
      TextAnalysis.codeSwitch(Tables.documents(s, dir))),
    "lang_confusion" -> ((s, dir) =>
      TextAnalysis.langConfusion(Tables.documents(s, dir))),
    "source_confusion" -> ((s, dir) => TextAnalysis.sourceConfusion(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "zipf_slope" -> ((s, dir) => TextAnalysis.zipfSlope(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    // the synthetic corpus is ASCII-clean (measured: zero artifacts of
    // every class), so the gate SEEDS each damage class deterministically
    // (doc_id mod 13, literal suffixes built identically in both engines)
    // — the oracle then pins nonzero cross-engine artifact counting, not
    // just all-zero parity
    "encoding_audit" -> ((s, dir) =>
      TextAnalysis.encodingAudit(decorateEncoding(Tables.documents(s, dir)))),
    // the APPLY half: same decorated corpus, fixed digraph repair table
    "encoding_repair" -> ((s, dir) =>
      TextAnalysis.encodingRepair(decorateEncoding(Tables.documents(s, dir)))),
    "doc_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "scrub_pii" -> ((s, dir) => TextAnalysis.scrubPii(Tables.documents(s, dir))),
    "curate_pipeline" -> ((s, dir) => TextAnalysis.curate(Tables.documents(s, dir))),
    "filter_attribution" -> ((s, dir) =>
      TextAnalysis.filterAttribution(Tables.documents(s, dir))),
    // served from the memoized fraction relation (fracFor): the binary
    // gate's n_hit_ngrams IS frac's n_hits (same eval slice, same
    // broadcast hit-count join) — one scoring pass for the whole family
    "decontaminate" -> ((s, dir) =>
      fracFor(s, dir)
        .filter(col("n_hits") >= 1)
        .select(col("doc_id"), col("n_hits").as("n_hit_ngrams"))
        .orderBy(col("doc_id"))),
    "repetition_score" -> ((s, dir) => TextAnalysis.repetitionScore(Tables.documents(s, dir))),
    // the bigram family fans out from one memoized COUNT census
    // (bigramTfFor) — every consumer's first aggregate, run once
    "lm_coverage" -> ((s, dir) => TextAnalysis.lmCoverage(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)))),
    "lm_perplexity" -> ((s, dir) => TextAnalysis.lmPerplexity(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)))),
    "kn_perplexity" -> ((s, dir) => TextAnalysis.knPerplexity(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)))),
    "gopher_repetition" -> ((s, dir) => TextAnalysis.gopherRepetition(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)))),
    "hybrid_rrf" -> ((s, dir) =>
      Similarity.hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir),
        bm25 = Some(bm25For(s, dir)))),
    "dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(
      Tables.documents(s, dir), bigramTf = Some(bigramTfFor(s, dir)))),
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
    // eval-side bitmap is memoized write-time benchmark state
    // (decontamBloomBitsFor); the query pays the corpus-side scan only
    "decontaminate_bloom" -> ((s, dir) => TextAnalysis.decontaminateBloom(
      Tables.documents(s, dir),
      bitsIn = Some(decontamBloomBitsFor(s, dir)))),
    "vocab_topk" -> ((s, dir) => TextAnalysis.vocabTopK(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "bpe_pair_counts" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(Tables.documents(s, dir))),
    "ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(Tables.documents(s, dir))),
    "token_gini" -> ((s, dir) => TextAnalysis.tokenGini(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "tfidf_top_term" -> ((s, dir) => TextAnalysis.tfidfTopTerm(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "winnow_pairs" -> ((s, dir) => TextAnalysis.winnowPairs(
      Tables.documents(s, dir), positions = Some(positionsFor(s, dir)))),
    "readability" -> ((s, dir) => TextAnalysis.readability(Tables.documents(s, dir))),
    "length_deciles" -> ((s, dir) => TextAnalysis.lengthDeciles(Tables.documents(s, dir))),
    "chunk_docs" -> ((s, dir) => TextAnalysis.chunkDocs(Tables.documents(s, dir))),
    "vocab_cms" -> ((s, dir) => TextAnalysis.vocabCmsTopK(
      Tables.documents(s, dir), tokenTfIn = Some(tokenTfFor(s, dir)))),
    "temperature_mix" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.temperatureMix(Tables.documents(s, dir))
    })
  )

  /** The deterministic damage seeding under `encoding_audit` — Scala
    * unicode escapes here, chr() composition in the oracle; the strings
    * are code-point-identical by construction. */
  private def decorateEncoding(documents: DataFrame): DataFrame =
    documents.withColumn("text",
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"),
          lit(" caf\u00c3\u00a9 \u00e2\u20ac\u2122 na\u00c3\u00afve")))
        .when(pmod(col("doc_id"), lit(13)) === 1,
          concat(col("text"), lit(" bad\ufffdbyte")))
        .when(pmod(col("doc_id"), lit(13)) === 2,
          concat(col("text"), lit(" !!!!????***")))
        .when(pmod(col("doc_id"), lit(13)) === 3,
          concat(col("text"), lit("\u0008\u0080\u001f")))
        .otherwise(col("text")))

  /** The doc_id-mod-13 decoration CASE as DuckDB SQL — the oracle twin
    * of [[decorateEncoding]] (chr() composition keeps the SQL ASCII). */
  private val EncodingDecorateCase: String =
    """CASE
      |      WHEN doc_id % 13 = 0 THEN text || ' caf' || chr(195) || chr(169) || ' ' || chr(226) || chr(8364) || chr(8482) || ' na' || chr(195) || chr(175) || 've'
      |      WHEN doc_id % 13 = 1 THEN text || ' bad' || chr(65533) || 'byte'
      |      WHEN doc_id % 13 = 2 THEN text || ' !!!!????***'
      |      WHEN doc_id % 13 = 3 THEN text || chr(8) || chr(128) || chr(31)
      |      ELSE text END""".stripMargin

  /** The mojibake repair chain unrolled as CTE stages — one stage per
    * [[TextAnalysis.MojibakeRepairs]] entry, counts taken on each
    * stage's own input exactly like the operator's fold. */
  private def encodingRepairOracle: String = {
    val stages = TextAnalysis.MojibakeRepairs.zipWithIndex.map {
      case ((p, r), i) =>
        val pat = p.map(c => s"chr(${c.toInt})").mkString(" || ")
        val rep = r.map(c => s"chr(${c.toInt})").mkString(" || ")
        s"""s${i + 1} AS (
           |  SELECT doc_id,
           |    c + (length(t) - length(replace(t, $pat, ''))) // ${p.length} AS c,
           |    replace(t, $pat, $rep) AS t
           |  FROM s$i)""".stripMargin
    }.mkString(", ")
    s"""WITH dec AS (
       |  SELECT doc_id, $EncodingDecorateCase AS t FROM documents
       |), s0 AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS c, t FROM dec
       |), $stages
       |SELECT doc_id, CAST(c AS BIGINT) AS n_repairs, md5(t) AS repaired_md5
       |FROM s${TextAnalysis.MojibakeRepairs.length} ORDER BY doc_id""".stripMargin
  }

  def sql: Map[String, String] = Map(
    "encoding_repair" -> encodingRepairOracle,
    "encoding_audit" ->
      """WITH dec AS (
        |  SELECT source,
        |    CASE
        |      WHEN doc_id % 13 = 0 THEN text || ' caf' || chr(195) || chr(169) || ' ' || chr(226) || chr(8364) || chr(8482) || ' na' || chr(195) || chr(175) || 've'
        |      WHEN doc_id % 13 = 1 THEN text || ' bad' || chr(65533) || 'byte'
        |      WHEN doc_id % 13 = 2 THEN text || ' !!!!????***'
        |      WHEN doc_id % 13 = 3 THEN text || chr(8) || chr(128) || chr(31)
        |      ELSE text END AS t
        |  FROM documents
        |), c AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(t, '[\x{0080}-\x{10FFFF}]')) AS BIGINT) AS na,
        |    CAST(len(regexp_extract_all(t, '[' || chr(195) || chr(226) || chr(194) || ']')) AS BIGINT) AS mj,
        |    CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS rp,
        |    CAST(len(regexp_extract_all(t, '[\x{0080}-\x{009F}]')) AS BIGINT) AS c1,
        |    CAST(len(regexp_extract_all(t, '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]')) AS BIGINT) AS c0,
        |    CAST(len(regexp_extract_all(t, '[!-/:-@\[-`{-~]{4,}')) AS BIGINT) AS pr
        |  FROM dec
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(na) AS BIGINT) AS n_non_ascii,
        |  CAST(sum(mj) AS BIGINT) AS n_mojibake_lead,
        |  CAST(sum(rp) AS BIGINT) AS n_replacement,
        |  CAST(sum(c1) AS BIGINT) AS n_c1_controls,
        |  CAST(sum(c0) AS BIGINT) AS n_c0_controls,
        |  CAST(sum(pr) AS BIGINT) AS n_punct_runs,
        |  CAST(sum(CASE WHEN mj + rp + c1 + c0 + pr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_docs
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
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
    // Corpus-mix Gini: the user_gini rank-identity chain over per-source
    // char mass (HUGEINT widening, ascending (cnt, k) rank).
    "source_gini" ->
      """WITH c AS (
        |  SELECT source AS k,
        |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1
        |), r AS (
        |  SELECT k, cnt,
        |    row_number() OVER (ORDER BY cnt, k) AS rk,
        |    count(*) OVER () AS n
        |  FROM c
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS total,
        |  CAST((2 * CAST(sum(rk * cnt) AS HUGEINT) * 1000000
        |    - CAST(max(n) + 1 AS HUGEINT) * CAST(sum(cnt) AS BIGINT)
        |      * 1000000)
        |    // (CAST(max(n) AS HUGEINT) * CAST(sum(cnt) AS BIGINT))
        |    AS BIGINT) AS gini_micro,
        |  CAST(CAST(sum(CASE WHEN rk > n - (n + 9) // 10
        |      THEN cnt ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(cnt) AS BIGINT) AS BIGINT)
        |    AS top_decile_share_micro
        |FROM r""".stripMargin,
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
    // Chunked lang_id with the identical marker CASE; majority election
    // = count desc then declared marker order (the langId tiebreak)
    "code_switch" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(t, ' '),
        |    x -> len(x) > 0) AS w FROM norm
        |), chunks AS (
        |  SELECT doc_id, i AS chunk_idx, w[(i*32+1):(i*32+32)] AS cw
        |  FROM toks, unnest(generate_series(CAST(0 AS BIGINT),
        |    greatest(CAST((len(w) + 31) // 32 AS BIGINT), 1) - 1)) AS g(i)
        |), sc AS (
        |  SELECT doc_id, chunk_idx,
        |    len(list_filter(cw, x -> list_contains(['the','and','of','is','a'], x))) AS he,
        |    len(list_filter(cw, x -> list_contains(['der','und','die','das','ist'], x))) AS hd,
        |    len(list_filter(cw, x -> list_contains(['le','et','les','des','est'], x))) AS hf,
        |    len(list_filter(cw, x -> list_contains(['el','y','los','de','es'], x))) AS hs
        |  FROM chunks
        |), pred AS (
        |  SELECT doc_id, chunk_idx,
        |    CASE WHEN greatest(he, hd, hf, hs) = 0 THEN 'und'
        |         WHEN he = greatest(he, hd, hf, hs) THEN 'en'
        |         WHEN hd = greatest(he, hd, hf, hs) THEN 'de'
        |         WHEN hf = greatest(he, hd, hf, hs) THEN 'fr'
        |         ELSE 'es' END AS cl
        |  FROM sc
        |), per AS (
        |  SELECT doc_id, cl, count(*) AS n FROM pred
        |  WHERE cl != 'und' GROUP BY 1, 2
        |), maj AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_decided,
        |    CAST(count(*) AS BIGINT) AS n_langs
        |  FROM per GROUP BY 1
        |), win AS (
        |  SELECT doc_id, cl, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY n DESC, CASE cl WHEN 'en' THEN 0 WHEN 'de' THEN 1
        |      WHEN 'fr' THEN 2 ELSE 3 END) AS rn
        |  FROM per
        |), tot AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM pred GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_chunks,
        |  coalesce(m.n_decided, 0) AS n_decided,
        |  coalesce(m.n_langs, 0) AS n_langs,
        |  coalesce(w.cl, 'und') AS lang_major,
        |  CAST(CASE WHEN coalesce(m.n_langs, 0) >= 2 THEN 1 ELSE 0 END
        |    AS BIGINT) AS mixed
        |FROM tot t LEFT JOIN maj m USING (doc_id)
        |LEFT JOIN (SELECT doc_id, cl FROM win WHERE rn = 1) w USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
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
    "filter_attribution" ->
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
        |), f AS (
        |  SELECT
        |    CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS fd,
        |    CASE WHEN lang_pred <> 'en' THEN 1 ELSE 0 END AS fl,
        |    CASE WHEN quality < 0.7 THEN 1 ELSE 0 END AS fq
        |  FROM scored
        |), g AS (
        |  SELECT fd, fl, fq, fd + fl + fq AS nf FROM f
        |)
        |SELECT 'dup' AS gate, CAST(COALESCE(sum(fd), 0) AS BIGINT) AS n_flagged,
        |  CAST(COALESCE(sum(CASE WHEN fd = 1 AND nf = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_only FROM g
        |UNION ALL
        |SELECT 'lang', CAST(COALESCE(sum(fl), 0) AS BIGINT),
        |  CAST(COALESCE(sum(CASE WHEN fl = 1 AND nf = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM g
        |UNION ALL
        |SELECT 'quality', CAST(COALESCE(sum(fq), 0) AS BIGINT),
        |  CAST(COALESCE(sum(CASE WHEN fq = 1 AND nf = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM g
        |UNION ALL
        |SELECT 'pass', CAST(COALESCE(sum(CASE WHEN nf = 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
        |  CAST(COALESCE(sum(CASE WHEN nf = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM g
        |ORDER BY gate""".stripMargin,
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
        |FROM norm ORDER BY doc_id""".stripMargin
  )
}
