package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Drift family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object DriftReg {
  // ── Distribution drift / corpus mixing (operators/Drift.scala) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "value_drift" -> ((s, dir) =>
      graft.operators.Drift.valueDrift(Tables.events(s, dir))),
    "psi_drift" -> ((s, dir) =>
      graft.operators.Drift.psiDrift(Tables.events(s, dir))),
    "source_kl" -> ((s, dir) => graft.operators.Drift.sourceKl(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
    "js_divergence" -> ((s, dir) => graft.operators.Drift.jsDivergence(
      Tables.documents(s, dir), tokenTf = Some(tokenTfFor(s, dir)))),
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
    // per-bit activation drift of the BQ sign codes between vec_id
    // halves — the 1-bit marginal of embedding_drift: the cheapest
    // embedding-distribution monitor (8-byte codes, no float geometry),
    // integer-exact so the oracle replays it bit-for-bit
    "bq_bit_drift" -> ((s, dir) =>
      graft.operators.Drift.bqBitDrift(Tables.embeddings(s, dir)))
  )

  def sql: Map[String, String] = Map(
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
    // per-bit BQ activation drift: the same sign-bit rule as sign_pack
    // (x >= 0, bit CLEAR on NaN — DuckDB orders NaN above all floats,
    // so the NOT isnan guard keeps the rule engine-identical), halves
    // split at (min+max)//2, rates in integer micros (all terms
    // nonnegative, // == div == floor on both engines)
    "bq_bit_drift" ->
      """WITH m AS (
        |  SELECT (min(vec_id) + max(vec_id)) // 2 AS mid FROM embeddings
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS bit,
        |    unnest(embedding) AS x FROM embeddings
        |), b AS (
        |  SELECT e.bit,
        |    sum(CASE WHEN e.vec_id <= m.mid AND e.x >= 0 AND NOT isnan(e.x)
        |      THEN 1 ELSE 0 END) AS s0,
        |    sum(CASE WHEN e.vec_id <= m.mid THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN e.vec_id > m.mid AND e.x >= 0 AND NOT isnan(e.x)
        |      THEN 1 ELSE 0 END) AS s1,
        |    sum(CASE WHEN e.vec_id > m.mid THEN 1 ELSE 0 END) AS c1
        |  FROM elems e, m WHERE e.bit < 64 GROUP BY 1
        |)
        |SELECT bit,
        |  CAST(CASE WHEN c0 > 0 THEN s0 * 1000000 // c0 END AS BIGINT)
        |    AS ref_rate_micro,
        |  CAST(CASE WHEN c1 > 0 THEN s1 * 1000000 // c1 END AS BIGINT)
        |    AS new_rate_micro,
        |  CAST(abs((CASE WHEN c0 > 0 THEN s0 * 1000000 // c0 END)
        |    - (CASE WHEN c1 > 0 THEN s1 * 1000000 // c1 END)) AS BIGINT)
        |    AS delta_micro
        |FROM b ORDER BY bit""".stripMargin,
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
        |FROM diffs GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
