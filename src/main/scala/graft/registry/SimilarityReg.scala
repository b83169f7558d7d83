package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Similarity family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object SimilarityReg {
  // ── Similarity search over embeddings ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> ((s, dir) => Similarity.annBruteForce(Tables.embeddings(s, dir))),
    // ranking quality vs label ground truth (MRR/nDCG) — the retriever
    // is pluggable; the exact scorer gates, IVF/LSH substitute at scale
    "retrieval_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.retrievalEval(Similarity.annBruteForce(emb), emb)
    }),
    "ann_lsh_topk" -> ((s, dir) => Similarity.annLsh(Tables.embeddings(s, dir))),
    // 1-bit binary-quantization rungs: Hamming top-k over the packed
    // sign codes (integer-exact — the oracle replays the pack + popcount
    // bit-for-bit), and the BQ shortlist → exact-cosine re-rank chain
    "ann_hamming_topk" -> ((s, dir) =>
      Similarity.annHamming(Tables.embeddings(s, dir))),
    "ann_bq_rerank" -> ((s, dir) =>
      Similarity.annBqRerank(Tables.embeddings(s, dir))),
    // IVF×BQ composed serving: partition-pruned cells (write-time
    // quantizer state) scored by 8-byte sign codes, exact re-rank on
    // the shortlist — cells cut the scan, codes cut the bytes
    "ann_ivf_bq_topk" -> ((s, dir) =>
      Similarity.annIvfBq(Tables.embeddings(s, dir), centroidsFor(s, dir))),
    // asymmetric BQ: 1-bit corpus, FLOAT query (micro-floored to exact
    // BIGINT terms) — the standard recall upgrade over symmetric
    // Hamming at the same shortlist width
    "ann_bq_asym_topk" -> ((s, dir) =>
      Similarity.annBqAsym(Tables.embeddings(s, dir))),
    // recall@10 of the BQ chain vs the exact scorer — the audit that
    // gates the 1-bit shortlist width before serving (annRecall is
    // retriever-agnostic: same read as ann_recall, BQ plugged in)
    "bq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.annRecall(
        Similarity.annBruteForce(emb),
        Similarity.annBqRerank(emb))
    }),
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
    // IVF-SQ8 serving path (FAISS trio third leg): probed candidates
    // scored from their per-vector int8 codes alone — the per-vector
    // scale cancels in the cosine, so the score is the exact-integer
    // code-grid cosine the oracle bit-replays from __AUX__/sq8_codes.
    "ann_ivf_sq_topk" -> ((s, dir) =>
      Similarity.annIvfSq(Tables.embeddings(s, dir),
        centroidsFor(s, dir))),
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
    // the recall-vs-cost ladder that tunes the probe knob ann_recall
    // audits at one setting — one summary row per nProbe rung
    "ivf_probe_sweep" -> ((s, dir) =>
      Similarity.ivfProbeSweep(Tables.embeddings(s, dir),
        centroidsFor(s, dir))),
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
      Similarity.mmrRerank(Tables.embeddings(s, dir)))
  )

  /** MRR/nDCG oracle: the ann_topk ranked CTE chain + label relevance,
    * with the SAME driver-computed micro gain literals the operator
    * ships (no libm in either engine's data path). */
  private def retrievalEvalOracle: String = {
    val k = 10
    val gains = Similarity.retrievalGains(k)
    val gainRows = gains.zipWithIndex
      .map { case (g, i) => s"(${i + 1}, $g)" }.mkString(", ")
    val prefRows = gains.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (g, i) => s"(${i + 1}, $g)" }.mkString(", ")
    s"""WITH elems AS (
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
       |  SELECT query_id, cand_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM sims
       |), topk AS (
       |  SELECT query_id, cand_id, rank FROM ranked WHERE rank <= $k
       |), gains(rank, g) AS (VALUES $gainRows
       |), pref(n, cum) AS (VALUES $prefRows
       |), lab AS (
       |  SELECT vec_id, label FROM embeddings
       |), qs AS (
       |  SELECT vec_id AS query_id FROM lab WHERE vec_id <= 4
       |), nrel AS (
       |  SELECT q.query_id, CAST(count(c.vec_id) AS BIGINT) AS n_rel
       |  FROM qs q LEFT JOIN lab c
       |    ON c.label = (SELECT label FROM lab WHERE vec_id = q.query_id)
       |    AND c.vec_id <> q.query_id
       |  GROUP BY 1
       |), rel AS (
       |  SELECT t.query_id, t.rank,
       |    (cl.label = ql.label) AS is_rel
       |  FROM topk t
       |  JOIN lab cl ON cl.vec_id = t.cand_id
       |  JOIN lab ql ON ql.vec_id = t.query_id
       |), per AS (
       |  SELECT query_id,
       |    CAST(COALESCE(sum(CASE WHEN is_rel THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits,
       |    min(CASE WHEN is_rel THEN rank END) AS first_rel,
       |    CAST(COALESCE(sum(CASE WHEN is_rel THEN g END), 0) AS BIGINT) AS dcg_micro
       |  FROM rel JOIN gains USING (rank) GROUP BY 1
       |)
       |SELECT n.query_id, n.n_rel,
       |  COALESCE(p.hits, 0) AS hits,
       |  CAST(COALESCE(1000000 // p.first_rel, 0) AS BIGINT) AS rr_micro,
       |  COALESCE(p.dcg_micro, 0) AS dcg_micro,
       |  CAST(COALESCE(pr.cum, 0) AS BIGINT) AS idcg_micro,
       |  CAST(CASE WHEN COALESCE(pr.cum, 0) > 0
       |    THEN COALESCE(p.dcg_micro, 0) * 1000000 // pr.cum
       |    ELSE 0 END AS BIGINT) AS ndcg_micro
       |FROM nrel n
       |LEFT JOIN per p USING (query_id)
       |LEFT JOIN pref pr ON pr.n = least(n.n_rel, $k)
       |ORDER BY n.query_id""".stripMargin
  }

  def sql: Map[String, String] = Map(
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
    // IVF-SQ8 search replayed ENTIRELY from the write-time index state:
    // probe selection from the centroid dump (the ann_ivf_topk CTE),
    // candidate cells from the cell dump, and the score as the exact
    // integer code-grid cosine over the sq8_codes dump — BIGINT dot and
    // norm² sums (order-free), two correctly-rounded sqrts, one
    // multiply, one divide; zero-norm codes to -1e308, ties to the
    // lowest cand_id.
    "ann_ivf_sq_topk" ->
      """WITH cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), codes AS (
        |  SELECT vec_id, i, q FROM read_parquet('__AUX__/sq8_codes/*.parquet')
        |), n2 AS (
        |  SELECT vec_id, CAST(sum(q*q) AS BIGINT) AS n2
        |  FROM codes GROUP BY 1
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
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
        |  SELECT c.query_id, c.cand_id,
        |    CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
        |  FROM cands c
        |  JOIN codes qa ON qa.vec_id = c.query_id
        |  JOIN codes qb ON qb.vec_id = c.cand_id AND qb.i = qa.i
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT d.query_id, d.cand_id,
        |    CASE WHEN nq.n2 > 0 AND nc.n2 > 0
        |      THEN CAST(d.dot AS DOUBLE)
        |        / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
        |      ELSE -1e308 END AS sq
        |  FROM dots d
        |  JOIN n2 nq ON nq.vec_id = d.query_id
        |  JOIN n2 nc ON nc.vec_id = d.cand_id
        |), ranked AS (
        |  SELECT query_id, cand_id, sq, row_number() OVER (
        |    PARTITION BY query_id ORDER BY sq DESC, cand_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(sq, 6) AS sq6
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

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
    // Probe-ladder sweep: the ann_recall replay with the probe cutoff
    // parameterized over the ladder — candidates scored ONCE over the
    // deepest rung's union, then re-ranked within each rung's own
    // candidate set (identical scores ⇒ identical per-rung ranks to
    // re-running the probe at that nProbe).
    "ivf_probe_sweep" ->
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
        |), pranked AS (
        |  SELECT q.query_id, q.c_id, row_number() OVER (
        |    PARTITION BY q.query_id ORDER BY
        |      CASE WHEN n.cn = 0 THEN -1e308 ELSE q.dot / n.cn END DESC,
        |      q.c_id) AS r
        |  FROM qdot q JOIN cnorm n ON n.c_id = q.c_id
        |), plad(n_probe) AS (VALUES (1), (2), (4), (8)
        |), candsu AS (
        |  SELECT DISTINCT p.query_id, cl.vec_id AS cand_id
        |  FROM pranked p
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE p.r <= 8 AND cl.vec_id <> p.query_id
        |), idots AS (
        |  SELECT cd.query_id, cd.cand_id, sum(a.x * b.x) AS dot
        |  FROM candsu cd
        |  JOIN elems a ON a.vec_id = cd.query_id
        |  JOIN elems b ON b.vec_id = cd.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), iscore AS (
        |  SELECT d.query_id, d.cand_id, d.dot/(na.nrm*nb.nrm) AS score
        |  FROM idots d
        |  JOIN norms na ON na.vec_id = d.query_id
        |  JOIN norms nb ON nb.vec_id = d.cand_id
        |), candsN AS (
        |  SELECT DISTINCT l.n_probe, p.query_id, cl.vec_id AS cand_id
        |  FROM plad l
        |  JOIN pranked p ON p.r <= l.n_probe
        |  JOIN read_parquet('__AUX__/ivf_cells/*.parquet') cl
        |    ON cl.c_id = p.c_id
        |  WHERE cl.vec_id <> p.query_id
        |), irankedN AS (
        |  SELECT c.n_probe, c.query_id, c.cand_id, row_number() OVER (
        |    PARTITION BY c.n_probe, c.query_id
        |    ORDER BY s.score DESC, c.cand_id) AS rank
        |  FROM candsN c
        |  JOIN iscore s ON s.query_id = c.query_id
        |    AND s.cand_id = c.cand_id
        |), approxN AS (
        |  SELECT n_probe, query_id, cand_id FROM irankedN WHERE rank <= 10
        |)
        |SELECT l.n_probe,
        |  CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CASE WHEN count(*) > 0 THEN
        |    CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |    ELSE NULL END AS recall_micro
        |FROM plad l
        |CROSS JOIN exact e
        |LEFT JOIN approxN a ON a.n_probe = l.n_probe
        |  AND a.query_id = e.query_id AND a.cand_id = e.cand_id
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
    "retrieval_eval" -> retrievalEvalOracle,
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
    // the same sign-bit pack as Spark's sign_pack, as two 32-bit halves
    // (a HUGEINT-free sum can't set bit 63); Hamming = popcount of the
    // per-half XORs, summed — integer-exact end to end
    "ann_hamming_topk" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    unnest(embedding) AS x FROM embeddings
        |), codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN i >= 32 AND i < 64 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM elems GROUP BY 1
        |), dists AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS ham
        |  FROM codes a JOIN codes b
        |    ON a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |), ranked AS (
        |  SELECT query_id, cand_id, ham, row_number() OVER (
        |    PARTITION BY query_id ORDER BY ham, cand_id) AS rank
        |  FROM dists
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  CAST(ham AS BIGINT) AS hamming
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // BQ chain: Hamming rank ≤ 50 shortlist, then the ann_topk exact
    // cosine CTEs restricted to the shortlisted pairs
    "ann_bq_rerank" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN i >= 32 AND i < 64 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM elems GROUP BY 1
        |), dists AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS ham
        |  FROM codes a JOIN codes b
        |    ON a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |), shortlist AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY ham, cand_id) AS hrank
        |    FROM dists)
        |  WHERE hrank <= 50
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), dots AS (
        |  SELECT s.query_id, s.cand_id, sum(a.x*b.x) AS dot
        |  FROM shortlist s
        |  JOIN elems a ON a.vec_id = s.query_id
        |  JOIN elems b ON b.vec_id = s.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), reranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(cos, 6) AS cos6
        |FROM reranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // IVF×BQ composed chain replayed ENTIRELY from the write-time
    // index state: probe selection from the centroid dump + candidate
    // cells from the cell dump (the ann_ivf_topk CTEs), the sign-pack
    // codes rebuilt with the NaN-guarded rule (two 32-bit halves — the
    // ann_hamming_topk CTE), Hamming shortlist rank ≤ 50 WITHIN the
    // probed cells, then the exact-cosine re-rank of the fetched
    // vectors (the ann_bq_rerank tail)
    "ann_ivf_bq_topk" ->
      """WITH cents AS (
        |  SELECT c_id, pos, w FROM read_parquet('__AUX__/ivf_centroids/*.parquet')
        |), cnorm AS (
        |  SELECT c_id, sqrt(sum(w*w)) AS cn FROM cents GROUP BY 1
        |), elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN i >= 32 AND i < 64 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM elems GROUP BY 1
        |), qdot AS (
        |  SELECT e.vec_id AS query_id, c.c_id, sum(e.x * c.w) AS dot
        |  FROM elems e JOIN cents c ON c.pos = e.i
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
        |), dists AS (
        |  SELECT cd.query_id, cd.cand_id,
        |    bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS ham
        |  FROM cands cd
        |  JOIN codes a ON a.vec_id = cd.query_id
        |  JOIN codes b ON b.vec_id = cd.cand_id
        |), shortlist AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY ham, cand_id) AS hrank
        |    FROM dists)
        |  WHERE hrank <= 50
        |), dots AS (
        |  SELECT s.query_id, s.cand_id, sum(a.x*b.x) AS dot
        |  FROM shortlist s
        |  JOIN elems a ON a.vec_id = s.query_id
        |  JOIN elems b ON b.vec_id = s.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), reranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(cos, 6) AS cos6
        |FROM reranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // asymmetric BQ chain: the query's micro-floored float coords
    // against each candidate's ±1 sign pattern — every score an exact
    // BIGINT sum (order-free), sign rule NaN-guarded like sign_pack;
    // shortlist rank ≤ 50 by score DESC (cand_id tiebreak), then the
    // ann_bq_rerank exact-cosine tail
    "ann_bq_asym_topk" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM elems GROUP BY 1
        |), qm AS (
        |  SELECT vec_id AS query_id, i,
        |    CAST(floor(x * 1000000.0) AS BIGINT) AS qm
        |  FROM elems WHERE vec_id <= 4 AND i < 64
        |), bits AS (
        |  SELECT vec_id, i,
        |    CASE WHEN x >= 0 AND NOT isnan(x) THEN 1 ELSE -1 END AS b
        |  FROM elems WHERE i < 64
        |), scores AS (
        |  SELECT q.query_id, b.vec_id AS cand_id,
        |    CAST(sum(q.qm * b.b) AS BIGINT) AS score
        |  FROM qm q JOIN bits b ON b.i = q.i AND b.vec_id <> q.query_id
        |  GROUP BY 1, 2
        |), shortlist AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, cand_id) AS r
        |    FROM scores)
        |  WHERE r <= 50
        |), dots AS (
        |  SELECT s.query_id, s.cand_id, sum(a.x*b.x) AS dot
        |  FROM shortlist s
        |  JOIN elems a ON a.vec_id = s.query_id
        |  JOIN elems b ON b.vec_id = s.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), sims AS (
        |  SELECT query_id, cand_id, dot/(na.nrm*nb.nrm) AS cos
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), reranked AS (
        |  SELECT query_id, cand_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM sims
        |)
        |SELECT query_id, rank, cand_id AS neighbor_id,
        |  round(cos, 6) AS cos6
        |FROM reranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    // recall@10 of the BQ chain: the exact list (branked) and the BQ
    // rerank list (codes → hamming shortlist → cosine rerank) rebuilt
    // independently, hits counted by a left join, integer micros
    "bq_recall" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
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
        |), codes AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN i >= 32 AND i < 64 AND x >= 0 AND NOT isnan(x)
        |      THEN (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM elems GROUP BY 1
        |), dists AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS ham
        |  FROM codes a JOIN codes b
        |    ON a.vec_id <= 4 AND b.vec_id <> a.vec_id
        |), shortlist AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY ham, cand_id) AS hrank
        |    FROM dists)
        |  WHERE hrank <= 50
        |), rdots AS (
        |  SELECT s.query_id, s.cand_id, sum(a.x*b.x) AS dot
        |  FROM shortlist s
        |  JOIN elems a ON a.vec_id = s.query_id
        |  JOIN elems b ON b.vec_id = s.cand_id AND b.i = a.i
        |  GROUP BY 1, 2
        |), reranked AS (
        |  SELECT query_id, cand_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY
        |      dot/(na.nrm*nb.nrm) DESC, cand_id) AS rank
        |  FROM rdots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = cand_id
        |), approx AS (
        |  SELECT query_id, cand_id FROM reranked WHERE rank <= 10
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
        |ORDER BY query_id, rank""".stripMargin
  )
}
