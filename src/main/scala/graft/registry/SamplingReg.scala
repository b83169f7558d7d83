package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Sampling family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object SamplingReg {
  // ── Deterministic sampling (training-data selection) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // the pack family fans out from ONE memoized layout relation
    // (packLayoutFor): tokenize + prefix-sum run once, three readouts
    "pack_sequences" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.packSequencesFromLayout(packLayoutFor(s, dir))
    }),
    "pack_spans" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.packSequenceSpansFromLayout(packLayoutFor(s, dir))
    }),
    // reproducible training order: per epoch, every packed sequence's
    // position from the portable h60 of (seed, epoch, seq_id) — same
    // order on any engine/partitioning; closed-form rank, no global sort
    "epoch_order" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.epochOrderFromLayout(packLayoutFor(s, dir))
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
    // served from the memoized allocation relation (shared with
    // mix_order's copies quota — one allocator run per process)
    "epoch_allocate" -> ((s, dir) => epochAllocFor(s, dir)),
    // dedup-adjusted allocation: the same allocator pricing UNIQUE
    // chars (non-members + group keepers under the memoized LSH+CC
    // membership relation) — what a data-constrained run actually buys
    "epoch_allocate_dedup" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.epochAllocateDedup(Tables.documents(s, dir),
        groupsFor(s, dir, 0.8))
    }),
    // the allocation plan made executable: per-doc repetition quotas
    // from epochs_micro (floor + h60-priority extra copies), global
    // positions from the (seed, doc, copy) shuffle — the order a
    // data-constrained training run actually reads
    "mix_order" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.mixOrder(Tables.documents(s, dir),
        allocIn = Some(epochAllocFor(s, dir)))
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
    // the RELEASE half of the privacy family: ln2-DP noisy cell counts,
    // noise = keyed discrete Laplace read from the cell hash's bits
    "dp_counts" -> ((s, dir) =>
      TextAnalysis.dpCounts(Tables.documents(s, dir))),
    // the ACTION half of the k-audit: widen the bucket ladder until
    // at-risk mass hits its irreducible floor, suppress the residue
    "k_anon_coarsen" -> ((s, dir) =>
      TextAnalysis.kAnonCoarsen(Tables.documents(s, dir))),
    // re-shard movement pricing 16→20: hash-mod vs rendezvous (HRW)
    // placement — the minimal-movement contrast, map-side only
    "reshard_plan" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.reshardPlan(Tables.documents(s, dir))
    }),
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
    })
  )

  def sql: Map[String, String] = Map(
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
    // keyed discrete-Laplace (α = 1/2) noise replayed bit-exactly: two
    // Geometric(1/2) draws = trailing-ones counts of the cell hash's
    // 30-bit halves; pure integer bit ops, no libm on either engine
    "dp_counts" ->
      """WITH g AS (
        |  SELECT source, lang, count(*) AS n,
        |    ('0x' || substr(md5('dp1:' || source || ':' || lang), 1, 15))
        |      ::BIGINT AS h
        |  FROM documents GROUP BY 1, 2
        |)
        |SELECT source, lang, CAST(n
        |  + bit_count((h & 1073741823) & ~((h & 1073741823) + 1))
        |  - bit_count(((h >> 30) & 1073741823)
        |      & ~(((h >> 30) & 1073741823) + 1)) AS BIGINT) AS n_noisy
        |FROM g ORDER BY source, lang""".stripMargin,
    // rendezvous weights = the portable h60 of doc:s for s < 20; a doc
    // moves under HRW iff the extended argmax lands past shard 15
    // (list_position is 1-based first-match on both engines); mod moves
    // iff the two residues differ
    "reshard_plan" ->
      """WITH hw AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h,
        |    list_transform(generate_series(0, 19), s ->
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(s AS VARCHAR)), 1, 15))::BIGINT) AS w
        |  FROM documents
        |), f AS (
        |  SELECT CASE WHEN h % 16 != h % 20 THEN 1 ELSE 0 END AS mod_m,
        |    CASE WHEN list_position(w, list_aggregate(w, 'max')) > 16
        |      THEN 1 ELSE 0 END AS rdv_m
        |  FROM hw
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(mod_m) AS BIGINT) AS mod_n,
        |    CAST(sum(rdv_m) AS BIGINT) AS rdv_n
        |  FROM f
        |)
        |SELECT scheme, n_docs, n_moved,
        |  CAST(CASE WHEN n_docs > 0 THEN n_moved * 1000000 // n_docs END
        |    AS BIGINT) AS moved_micro
        |FROM (
        |  SELECT 'mod' AS scheme, n_docs, mod_n AS n_moved FROM a
        |  UNION ALL
        |  SELECT 'rendezvous' AS scheme, n_docs, rdv_n AS n_moved FROM a
        |) ORDER BY scheme""".stripMargin,
    // doubling-ladder generalization: j* = first width whose at-risk
    // doc mass equals the j=12 floor; grid at j* with release/suppress
    "k_anon_coarsen" ->
      """WITH cells AS (
        |  SELECT j, source, lang,
        |    n_chars // (500 * (1 << j)) AS len_bucket,
        |    count(*) AS group_n
        |  FROM documents, unnest(generate_series(0, 12)) AS g(j)
        |  GROUP BY 1, 2, 3, 4
        |), risky AS (
        |  SELECT j, sum(CASE WHEN group_n < 5 THEN group_n ELSE 0 END)
        |    AS risk_docs
        |  FROM cells GROUP BY 1
        |), jstar AS (
        |  SELECT min(j) AS js FROM risky
        |  WHERE risk_docs = (SELECT risk_docs FROM risky WHERE j = 12)
        |)
        |SELECT source, lang, CAST(len_bucket AS BIGINT) AS len_bucket,
        |  CAST(group_n AS BIGINT) AS group_n,
        |  CASE WHEN group_n < 5 THEN 'suppress' ELSE 'release' END
        |    AS action,
        |  CAST(500 * (1 << js) AS BIGINT) AS bucket_width
        |FROM cells JOIN jstar ON cells.j = jstar.js
        |ORDER BY source, lang, len_bucket""".stripMargin,
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
    // Deterministic training order: the pack_sequences CTEs yield the
    // distinct seq_ids; each (epoch, seq_id) keys by the portable h60
    // of '42:epoch:seq_id' and ranks within its epoch (key asc, seq_id
    // tiebreak) — the engine's closed-form rank replayed as one window.
    "epoch_order" ->
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
        |), seqs AS (
        |  SELECT DISTINCT
        |    CAST(shard * 1099511627776 + tokens_before // 512 AS BIGINT) AS seq_id
        |  FROM cum
        |), ep(epoch) AS (VALUES (CAST(0 AS BIGINT)), (1), (2)
        |), keyed AS (
        |  SELECT ep.epoch, s.seq_id,
        |    ('0x' || substr(md5('42:' || ep.epoch || ':' || s.seq_id), 1, 15))::BIGINT AS k
        |  FROM seqs s CROSS JOIN ep
        |)
        |SELECT epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch
        |    ORDER BY k, seq_id) AS BIGINT) AS pos,
        |  seq_id
        |FROM keyed ORDER BY epoch, pos""".stripMargin,
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
    // Dedup-adjusted allocation: the epoch_allocate chain with every
    // pricing input switched to UNIQUE chars — docs outside any
    // near-dup group, plus group keepers (rep = doc_id) under the
    // minhash+CC closure the dedup_groups oracle states; raw chars
    // ride along for the report.
    "epoch_allocate_dedup" ->
      s"""WITH RECURSIVE ${Memo.minhashPairsCtes},
        |und AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        |), members AS (SELECT DISTINCT a AS id FROM und
        |), keeprs AS (
        |  SELECT m.id, least(m.id, min(r.dst)) AS rep
        |  FROM members m JOIN reach r ON r.src = m.id GROUP BY m.id
        |), counts AS (
        |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(coalesce(d.n_chars, 0)) AS BIGINT) AS chars,
        |    CAST(sum(CASE WHEN k.id IS NULL OR k.rep = d.doc_id
        |      THEN coalesce(d.n_chars, 0) ELSE 0 END) AS BIGINT)
        |      AS unique_chars
        |  FROM documents d LEFT JOIN keeprs k ON k.id = d.doc_id
        |  GROUP BY 1
        |), capw AS (
        |  SELECT source, n_docs, chars, unique_chars,
        |    unique_chars * 2 AS capacity,
        |    CAST(floor(sqrt(unique_chars)) AS BIGINT) AS wt
        |  FROM counts
        |), bb AS (
        |  SELECT CASE WHEN csum < 280000 THEN csum ELSE 280000 END AS b,
        |    wsum
        |  FROM (SELECT CAST(sum(wt) AS BIGINT) AS wsum,
        |          CAST(sum(capacity) AS BIGINT) AS csum FROM capw)
        |), base AS (
        |  SELECT source, n_docs, chars, unique_chars, capacity, wt,
        |    CASE WHEN wsum > 0 THEN wt * b // wsum ELSE 0 END AS fl,
        |    CASE WHEN wsum > 0 THEN wt * b % wsum ELSE 0 END AS rem
        |  FROM capw, bb
        |), sh1 AS (
        |  SELECT (SELECT b FROM bb) -
        |    (SELECT coalesce(sum(fl), 0) FROM base) AS short1
        |), a1 AS (
        |  SELECT source, n_docs, chars, unique_chars, capacity, wt,
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
        |SELECT t.source, t.n_docs, t.chars, t.unique_chars,
        |  CAST(t.capacity AS BIGINT) AS capacity,
        |  CAST(CASE WHEN t.is_over THEN t.capacity
        |    ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END
        |    AS BIGINT) AS alloc_chars,
        |  CAST(CASE WHEN t.unique_chars > 0 THEN
        |    (CASE WHEN t.is_over THEN t.capacity
        |      ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END)
        |      * 1000000 // t.unique_chars ELSE 0 END AS BIGINT)
        |    AS epochs_micro
        |FROM sat t LEFT JOIN r2 ON r2.source = t.source
        |ORDER BY t.source""".stripMargin,
    // Integer-exact mirror of Sampling.epochAllocate's two-round
    // largest-remainder allocation under per-source epoch caps
    // (capacity = 2 × chars, budget 280000, isqrt weights, ties by
    // source; ONE redistribution round, clamped — the documented spec).
    "epoch_allocate" ->
      s"""WITH $EpochAllocCtes
         |SELECT source, n_docs, chars, capacity, alloc_chars, epochs_micro
         |FROM alloc ORDER BY source""".stripMargin,
    // the plan made executable: the SAME allocator CTEs feed per-doc
    // repetition quotas (floor(epochs) + one extra for the first
    // frac_micro·n_docs div 10⁶ docs under the h60 priority order),
    // and every (doc, copy) takes its global position from the
    // md5-derived (seed, doc, copy) key — the epoch_order rank over
    // the weighted multiset
    "mix_order" ->
      s"""WITH $EpochAllocCtes, dr AS (
         |  SELECT d.doc_id, d.source, row_number() OVER (
         |    PARTITION BY d.source ORDER BY
         |      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
         |      d.doc_id) AS dr
         |  FROM documents d
         |), cop AS (
         |  SELECT r.doc_id,
         |    a.epochs_micro // 1000000
         |      + CASE WHEN r.dr <=
         |          (a.epochs_micro % 1000000) * a.n_docs // 1000000
         |        THEN 1 ELSE 0 END AS n_copies
         |  FROM dr r JOIN alloc a ON a.source = r.source
         |), cps AS (
         |  SELECT doc_id,
         |    unnest(generate_series(CAST(0 AS BIGINT), n_copies - 1))
         |      AS copy_idx
         |  FROM cop WHERE n_copies > 0
         |), keyed AS (
         |  SELECT doc_id, copy_idx,
         |    ('0x' || substr(md5('42:' || doc_id || ':' || copy_idx), 1, 15))::BIGINT
         |      AS k
         |  FROM cps
         |)
         |SELECT CAST(row_number() OVER (ORDER BY k, doc_id, copy_idx)
         |    AS BIGINT) AS pos,
         |  doc_id, copy_idx
         |FROM keyed ORDER BY pos""".stripMargin
  )

  /** The two-round largest-remainder allocator as a shared CTE chain
    * ending in `alloc(source, n_docs, chars, capacity, alloc_chars,
    * epochs_micro)` — the epoch_allocate oracle verbatim, consumed by
    * both the plan gate and its executable rendering (mix_order). */
  private val EpochAllocCtes: String =
    """counts AS (
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
      |), alloc AS (
      |  SELECT t.source, t.n_docs, t.chars,
      |    CAST(t.capacity AS BIGINT) AS capacity,
      |    CAST(CASE WHEN t.is_over THEN t.capacity
      |      ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END
      |      AS BIGINT) AS alloc_chars,
      |    CAST(CASE WHEN t.chars > 0 THEN
      |      (CASE WHEN t.is_over THEN t.capacity
      |        ELSE least(t.capacity, t.a + coalesce(r2.add2, 0)) END)
      |        * 1000000 // t.chars ELSE 0 END AS BIGINT) AS epochs_micro
      |  FROM sat t LEFT JOIN r2 ON r2.source = t.source
      |)""".stripMargin
}
