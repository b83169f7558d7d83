package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{model, Sql, Tables}
import graft.ingest.TradeIngest
import graft.operators.{AsOfJoin, Dedup, EventsOps, MarketStats, Multimodal, Profiling, Relational, Similarity, TextAnalysis, Trends}
import Memo._

/** Multimodal family registration — query lambdas and their
  * DuckDB oracle SQL, split out of SparkEntry (round 11); entries and
  * comments verbatim from the original registration map. */
private[graft] object MultimodalReg {
  // ── Multimodal binary-column plumbing (decode stubbed, see Multimodal) ──
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      Multimodal.sampleFrameStats(Tables.documents(s, dir)))
  )

  def sql: Map[String, String] = Map(
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
        |ORDER BY media_id, chunk_idx""".stripMargin
  )
}
