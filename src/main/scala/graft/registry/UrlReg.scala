package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.UrlCuration
import Memo._

/** URL/host curation family registration — canonicalization, per-host
  * mass/dup stats, and the blocklist cut, over the deterministically
  * seeded `url` column ([[graft.Tables.withUrl]]). The oracle rebuilds
  * the identical url string from the same (doc_id, source) arithmetic
  * and replays the canonicalization chain step for step — regexes are
  * kept backreference-free so the Java and RE2 dialects agree. */
private[graft] object UrlReg {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // raw → canonical url per doc: fragment/port/tracking-param strip,
    // scheme+host lowercase, path normalization — map-side codegen'd
    // string built-ins only
    "url_canonicalize" -> ((s, dir) =>
      UrlCuration.canonicalize(Tables.withUrl(Tables.documents(s, dir)))),
    // per-host doc/char mass + near-dup rate off the one memoized
    // LSH+CC groups prefix (the sourceDupRate shape keyed by host)
    "host_stats" -> ((s, dir) => UrlCuration.hostStats(
      Tables.withUrl(Tables.documents(s, dir)), groupsFor(s, dir, 0.8))),
    // crawl hygiene: surviving docs after the broadcast host blocklist
    // anti-join (blocklist seeded to intersect the url domain)
    "host_blocklist_filter" -> ((s, dir) => UrlCuration.blocklistFilter(
      Tables.withUrl(Tables.documents(s, dir))))
  )

  /** The seeded url build — MUST mirror [[graft.Tables.withUrl]]
    * modulus for modulus; `q` prebuilds the ordered param list. */
  private val urlCte =
    """u AS (
      |  SELECT doc_id, source, n_chars,
      |    (CASE WHEN doc_id % 11 = 0 THEN 'HTTPS' ELSE 'https' END) ||
      |    '://' ||
      |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
      |          WHEN doc_id % 3 = 1 THEN 'www.' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) ||
      |    '.example.' ||
      |    (CASE WHEN doc_id % 4 = 0 THEN 'com'
      |          WHEN doc_id % 4 = 1 THEN 'org'
      |          WHEN doc_id % 4 = 2 THEN 'net' ELSE 'io' END) ||
      |    (CASE WHEN doc_id % 13 = 0 THEN ':443' ELSE '' END) ||
      |    '/P' || (doc_id % 7) || '/doc-' || doc_id ||
      |    (CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END) ||
      |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '#s' || (doc_id % 4)
      |          ELSE '' END) AS url
      |  FROM (
      |    SELECT *, coalesce(array_to_string(list_filter([
      |        CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed' END,
      |        CASE WHEN doc_id % 4 < 2 THEN 'id=' || (doc_id % 50) END,
      |        CASE WHEN doc_id % 5 = 0
      |          THEN 'gclid=g' || (doc_id % 9) END],
      |      x -> x IS NOT NULL), '&'), '') AS q
      |    FROM documents)
      |)""".stripMargin

  /** The canonicalization chain — step-for-step
    * [[graft.operators.UrlCuration.canonUrl]]: strip fragment, split
    * query at the first `?`, lowercase scheme+host, strip default
    * ports, normalize the path, drop tracking params. */
  private val canonCtes =
    s"""$urlCte,
       |s1 AS (SELECT *, regexp_replace(url, '#.*$$', '') AS nf FROM u),
       |s2 AS (SELECT *, strpos(nf, '?') AS qp FROM s1),
       |s3 AS (SELECT *,
       |  CASE WHEN qp > 0 THEN substr(nf, 1, qp - 1) ELSE nf END AS base,
       |  CASE WHEN qp > 0 THEN substr(nf, qp + 1) ELSE '' END AS qs
       |  FROM s2),
       |s4 AS (SELECT *,
       |  lower(regexp_extract(base, '^([a-zA-Z]+://[^/]+)', 1)) AS sh,
       |  regexp_extract(base, '^[a-zA-Z]+://[^/]+(/.*)?$$', 1) AS rp
       |  FROM s3),
       |canon AS (SELECT doc_id, source, n_chars, url,
       |  (CASE WHEN regexp_matches(sh, '^https://[^:]+:443$$')
       |          THEN substr(sh, 1, length(sh) - 4)
       |        WHEN regexp_matches(sh, '^http://[^:]+:80$$')
       |          THEN substr(sh, 1, length(sh) - 3)
       |        ELSE sh END) ||
       |  (CASE WHEN length(rp) = 0 THEN '/'
       |        WHEN length(rp) > 1 AND rp LIKE '%/'
       |          THEN substr(rp, 1, length(rp) - 1)
       |        ELSE rp END) ||
       |  (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS url_canon
       |  FROM (SELECT *, coalesce(array_to_string(
       |      list_filter(string_split(qs, '&'),
       |        x -> len(x) > 0 AND NOT regexp_matches(x,
       |          '^(utm_|fbclid=|gclid=|ref=)')), '&'), '') AS kept
       |    FROM s4)),
       |hosts AS (SELECT doc_id, n_chars,
       |  regexp_extract(url_canon, '^[a-z]+://([^/]+)', 1) AS host
       |  FROM canon)""".stripMargin

  def sql: Map[String, String] = Map(
    "url_canonicalize" ->
      s"""WITH $canonCtes
         |SELECT doc_id, url, url_canon FROM canon
         |ORDER BY doc_id""".stripMargin,
    "host_stats" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |und AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), members AS (SELECT DISTINCT a AS id FROM und),
         |$canonCtes
         |SELECT host, n_docs, chars, n_dup_docs,
         |  CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_frac_micro
         |FROM (
         |  SELECT h.host, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(h.n_chars) AS BIGINT) AS chars,
         |    CAST(sum(CASE WHEN m.id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_dup_docs
         |  FROM hosts h LEFT JOIN members m ON m.id = h.doc_id
         |  GROUP BY 1
         |) ORDER BY host""".stripMargin,
    "host_blocklist_filter" ->
      s"""WITH $canonCtes
         |SELECT doc_id, host FROM hosts
         |WHERE host NOT IN ('www.src0.example.com',
         |  'www.src1.example.org', 'src2.example.net')
         |ORDER BY doc_id""".stripMargin
  )
}
