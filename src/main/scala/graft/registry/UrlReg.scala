package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Profiling, UrlCuration}
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
      Tables.withUrl(Tables.documents(s, dir)))),
    // host-level concentration — the giniFrom shared core over per-host
    // char mass (the "is one host the corpus" read above source_gini)
    "host_gini" -> ((s, dir) => Profiling.giniFrom(
      Tables.withUrl(Tables.documents(s, dir))
        .select(UrlCuration.hostOf(
          UrlCuration.canonUrl(col("url"))).as("k"), col("n_chars"))
        .groupBy(col("k"))
        .agg(sum(col("n_chars")).cast("long").as("cnt")))),
    // registered-domain rollup: host fan-out + doc/char mass per domain
    "domain_rollup" -> ((s, dir) => UrlCuration.domainRollup(
      Tables.withUrl(Tables.documents(s, dir)))),
    // query-param census: tracking pollution + dominant real keys
    "url_param_census" -> ((s, dir) => UrlCuration.paramCensus(
      Tables.withUrl(Tables.documents(s, dir)))),
    // mirror-site detection: host pairs sharing exact content digests.
    // The corpus has NO exact cross-doc dup texts (dedup_exact: zero
    // dup digests), so the gate SEEDS mirrored pages deterministically
    // in both engines — the doc_id mod-37 cohort serves one of five
    // template variants (the boilerplate/encoding seeding precedent;
    // ≤3 hosts per variant, safely under the hot-digest df cut) — so
    // the oracle pins NONZERO mirror detection, not vacuous parity.
    "mirror_hosts" -> ((s, dir) => UrlCuration.mirrorHosts(
      decorateMirror(Tables.withUrl(Tables.documents(s, dir))))),
    // per-host document cap: deterministic h60-ranked survivors, ≤ 2
    // per canonical host (bounded heap — no per-host sort window)
    "host_cap_sample" -> ((s, dir) => UrlCuration.hostCapSample(
      Tables.withUrl(Tables.documents(s, dir)))),
    // canonical-URL recrawl collapse. The seeded urls embed doc_id in
    // the path (no natural collisions), so the gate SEEDS a recrawl
    // cohort deterministically in both engines — doc_id mod-11 docs
    // share one landing page per source, with scheme case / WWW / :443
    // / tracking params / fragments varying WITHIN the cohort so the
    // collapse exercises every canonicalization rule, not string
    // equality (the mirror_hosts seeding precedent).
    "url_dedup" -> ((s, dir) => UrlCuration.urlDedup(
      decorateRecrawl(Tables.withUrl(Tables.documents(s, dir)))))
  )

  /** Deterministic mirrored-page seeding under the mirror_hosts gate —
    * oracle twin is the `dec` CTE in its SQL. */
  private def decorateMirror(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.withColumn("text",
      when(pmod(col("doc_id"), lit(37)) === 5,
        concat(lit("mirrored landing page content variant "),
          (col("doc_id") % 5).cast("string")))
        .otherwise(col("text")))

  /** Deterministic recrawl seeding under the url_dedup gate: mod-11
    * cohort docs share ONE landing page per source, with every
    * canonicalization-rule dimension (scheme case, WWW, default port,
    * tracking param, fragment) varying across cohort members so the
    * collapse is canonical-equality, not raw string equality. Oracle
    * twin is the `dec` CTE in the url_dedup SQL. */
  private def decorateRecrawl(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val d = col("doc_id")
    docs.withColumn("url",
      when(pmod(d, lit(11)) === 4,
        concat(
          when(d % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
          lit("://"),
          when(d % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
          col("source"), lit(".example.com"),
          when(d % 7 === 0, lit(":443")).otherwise(lit("")),
          lit("/shared/landing"),
          when(d % 2 === 0, lit("?utm_source=recrawl")).otherwise(lit("")),
          when(d % 3 === 1, concat(lit("#f"), (d % 4).cast("string")))
            .otherwise(lit(""))))
        .otherwise(col("url")))
  }

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
  private val canonCtes = s"$urlCte,\n${canonChain("u")}"

  /** The s1..hosts chain reading urls from CTE `src` — split out so the
    * url_dedup gate can replay it over its decorated `dec` relation. */
  private def canonChain(src: String): String =
    s"""s1 AS (SELECT *, regexp_replace(url, '#.*$$', '') AS nf FROM $src),
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
         |ORDER BY doc_id""".stripMargin,
    // host-mass Gini: the user_gini rank-identity oracle over per-host
    // char sums (HUGEINT mirror of the Spark DECIMAL(38,0) widening)
    "host_gini" ->
      s"""WITH $canonCtes,
         |c AS (
         |  SELECT host AS k, CAST(sum(n_chars) AS BIGINT) AS cnt
         |  FROM hosts GROUP BY 1
         |), r AS (
         |  SELECT cnt,
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
    "url_param_census" ->
      s"""WITH $urlCte,
         |s1 AS (SELECT regexp_replace(url, '#.*$$', '') AS nf FROM u),
         |s2 AS (SELECT nf, strpos(nf, '?') AS qp FROM s1),
         |qs AS (SELECT CASE WHEN qp > 0 THEN substr(nf, qp + 1)
         |  ELSE '' END AS q FROM s2),
         |pars AS (SELECT unnest(list_filter(string_split(q, '&'),
         |  x -> len(x) > 0)) AS p FROM qs)
         |SELECT
         |  CASE WHEN strpos(p, '=') > 0
         |    THEN substr(p, 1, strpos(p, '=') - 1) ELSE p END
         |    AS param_key,
         |  CAST(CASE WHEN regexp_matches(p,
         |    '^(utm_|fbclid=|gclid=|ref=)') THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_tracking,
         |  CAST(count(*) AS BIGINT) AS n_urls
         |FROM pars GROUP BY 1, 2
         |ORDER BY param_key, is_tracking""".stripMargin,
    "domain_rollup" ->
      s"""WITH $canonCtes
         |SELECT regexp_replace(host, '^www\\.', '') AS domain,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM hosts GROUP BY 1 ORDER BY domain""".stripMargin,
    "mirror_hosts" ->
      s"""WITH $canonCtes,
         |dec AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 37 = 5
         |      THEN 'mirrored landing page content variant '
         |        || (doc_id % 5)
         |      ELSE text END AS text
         |  FROM documents
         |), hd AS (
         |  SELECT DISTINCT h.host, md5(d.text) AS dig
         |  FROM hosts h JOIN dec d ON d.doc_id = h.doc_id
         |), hot AS (
         |  SELECT dig FROM hd GROUP BY dig HAVING count(*) > 8
         |), cut AS (
         |  SELECT host, dig FROM hd
         |  WHERE dig NOT IN (SELECT dig FROM hot)
         |), per_host AS (
         |  SELECT host, CAST(count(*) AS BIGINT) AS n_digs
         |  FROM cut GROUP BY 1
         |), shared AS (
         |  SELECT a.host AS host_a, b.host AS host_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM cut a JOIN cut b
         |    ON a.dig = b.dig AND a.host < b.host
         |  GROUP BY 1, 2
         |)
         |SELECT s.host_a, s.host_b, s.n_shared,
         |  pa.n_digs AS n_a, pb.n_digs AS n_b,
         |  CAST(s.n_shared * 1000000
         |    // least(pa.n_digs, pb.n_digs) AS BIGINT)
         |    AS containment_micro
         |FROM shared s
         |JOIN per_host pa ON pa.host = s.host_a
         |JOIN per_host pb ON pb.host = s.host_b
         |ORDER BY s.host_a, s.host_b""".stripMargin,
    // per-host cap: h60-ranked survivors, rank window mirrors the
    // bounded heap's (h60 ASC, doc_id ASC) order exactly
    "host_cap_sample" ->
      s"""WITH $canonCtes,
         |rk AS (
         |  SELECT host, doc_id, row_number() OVER (
         |    PARTITION BY host ORDER BY
         |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |        ::BIGINT, doc_id) AS rk
         |  FROM hosts
         |)
         |SELECT host, rk, doc_id FROM rk WHERE rk <= 2
         |ORDER BY host, rk""".stripMargin,
    // recrawl collapse: the seeded dec cohort (one landing page per
    // source; scheme case / WWW / :443 / utm / fragment vary within the
    // cohort), then the canonicalization chain replayed over dec and a
    // per-canonical-url election (n_chars DESC, doc_id ASC)
    "url_dedup" ->
      s"""WITH $urlCte,
         |dec AS (
         |  SELECT doc_id, source, n_chars,
         |    CASE WHEN doc_id % 11 = 4 THEN
         |      (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
         |      || '://' ||
         |      (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END)
         |      || source || '.example.com' ||
         |      (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
         |      '/shared/landing' ||
         |      (CASE WHEN doc_id % 2 = 0
         |        THEN '?utm_source=recrawl' ELSE '' END) ||
         |      (CASE WHEN doc_id % 3 = 1
         |        THEN '#f' || (doc_id % 4) ELSE '' END)
         |    ELSE url END AS url
         |  FROM u
         |),
         |${canonChain("dec")},
         |g AS (
         |  SELECT url_canon, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY url_canon
         |      ORDER BY n_chars DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY url_canon) AS cnt,
         |    sum(n_chars) OVER (PARTITION BY url_canon) AS tot
         |  FROM canon
         |)
         |SELECT url_canon, CAST(cnt AS BIGINT) AS n_dups,
         |  doc_id AS kept_doc_id,
         |  CAST(tot - n_chars AS BIGINT) AS chars_dropped
         |FROM g WHERE rn = 1 AND cnt > 1
         |ORDER BY url_canon""".stripMargin
  )
}
