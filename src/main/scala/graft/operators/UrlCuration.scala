package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL/host curation — the first-stage web-corpus reads a
 * CommonCrawl-style pipeline runs before any content-level dedup:
 * canonicalize raw URLs, roll quality/dup mass up per HOST, and cut
 * blocklisted hosts. (The reference pipeline carries no URL column —
 * `db/clickhouse/init.sql:3-15` is trades only — so like the
 * documents/embeddings tables themselves this family rides a
 * deterministically SEEDED `url` column, `graft.Tables.withUrl`: both
 * engines synthesize the same string from (doc_id, source) arithmetic,
 * the encoding_audit/boilerplate seeding convention, so the oracles pin
 * nonzero canonicalization behavior — mixed-case schemes/hosts,
 * default ports, tracking params, fragments, trailing slashes.)
 *
 * Shape at 100 TB: [[canonUrl]] is a pure per-row projection (scan
 * speed, map-side, whole-stage codegen — regexp/string built-ins
 * only, no UDF); [[hostStats]] is one scan collapsing to a
 * host-cardinality aggregate; [[blocklistFilter]] is a broadcast
 * anti-join (blocklists are thousands of hosts — driver-sized). The
 * per-doc outputs keep doc_id order only for the oracle gate.
 */
object UrlCuration {

  /** Query-param prefixes dropped by canonicalization (the standard
    * tracking set: UTM campaign tags, click ids, referrer tags). */
  val TrackingPrefix = "^(utm_|fbclid=|gclid=|ref=)"

  /** Canonical form of a URL column:
    *  1. strip the fragment (`#...`);
    *  2. split off the query at the first `?`;
    *  3. lowercase scheme+host; strip default ports (`:443` on https,
    *     `:80` on http);
    *  4. path: empty → `/`; trailing `/` stripped (except the root) —
    *     path CASE IS PRESERVED (paths are case-sensitive);
    *  5. drop tracking params ([[TrackingPrefix]]), keep the rest in
    *     their original order; drop an empty `?`.
    * Every step is an engine-portable built-in (no backreference
    * replacements — Spark `$1` vs RE2 `\1` dialects differ), so the
    * DuckDB oracle replays the chain verbatim. */
  def canonUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val qpos = locate("?", noFrag)
    val base = when(qpos > 0, noFrag.substr(lit(1), qpos - 1))
      .otherwise(noFrag)
    val q = when(qpos > 0, noFrag.substr(qpos + 1, length(noFrag)))
      .otherwise(lit(""))
    val sh = lower(regexp_extract(base, "^([a-zA-Z]+://[^/]+)", 1))
    val shp = when(sh.rlike("^https://[^:]+:443$"),
        sh.substr(lit(1), length(sh) - 4))
      .when(sh.rlike("^http://[^:]+:80$"),
        sh.substr(lit(1), length(sh) - 3))
      .otherwise(sh)
    val rp = regexp_extract(base, "^[a-zA-Z]+://[^/]+(/.*)?$", 1)
    val path = when(length(rp) === 0, lit("/"))
      .when(length(rp) > 1 && rp.endsWith("/"),
        rp.substr(lit(1), length(rp) - 1))
      .otherwise(rp)
    val kept = array_join(
      filter(split(q, "&"),
        p => length(p) > 0 && !p.rlike(TrackingPrefix)), "&")
    concat(shp, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Host of a CANONICAL url (lowercase, port-free by construction). */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/]+)", 1)

  /** Gated report: per document, the raw and canonical URL. */
  def canonicalize(docsWithUrl: DataFrame): DataFrame =
    docsWithUrl
      .select(col("doc_id"), col("url"),
        canonUrl(col("url")).as("url_canon"))
      .orderBy(col("doc_id"))

  /** Per-HOST corpus mass + near-dup rate — the crawl-curation read
    * that decides which hosts to throttle or drop: doc count, char
    * mass, docs that belong to a near-dup group (off the one memoized
    * LSH+CC groups prefix — [[Dedup.sourceDupRate]]'s join shape keyed
    * by host instead of source), and the integral micro dup fraction.
    * One scan to a host-cardinality aggregate; the groups relation is
    * the vanishing dup fraction of the corpus, broadcast. */
  def hostStats(docsWithUrl: DataFrame, groups: DataFrame): DataFrame =
    docsWithUrl
      .select(col("doc_id"),
        hostOf(canonUrl(col("url"))).as("host"), col("n_chars"))
      .join(broadcast(groups.select(col("doc_id"), lit(1L).as("is_dup"))),
        Seq("doc_id"), "left")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"),
        sum(coalesce(col("is_dup"), lit(0L))).cast("long").as("n_dup_docs"))
      .select(col("host"), col("n_docs"), col("chars"), col("n_dup_docs"),
        expr("n_dup_docs * 1000000 div n_docs").as("dup_frac_micro"))
      .orderBy(col("host"))

  /** Hosts cut by the default gate — chosen to intersect the seeded
    * url domain so the oracle pins NONZERO filtering. */
  val DefaultBlocklist: Seq[String] = Seq(
    "www.src0.example.com", "www.src1.example.org", "src2.example.net")

  /** Surviving documents after a host blocklist cut — the standard
    * crawl hygiene filter (spam/SEO/adult host lists). The blocklist
    * is driver-sized → broadcast anti-join, map-side at any corpus
    * scale. Emits (doc_id, host) so the decision is auditable. */
  def blocklistFilter(docsWithUrl: DataFrame,
      blocked: Seq[String] = DefaultBlocklist): DataFrame = {
    val s = docsWithUrl.sparkSession
    import s.implicits._
    docsWithUrl
      .select(col("doc_id"), hostOf(canonUrl(col("url"))).as("host"))
      .join(broadcast(blocked.toDF("host")), Seq("host"), "left_anti")
      .select(col("doc_id"), col("host"))
      .orderBy(col("doc_id"))
  }
}
