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

  /** Query-param CENSUS over the raw urls — the observability read
    * behind the canonicalizer's drop list: per param key, whether the
    * tracking rule fires and how many urls carry it (how much tracking
    * pollution the crawl carries, and which non-tracking keys dominate
    * — candidates for the next drop-list review). One map-side explode
    * of the param lists to a key-cardinality aggregate. */
  def paramCensus(docsWithUrl: DataFrame): DataFrame = {
    val noFrag = regexp_replace(col("url"), "#.*$", "")
    val qpos = locate("?", noFrag)
    val q = when(qpos > 0, noFrag.substr(qpos + 1, length(noFrag)))
      .otherwise(lit(""))
    docsWithUrl
      .select(explode(filter(split(q, "&"),
        p => length(p) > 0)).as("p"))
      .select(
        when(locate("=", col("p")) > 0,
          col("p").substr(lit(1), locate("=", col("p")) - 1))
          .otherwise(col("p")).as("param_key"),
        when(col("p").rlike(TrackingPrefix), 1L).otherwise(0L)
          .as("is_tracking"))
      .groupBy(col("param_key"), col("is_tracking"))
      .agg(count(lit(1)).as("n_urls"))
      .orderBy(col("param_key"), col("is_tracking"))
  }

  /** Registered domain of a canonical host — the `www.` strip is the
    * rollup heuristic appropriate to the seeded url shape (a real
    * deployment swaps in a public-suffix list without touching the
    * rollup below). */
  def domainOf(host: Column): Column =
    regexp_replace(host, "^www\\.", "")

  /** Per-HOST census: doc count + char mass per canonical host — the
    * sum-mergeable relation under [[domainRollupFrom]], shared verbatim
    * by the standing streaming twin ([[graft.streaming
    * .StreamDomainRollup]]) so streamed ≡ batch by construction. */
  def hostCensus(docsWithUrl: DataFrame): DataFrame =
    docsWithUrl
      .select(hostOf(canonUrl(col("url"))).as("host"), col("n_chars"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars"))

  /** Domain readout over a (host, n_docs, chars) census — each census
    * row IS one host, so the fan-out is a plain count and no
    * countDistinct Expand ever runs. */
  def domainRollupFrom(census: DataFrame): DataFrame =
    census
      .withColumn("domain", domainOf(col("host")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_hosts"),
        sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("chars")).cast("long").as("chars"))
      .orderBy(col("domain"))

  /** Registered-DOMAIN rollup of the host census — the crawl-hierarchy
    * read above [[hostStats]]: per domain, its host fan-out, doc count
    * and char mass. One scan to a host-cardinality census, then a
    * census-sized domain aggregate. */
  def domainRollup(docsWithUrl: DataFrame): DataFrame =
    domainRollupFrom(hostCensus(docsWithUrl))

  /** MIRROR-SITE detection — host pairs serving the same exact content:
    * per host the distinct content digests (md5 of the text — ids and
    * digests only, text never crosses a shuffle), digests carried by
    * more than `maxHosts` hosts cut first (site-chrome/boilerplate
    * pages would otherwise fan out quadratically — the hot-shingle df
    * guard of the minhash family; at 100 TB the census is write-time
    * state like ChunkStore's), then a digest-keyed self-join counts the
    * shared distinct digests per host pair and scores containment
    * against the smaller side. The standard crawl-dedup planning read:
    * a high-containment pair means one host is a mirror and its docs
    * can be dropped wholesale before any content-level pass. */
  def mirrorHosts(docsWithUrl: DataFrame, maxHosts: Int = 8): DataFrame = {
    val hd = docsWithUrl
      .select(hostOf(canonUrl(col("url"))).as("host"),
        md5(col("text")).as("dig"))
      .distinct()
    val hot = hd.groupBy(col("dig"))
      .agg(count(lit(1)).as("nh")).filter(col("nh") > maxHosts)
      .select(col("dig"))
    // the cut census feeds THREE consumers (both self-join sides + the
    // per-host denominators) — materialize once so the md5/canon scan
    // and the distinct don't run three times (knn_directed precedent)
    val cut = graft.plans.PlanTrace.cp(
      hd.join(broadcast(hot), Seq("dig"), "left_anti"),
      tag = "mirror_cut")
    val perHost = cut.groupBy(col("host")).agg(count(lit(1)).as("n_digs"))
    cut.as("a").join(cut.as("b"),
        col("a.dig") === col("b.dig") && col("a.host") < col("b.host"))
      .select(col("a.host").as("host_a"), col("b.host").as("host_b"))
      .groupBy(col("host_a"), col("host_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(perHost.select(col("host").as("host_a"),
        col("n_digs").as("n_a"))), "host_a")
      .join(broadcast(perHost.select(col("host").as("host_b"),
        col("n_digs").as("n_b"))), "host_b")
      .select(col("host_a"), col("host_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("n_shared * 1000000 div least(n_a, n_b)")
          .as("containment_micro"))
      .orderBy(col("host_a"), col("host_b"))
  }

  /** Per-HOST document cap — the crawl-curation quota that stops any
    * single host from dominating the corpus (the per-domain cap every
    * CommonCrawl-derived pipeline applies before content-level work):
    * keep at most `cap` documents per canonical host, selected by the
    * portable h60 of doc_id (a deterministic uniform subsample — both
    * engines draw the SAME survivors), doc_id tiebreak. Ranking rides
    * the bounded-heap [[graft.functions.TopKRows]]: ≤ cap rows per
    * host × partition cross the shuffle, nothing per-host sorted — at
    * 100 TB a hot host is exactly the case where a rank window would
    * single-task. Output: (host, rk, doc_id) survivors. */
  def hostCapSample(docsWithUrl: DataFrame, cap: Int = 2): DataFrame = {
    import graft.functions.PortableHash.h60
    import graft.functions.TopKRows.topk_rows
    docsWithUrl
      .select(hostOf(canonUrl(col("url"))).as("host"), col("doc_id"))
      // heap keeps (score DESC, id ASC); negate h60 for hash-ASC order —
      // h60 ∈ [0, 2^60), so negation can't hit the Long.MinValue edge
      .groupBy(col("host"))
      .agg(topk_rows(-h60(col("doc_id").cast("string")), col("doc_id"), cap)
        .as("top"))
      .select(col("host"), posexplode(col("top")))
      .select(col("host"), (col("pos") + 1).as("rk"),
        col("col.id").as("doc_id"))
      .orderBy(col("host"), col("rk"))
  }

  /** Canonical-URL dedup — the recrawl collapse that runs before any
    * content-level dedup: documents whose urls CANONICALIZE to the same
    * string are the same page fetched twice (tracking params, fragment,
    * case, default port — [[canonUrl]]'s whole drop list), so each
    * group keeps one representative (max n_chars — the fullest fetch —
    * tie to min doc_id; the house min-struct election) and reports the
    * collapsed mass. One scan to a url-cardinality aggregate; only
    * groups that actually collide are emitted. */
  def urlDedup(docsWithUrl: DataFrame): DataFrame =
    urlDedupFrom(urlDedupCensusRaw(docsWithUrl))

  /** UNthresholded per-canonical-url census (url_canon, n_dups, kept
    * struct, total_chars) — the STANDING state under [[urlDedup]]:
    * count and sum are sum-mergeable and the fullest-fetch keeper
    * election min(struct(−n_chars, doc_id)) is min-mergeable, so the
    * streaming twin ([[graft.streaming.StreamUrlDedup]]) folds
    * per-batch censuses by exactly this merge and the fold is
    * order-free. */
  def urlDedupCensusRaw(docsWithUrl: DataFrame): DataFrame =
    docsWithUrl
      .select(canonUrl(col("url")).as("url_canon"), col("doc_id"),
        col("n_chars"))
      .groupBy(col("url_canon"))
      .agg(count(lit(1)).as("n_dups"),
        min(struct((-col("n_chars")).as("neg"), col("doc_id").as("id")))
          .as("kept"),
        sum(col("n_chars")).cast("long").as("total_chars"))

  /** Threshold readout over a (folded or one-shot) raw census — the
    * batch/streaming-shared half of [[urlDedup]]. */
  def urlDedupFrom(raw: DataFrame): DataFrame =
    raw
      .filter(col("n_dups") > 1)
      .select(col("url_canon"), col("n_dups"),
        col("kept.id").as("kept_doc_id"),
        (col("total_chars") + col("kept.neg")).cast("long")
          .as("chars_dropped"))
      .orderBy(col("url_canon"))

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
