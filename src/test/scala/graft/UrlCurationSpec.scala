package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlCuration

/** URL/host curation: canonicalization rules pinned case by case, the
  * seeded url column exercises every rule, stats/blocklist shapes. */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlCuration.canonUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonUrl: each normalization rule, pinned") {
    assert(canon(
      // scheme+host lowercase; path case preserved
      "HTTPS://WWW.Ex.COM/Path",
      // default https port stripped; non-default kept
      "https://ex.com:443/a", "https://ex.com:8443/a",
      // default http port stripped
      "http://ex.com:80/a",
      // fragment stripped
      "https://ex.com/a#sec2",
      // tracking params dropped, real ones kept in order
      "https://ex.com/a?utm_source=x&id=3&gclid=g7&page=2",
      // all-tracking query → no '?'
      "https://ex.com/a?utm_campaign=c",
      // empty path → '/', trailing slash stripped (except root)
      "https://ex.com", "https://ex.com/", "https://ex.com/a/b/",
      // ref= is tracking; refresh= is NOT (prefix must include '=')
      "https://ex.com/a?ref=r&refresh=1"
    ) == Seq(
      "https://www.ex.com/Path",
      "https://ex.com/a", "https://ex.com:8443/a",
      "http://ex.com/a",
      "https://ex.com/a",
      "https://ex.com/a?id=3&page=2",
      "https://ex.com/a",
      "https://ex.com/", "https://ex.com/", "https://ex.com/a/b",
      "https://ex.com/a?refresh=1"))
  }

  test("seeded url column: deterministic, and every rule fires somewhere") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val urls = docs.select(col("url")).as[String].collect()
    assert(urls.length == docs.count())
    assert(urls.exists(_.startsWith("HTTPS://")), "mixed-case scheme seeded")
    assert(urls.exists(_.contains(":443/")), "default port seeded")
    assert(urls.exists(_.contains("utm_source=")), "tracking param seeded")
    assert(urls.exists(_.contains("#s")), "fragment seeded")
    assert(urls.exists(u => u.takeWhile(_ != '?').takeWhile(_ != '#')
      .endsWith("/")), "trailing slash seeded")
    // canonical output is clean of all of it
    val canons = docs.select(UrlCuration.canonUrl(col("url")).as("c"))
      .as[String].collect()
    assert(canons.forall(_.startsWith("https://")))
    assert(canons.forall(c => !c.contains(":443")))
    assert(canons.forall(c => !c.contains("utm_") && !c.contains("gclid")))
    assert(canons.forall(c => !c.contains("#")))
    assert(canons.exists(_.contains("?id=")), "real params survive")
  }

  test("hostStats masses add up; blocklist cuts exactly the listed hosts") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val stats = UrlCuration.hostStats(docs,
      graft.operators.Dedup.dedupGroups(Tables.documents(spark, sf0001), 0.8))
    val total = stats.agg(sum(col("n_docs"))).as[Long].head()
    assert(total == docs.count(), "every doc lands in exactly one host")
    assert(stats.filter(col("n_dup_docs") > col("n_docs")).count() == 0)
    assert(stats.filter(col("dup_frac_micro") > 1000000L).count() == 0)

    val kept = UrlCuration.blocklistFilter(docs)
    val cutHosts = docs
      .select(UrlCuration.hostOf(
        UrlCuration.canonUrl(col("url"))).as("host"))
      .filter(col("host").isin(UrlCuration.DefaultBlocklist: _*))
    assert(cutHosts.count() > 0, "seeded blocklist must intersect the corpus")
    assert(kept.count() == docs.count() - cutHosts.count())
    assert(kept.filter(col("host")
      .isin(UrlCuration.DefaultBlocklist: _*)).count() == 0)
  }

  test("domainRollup: www-variants fold into one domain, masses conserved") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val roll = UrlCuration.domainRollup(docs)
    assert(roll.agg(sum(col("n_docs"))).as[Long].head() == docs.count())
    assert(roll.agg(sum(col("chars"))).as[Long].head() ==
      docs.agg(sum(col("n_chars"))).as[Long].head())
    // the seeded subdomain variants (WWW./www./bare) collapse: some
    // domain must aggregate more than one host
    assert(roll.filter(col("n_hosts") > 1).count() > 0)
    assert(roll.filter(col("domain").startsWith("www.")).count() == 0)
  }

  test("mirrorHosts: shared digests counted per pair; hot digests cut") {
    val rows =
      // hostA and hostB share 2 of hostB's 3 pages → containment 2/3
      Seq(("https://a.ex/1", "x"), ("https://a.ex/2", "y"),
        ("https://a.ex/3", "za"), ("https://b.ex/1", "x"),
        ("https://b.ex/2", "y"), ("https://b.ex/3", "zb")) ++
      // a chrome page served by 10 hosts — above maxHosts=8, must not
      // produce 45 pairs
      (1 to 10).map(i => (s"https://c$i.ex/chrome", "hot page"))
    val docs = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t, t.length.toLong) }
      .toDF("doc_id", "url", "text", "n_chars")
    val got = UrlCuration.mirrorHosts(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSeq
    assert(got == Seq(("a.ex", "b.ex", 2L, 666666L)),
      s"got $got — the hot chrome digest must be cut entirely")
  }

  test("ingestNoveltyKmv: identical sides → novelty 0; disjoint → 1e6") {
    val mk = (tag: String, n: Int) => (0 until n).map(i =>
      s"$tag alpha bravo charlie delta echo foxtrot $tag$i golf hotel india")
    val a = mk("one", 6).toDF("text")
    val b = mk("one", 6).toDF("text")
    val same = graft.operators.Dedup.ingestNoveltyKmv(a, b).collect()(0)
    assert(same.getLong(4) == 0L, s"identical corpora: $same")
    assert(same.getLong(5) == 1000000L)
    val c = mk("two", 6).toDF("text")
    val disj = graft.operators.Dedup.ingestNoveltyKmv(a, c).collect()(0)
    // shingle sets share the common filler runs, so novelty is high
    // but not total; the disjoint-marker check is the ordering
    assert(disj.getLong(4) > same.getLong(4))
    val fullyDisj = graft.operators.Dedup.ingestNoveltyKmv(
      Seq("aa bb cc dd ee").toDF("text"),
      Seq("ff gg hh ii jj").toDF("text")).collect()(0)
    assert(fullyDisj.getLong(4) == 1000000L && fullyDisj.getLong(3) == 0L)
  }

  test("hostCapSample: cap binds per host, h60 order, window-free plan") {
    import graft.functions.PortableHash
    val docs = Seq(
      // 4 docs on one host, 1 on another — cap 2 keeps 2 + 1
      (1L, "https://a.ex.com/p1"), (2L, "https://A.EX.com/p2"),
      (3L, "https://a.ex.com/p3"), (4L, "https://a.ex.com/p4"),
      (9L, "https://b.ex.com/q")
    ).toDF("doc_id", "url")
    val df = UrlCuration.hostCapSample(docs, cap = 2)
    val got = df.collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("a.ex.com", "a.ex.com", "b.ex.com"))
    // survivors = the 2 smallest h60(doc_id) on the hot host, hash order
    val expect = Seq(1L, 2L, 3L, 4L)
      .sortBy(d => (PortableHash.h60String(d.toString), d)).take(2)
    assert(got.take(2).map(_.getLong(2)).toSeq == expect)
    assert(got.take(2).map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the per-host rank must be the bounded heap, not a sort window")
  }

  test("urlDedup: canonical collapse, fullest-fetch election, dropped mass") {
    val docs = Seq(
      // one page fetched 3 ways — canonicalization collapses all three
      (1L, "https://ex.com/a?utm_source=x", 100),
      (2L, "HTTPS://EX.com:443/a#frag", 300),
      (3L, "https://ex.com/a/", 300), // chars tie with 2 → min id kept
      // a singleton — never emitted
      (7L, "https://ex.com/solo", 50)
    ).toDF("doc_id", "url", "n_chars")
    val got = UrlCuration.urlDedup(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "https://ex.com/a")
    assert(r.getLong(1) == 3L)      // n_dups
    assert(r.getLong(2) == 2L)      // max chars, tie → min doc_id
    assert(r.getLong(3) == 400L)    // 100 + 300 dropped
  }

  test("host rollups prune the text column from the scan") {
    // url derives from (doc_id, source) arithmetic, so every rollup
    // that doesn't digest content must leave `text` out of ReadSchema —
    // at 100 TB text IS the table; scanning it for a host count would
    // be a ~100× IO regression
    for ((name, df) <- Seq(
        "host_gini" -> SparkEntry.queries("host_gini")(spark, sf0001),
        "domain_rollup" -> SparkEntry.queries("domain_rollup")(spark, sf0001),
        "url_param_census" ->
          SparkEntry.queries("url_param_census")(spark, sf0001),
        "host_cap_sample" ->
          SparkEntry.queries("host_cap_sample")(spark, sf0001),
        "url_dedup" -> SparkEntry.queries("url_dedup")(spark, sf0001))) {
      // AQE wraps shuffling plans in AdaptiveSparkPlanExec (a leaf to
      // collect()), so probe the plan STRING's ReadSchema lines instead
      val schemas = df.queryExecution.executedPlan.toString
        .linesIterator.flatMap { l =>
          val i = l.indexOf("ReadSchema: ")
          if (i >= 0) Some(l.substring(i + "ReadSchema: ".length)) else None
        }.toList
      assert(schemas.nonEmpty, s"$name: no file scan found")
      assert(schemas.forall(!_.contains("text:")),
        s"$name reads text: $schemas")
    }
  }

  test("canonUrl plan: codegen'd built-ins only — no UDF, no shuffle") {
    val docs = Tables.withUrl(Tables.documents(spark, sf0001))
    val plan = UrlCuration.canonicalize(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "canonicalization must stay inside whole-stage codegen")
  }
}
