package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Properties of the deterministic sampling/packing operators (their exact
  * values are oracle-gated; these are the structural invariants). */
class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic and a subset of the corpus") {
    val d = Tables.documents(spark, sf0001)
    val a = Sampling.hashSample(d).collect().map(_.getLong(0)).toSeq
    val b = Sampling.hashSample(d.repartition(7)).collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample changed under repartitioning")
    assert(a.nonEmpty && a.length < 500)
  }

  test("stratified sample: per-stratum rates, repartition-invariant, map-side") {
    val d = Tables.documents(spark, sf0001)
    val s = Sampling.stratifiedSample(d,
      permille = Map("en" -> 100, "de" -> 500))
    val rows = s.collect()
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("en", "de")),
      "default-zero strata must be absent")
    val b = Sampling.stratifiedSample(d.repartition(7),
      permille = Map("en" -> 100, "de" -> 500)).collect()
    assert(rows.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "selection changed under repartitioning")
    // the rate lookup must stay a scan-side filter: no hash-partitioned
    // shuffle anywhere (the final orderBy's range partitioning is the only
    // exchange the operator is allowed)
    val phys = s.queryExecution.executedPlan.toString
    assert(!phys.contains("hashpartitioning"),
      "stratified sample must not shuffle on any key")
    assert(!phys.contains("Join"), "rate lookup must not plan as a join")
  }

  test("source quota never exceeds the cap and keeps lowest ids") {
    val got = Sampling.sourceQuota(Tables.documents(spark, sf0001), quota = 10)
      .collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 10))
    assert(got.forall(_.getAs[Int]("rank_in_source") <= 10))
  }

  test("sequence packing: offsets stay under budget, layout is gap-free per shard") {
    val budget = 512L
    val got = Sampling.packSequences(Tables.documents(spark, sf0001),
      budgetTokens = budget).collect()
    assert(got.length == 500)
    got.foreach { r =>
      assert(r.getAs[Long]("offset_in_seq") >= 0 &&
        r.getAs[Long]("offset_in_seq") < budget)
    }
    // within a shard, walking docs in id order reproduces the offsets:
    // each doc starts exactly where the previous one ended (mod budget)
    got.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("offset_in_seq") == cum % budget,
          s"gap in shard $shard at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_id") == (shard << 40) + cum / budget)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("epochOrder: per-epoch permutation of all sequences, deterministic, epochs differ") {
    val docs = Tables.documents(spark, sf0001)
    val seqIds = Sampling.packSequences(docs).collect()
      .map(_.getAs[Long]("seq_id")).toSet
    val got = Sampling.epochOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rows) =>
      // each epoch is a 1..n-contiguous PERMUTATION of every sequence
      assert(rows.map(_._3).toSet == seqIds, s"epoch $e drops sequences")
      assert(rows.map(_._2).sorted.toSeq == (1L to seqIds.size).toSeq,
        s"epoch $e positions not contiguous")
    }
    // the epoch term in the key reshuffles: no two epochs share an order
    val orders = byEpoch.view.mapValues(
      _.sortBy(_._2).map(_._3).toSeq).toMap
    assert(orders(0L) != orders(1L) && orders(1L) != orders(2L))
    // fixed seed ⇒ bit-identical rerun (the replayability contract)
    val again = Sampling.epochOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("mixOrder: copy mass realizes the allocation plan; order deterministic, contiguous") {
    val docs = Tables.documents(spark, sf0001)
    val alloc = Sampling.epochAllocate(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(5))).toMap
    val got = Sampling.mixOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // global positions are a contiguous 1..N
    assert(got.map(_._1).sorted.toSeq == (1L to got.length).toSeq)
    // per-source copy mass = floor(epochs)·n_docs + the exact
    // fractional-epoch quota — the doc-level rendering of the plan
    val srcOf = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val copiesBySrc = got.groupBy(x => srcOf(x._2))
      .view.mapValues(_.length.toLong).toMap
    alloc.foreach { case (s, (nDocs, em)) =>
      val want = (em / 1000000L) * nDocs + (em % 1000000L) * nDocs / 1000000L
      assert(copiesBySrc.getOrElse(s, 0L) == want,
        s"source $s: ${copiesBySrc.getOrElse(s, 0L)} copies, want $want")
    }
    // fixed seed ⇒ bit-identical rerun
    val again = Sampling.mixOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("temperature mix: targets sum to budget exactly and flatten the source skew") {
    val d = Tables.documents(spark, sf0001)
    val budget = 200L
    val got = Sampling.temperatureMix(d, budget).collect()
    assert(got.length == budget, s"selected ${got.length}, budget $budget")
    // per-source selection respects the target and is hash-prefix-shaped
    val bySource = got.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { rows =>
      val target = rows.head.getAs[Long]("target")
      assert(rows.length == math.min(target,
        rows.length).toInt && rows.length <= target)
      assert(rows.map(_.getAs[Long]("pick_rank")).sorted.toSeq ==
        (1L to rows.length.toLong).toSeq)
    }
    // α = 0.5 flattening: the selected share of every smaller source is at
    // least its corpus share (sqrt weighting can only up-weight the small)
    val corpus = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = corpus.values.sum.toDouble
    val biggest = corpus.maxBy(_._2)._1
    corpus.keys.filter(_ != biggest).foreach { s =>
      val sel = bySource.get(s).map(_.length).getOrElse(0).toDouble
      assert(sel / budget >= corpus(s) / total - 1e-9,
        s"small source $s under-represented vs proportional")
    }
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(d.repartition(7), budget).collect()
      .map(r => r.getLong(0)).sorted.toSeq
    assert(again == got.map(_.getLong(0)).sorted.toSeq)
  }

  test("temperature mix waterfall: saturated sources cap at capacity, surplus re-shares") {
    import spark.implicits._
    // √-upweighting (weights big=20, mid=4, tiny=1; wsum=25) hands "tiny"
    // (1 doc) a provisional target of 5 and "mid" (20 docs) 21 — both over
    // capacity, so both cap and "big" absorbs the re-shared surplus
    // (130 − 20 − 1 = 109 ≤ 400).
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (1001L to 1020L).map(i => (i, "mid")) ++ Seq((2001L, "tiny")))
      .toDF("doc_id", "source")
    val budget = 130L
    val got = Sampling.temperatureMix(docs, budget).collect()
    assert(got.length == budget, s"selected ${got.length}, budget $budget")
    val bySource = got.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(bySource("tiny") == 1, "saturated source must be fully selected")
    assert(bySource("mid") == 20, "cascade-saturated source must cap at capacity")
    assert(bySource("big") == 109, "big absorbs the re-shared surplus")
    got.foreach { r =>
      assert(r.getAs[Long]("target") <=
        Map("big" -> 400L, "mid" -> 20L, "tiny" -> 1L)(r.getAs[String]("source")))
    }
    // budget beyond total capacity: everything is selected, no more
    val over = Sampling.temperatureMix(docs, budget = 10000L).collect()
    assert(over.length == 421, "over-capacity budget selects the whole corpus")
  }

  test("sequence spans partition each doc and fill every non-final sequence") {
    val budget = 512L
    val d = Tables.documents(spark, sf0001)
    val spans = Sampling.packSequenceSpans(d, budgetTokens = budget).collect()
    val nTokens = Sampling.packSequences(d, budgetTokens = budget).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap

    // per doc: spans are contiguous [0, n_tokens) in consecutive sequences
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("seq_id"))
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
      assert(sorted.last.getAs[Long]("end_tok") == nTokens(id))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_tok") == b.getAs[Long]("start_tok"),
            s"gap inside doc $id")
          assert(a.getAs[Long]("seq_id") + 1 == b.getAs[Long]("seq_id"))
        case _ => ()
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("end_tok") - r.getAs[Long]("start_tok") <= budget)
      }
    }
    // empty docs occupy no span; all other docs appear
    assert(spans.map(_.getAs[Long]("doc_id")).toSet ==
      nTokens.filter(_._2 > 0).keySet)

    // per sequence: every sequence except each shard's last holds exactly
    // `budget` tokens
    val bySeq = spans.groupBy(_.getAs[Long]("seq_id")).map { case (s, rows) =>
      s -> rows.map(r => r.getAs[Long]("end_tok") - r.getAs[Long]("start_tok")).sum
    }
    val lastPerShard = bySeq.keys.groupBy(_ >> 40).values.map(_.max).toSet
    bySeq.foreach { case (s, tot) =>
      if (lastPerShard(s)) assert(tot <= budget)
      else assert(tot == budget, s"non-final sequence $s holds $tot tokens")
    }
  }

  test("shardManifest: fingerprint is partitioning-invariant, doc-swap-sensitive") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val base = Sampling.shardManifest(docs).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("fingerprint")).toMap
    // XOR combine: any partitioning/task order yields the same manifest
    val rep = Sampling.shardManifest(docs.repartition(7, col("source")))
      .collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("fingerprint")).toMap
    assert(base == rep)
    // two docs exchanging texts preserves the bag of content hashes but
    // must CHANGE the manifest — the (id, content) pairing is hashed
    val ids = docs.select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    val t = docs.filter(col("doc_id").isin(ids: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val swapped = docs.withColumn("text",
      when(col("doc_id") === ids(0), lit(t(ids(1))))
        .when(col("doc_id") === ids(1), lit(t(ids(0))))
        .otherwise(col("text")))
    val sw = Sampling.shardManifest(swapped).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("fingerprint")).toMap
    assert(base != sw, "doc swap must change at least one shard fingerprint")
  }

  test("epochAllocate: caps respected, budget conserved, two-round spec on a hand case") {
    import graft.operators.Sampling
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rep = Sampling.epochAllocate(docs).collect()
    rep.foreach { r =>
      assert(r.getAs[Long]("alloc_chars") <= r.getAs[Long]("capacity"))
      assert(r.getAs[Long]("alloc_chars") >= 0L)
    }
    // hand case: 3 sources, budget forces saturation + one redistribution.
    // chars: a=100 (cap 200, w 10), b=10000 (cap 20000, w 100),
    // c=40000 (cap 80000, w 200); budget 30000 → B=30000, wsum=310.
    // r1: a=967(+rem), b=9677, c=19354 (+2 largest remainders). Exact:
    // fl: a=30000*10/310=967 rem 230/…; compute via the same arithmetic:
    val w = Seq(("a", 10L), ("b", 100L), ("c", 200L)); val b0 = 30000L
    val wsum = w.map(_._2).sum
    val fl = w.map { case (s, wt) => (s, wt * b0 / wsum, wt * b0 % wsum) }
    val short = (b0 - fl.map(_._2).sum).toInt
    val plus = fl.sortBy { case (s, _, rem) => (-rem, s) }.take(short)
      .map(_._1).toSet
    val r1 = fl.map { case (s, f, _) =>
      s -> (f + (if (plus(s)) 1L else 0L)) }.toMap
    // a's share (≈967) exceeds cap 200 → clamp, surplus re-shares to b,c
    assert(r1("a") > 200L)
    val surplus = r1("a") - 200L
    val w2 = w.filterNot(_._1 == "a"); val wsum2 = w2.map(_._2).sum
    val fl2 = w2.map { case (s, wt) =>
      (s, wt * surplus / wsum2, wt * surplus % wsum2) }
    val short2 = (surplus - fl2.map(_._2).sum).toInt
    val plus2 = fl2.sortBy { case (s, _, rem) => (-rem, s) }.take(short2)
      .map(_._1).toSet
    val expect = Map("a" -> 200L) ++ fl2.map { case (s, f, _) =>
      s -> math.min(if (s == "b") 20000L else 80000L,
        r1(s) + f + (if (plus2(s)) 1L else 0L)) }
    val synth = (
      (1 to 1).map(i => (100L, "a")) ++
      (1 to 10).map(i => (1000L, "b")) ++
      (1 to 10).map(i => (4000L, "c"))
    ).zipWithIndex.map { case ((nc, s), i) => (i.toLong, s, nc) }
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.epochAllocate(synth, budgetChars = 30000L,
      maxEpochs = 2).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc_chars")).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(got.values.sum == 30000L, "conserved: no residual in this case")
  }

  test("epochAllocateDedup: prices unique mass — dup-heavy sources lose allocation") {
    import graft.operators.{Dedup, Sampling}
    import spark.implicits._
    // two sources, equal RAW mass; s_dup's docs are near-dup group
    // members with one keeper, s_cln's are all unique
    val docs = (
      (1 to 10).map(i => (i.toLong, "s_cln", 1000L)) ++
      (11 to 20).map(i => (i.toLong, "s_dup", 1000L))
    ).toDF("doc_id", "source", "n_chars")
    // membership relation: docs 11..20 all in one group, keeper 11
    val groups = (11 to 20).map(i => (i.toLong, 11L))
      .toDF("doc_id", "rep_id")
    val raw = Sampling.epochAllocate(docs, budgetChars = 12000L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("chars"), r.getAs[Long]("alloc_chars"))).toMap
    val ded = Sampling.epochAllocateDedup(docs, groups,
      budgetChars = 12000L).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("chars"),
        r.getAs[Long]("unique_chars"), r.getAs[Long]("capacity"),
        r.getAs[Long]("alloc_chars"), r.getAs[Long]("epochs_micro")))
      .toMap
    // raw allocator sees symmetric sources: equal split
    assert(raw("s_cln")._2 == raw("s_dup")._2)
    // dedup-adjusted: s_dup keeps only its keeper's 1000 unique chars
    assert(ded("s_dup")._1 == 10000L && ded("s_dup")._2 == 1000L)
    assert(ded("s_cln")._2 == 10000L)
    // capacity = maxEpochs × UNIQUE mass, and the clamp bites: s_dup
    // can absorb at most 2000 chars no matter its raw size
    assert(ded("s_dup")._3 == 2000L && ded("s_dup")._4 <= 2000L)
    assert(ded("s_dup")._4 < ded("s_cln")._4,
      "the dup-gutted source must get less than the clean one")
    // epoch factor reads against unique mass
    assert(ded("s_dup")._5 == ded("s_dup")._4 * 1000000L / 1000L)
    // budget conserved across the plan
    assert(ded.values.map(_._4).sum <= 12000L)
    // corpus-level sanity on the real testdata + memoized groups shape
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val g = Dedup.dedupGroups(corpus, 0.8)
    Sampling.epochAllocateDedup(corpus, g).collect().foreach { r =>
      assert(r.getAs[Long]("unique_chars") <= r.getAs[Long]("chars"))
      assert(r.getAs[Long]("alloc_chars") <= r.getAs[Long]("capacity"))
    }
  }

  test("shardBalance: partition of the corpus — masses conserve, shards bounded, layout deterministic") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val mass = docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head.getLong(0)
    val rep = Sampling.shardBalance(docs, nShards = 16).collect()
    assert(rep.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 16))
    assert(rep.map(_.getAs[Long]("n_docs")).sum == n)
    assert(rep.map(_.getAs[Long]("chars")).sum == mass)
    // reproducible layout: a second run yields the identical report
    val again = Sampling.shardBalance(docs, nShards = 16).collect()
    assert(rep.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
