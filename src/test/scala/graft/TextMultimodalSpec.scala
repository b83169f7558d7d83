package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash
import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff: four statuses by digest compare, signed char deltas") {
    import graft.operators.TextAnalysis
    val vOld = Seq((1L, "aaa", "s"), (2L, "bbb", "s"), (3L, "ccc", "s"))
      .toDF("doc_id", "text", "source")
    val vNew = Seq((2L, "bbb", "s"), (3L, "cccc", "s"), (4L, "dd", "s"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.corpusDiff(vOld, vNew).collect()
      .map(x => (x.getString(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r == Map(
      "added" -> (1L, 2L),      // doc 4: +2 chars
      "modified" -> (1L, 1L),   // doc 3: ccc -> cccc
      "removed" -> (1L, -3L),   // doc 1: -3 chars
      "unchanged" -> (1L, 0L))) // doc 2
  }

  test("RollingHash matches the reference recurrence and handles empty input") {
    def expected(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * RollingHash.Base + (b & 0xFF)) % RollingHash.Mod)
    val df = Seq("abc", "", "hello world", "a" * 1000).toDF("s")
      .select(RollingHash.rolling_hash(col("s")).as("h"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == Seq(expected("abc"), 0L, expected("hello world"),
      expected("a" * 1000)))
  }

  test("RollingHash participates in whole-stage codegen over a real scan") {
    // raw table read (no spread/AQE) so the executed plan shows the fused
    // stage markers up front
    val df = Tables.table(spark, sf0001, "documents")
      .select(RollingHash.rolling_hash(col("text")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined &&
      plan.contains("rolling_hash"))
    assert(df.count() == 500) // executes the codegen'd path
  }

  test("token stats: whitespace vs bpe-ish vs punctuation counts") {
    val d = Seq((1L, "Hello, world! it's 42")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(d).collect().head
    assert(r.getAs[Int]("n_ws_tokens") == 4)
    // Hello , world ! it s 42  (' between it and s splits words)
    assert(r.getAs[Int]("n_bpe_ish") == 8)
    assert(r.getAs[Int]("n_punct") == 3) // comma, bang, apostrophe
  }

  test("bigramPmi: count floor drops hapax pairs, PMI is the micro floor") {
    // "x y" occurs 5×, "y x" 4× (below the floor); tokens x:5 y:5,
    // n1 = 10, n2 = 9 → PMI(x y) = ⌊ln(5·10²/(9·5·5))·10⁶⌋ = 798507
    val d = Seq((1L, ("x y " * 5).trim)).toDF("doc_id", "text")
    val r = TextAnalysis.bigramPmi(d).collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4)) == ("x y", 5L, 5L, 5L, 798507L))
  }

  test("quality score is bounded and rewards stopword-bearing prose") {
    val d = Seq(
      (1L, "the cat sat on the mat and looked at the dog for a while in the sun"),
      (2L, "@@@@ ###### !!!!! ????")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(d).collect()
    val good = r.find(_.getLong(0) == 1L).get.getAs[Double]("quality")
    val bad = r.find(_.getLong(0) == 2L).get.getAs[Double]("quality")
    assert(good > bad)
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
  }

  test("lang id picks the marker language, und when nothing matches") {
    val d = Seq(
      (1L, "the size of the problem and the cost is high"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("pii scrub replaces emails and long digit runs with typed tokens") {
    val d = Seq(
      (1L, "contact bob.smith+x@example.co or call 5551234567 now"),
      (2L, "short 123456 stays, 1234567 goes"),
      (3L, "nothing to redact")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (1L, 1L))
    assert(got(2L) == (0L, 1L)) // 6-digit run untouched, 7-digit redacted
    assert(got(3L) == (0L, 0L))
    // the scrubbed hash equals the hash of the hand-redacted text
    val expect = Seq(
      (1L, "contact <EMAIL> or call <NUM> now"),
      (2L, "short 123456 stays, <NUM> goes"),
      (3L, "nothing to redact")).toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    TextAnalysis.scrubPii(d).collect().foreach { r =>
      assert(r.getAs[String]("scrubbed_md5") == expect(r.getLong(0)))
    }
  }

  test("multimodal: stub decode yields deterministic frames and features") {
    val d = Seq((2L, "A" * 130), (3L, "B" * 64)).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(d))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = feats(2L)
    assert(f2.kind == "image" && f2.n_bytes == 130 && f2.n_frames == 3)
    assert(f2.frame_means.take(2).forall(_ == 65.0)) // 'A' = 65
    assert(f2.width == 1 + (65 & 0x3F) && f2.height == 1 + (65 & 0x3F))
    val f3 = feats(3L)
    assert(f3.kind == "audio" && f3.n_frames == 1 && f3.frame_means.head == 66.0)
  }

  test("documents text is ASCII — media_summary oracle's code-point sums equal byte sums") {
    val d = Tables.table(spark, sf0001, "documents")
    assert(d.filter(octet_length(col("text")) =!= length(col("text"))).count() == 0)
  }

  test("multimodal: frame sampling keeps every stride-th frame") {
    val d = Seq((2L, "A" * 640)).toDF("doc_id", "text") // 10 frames
    val sampled = Multimodal.sampleFrames(
      Multimodal.extractFeatures(Multimodal.mediaTable(d)), stride = 4)
      .collect().head
    assert(sampled.getSeq[Double](1).length == 3) // frames 0,4,8
  }

  test("decontaminate: only training docs flagged, hits bounded by shingle count") {
    import graft.functions.PortableHash
    import org.apache.spark.sql.functions.pmod
    val d = Tables.documents(spark, sf0001)
    val got = TextAnalysis.decontaminate(d).collect()
    assert(got.nonEmpty) // exact dups across the eval/train split exist
    // no member of the eval slice appears as a flagged training doc
    val evalIds = d.filter(
      pmod(PortableHash.h60(col("doc_id").cast("string")), lit(1000L)) < 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !evalIds.contains(r.getLong(0))))
    // a doc cannot share more n-grams than it has
    val nSh = d.select(col("doc_id"),
      size(graft.functions.TextOps.shingles(col("text"), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach(r => assert(r.getLong(1) <= nSh(r.getLong(0))))
    // an exact duplicate of an eval doc shares ALL its n-grams
    val evalText = d.filter(col("doc_id").isin(evalIds.toSeq: _*))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainText = d.filter(!col("doc_id").isin(evalIds.toSeq: _*))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupOfEval = trainText.collectFirst {
      case (id, t) if evalText.values.exists(_ == t) && nSh(id) > 0 => id
    }
    dupOfEval.foreach { id =>
      val hit = got.find(_.getLong(0) == id)
      assert(hit.exists(_.getLong(1) == nSh(id)),
        s"exact eval dup $id not fully flagged")
    }
  }

  test("graded decontamination agrees with the flag form; zero-hit docs included") {
    val docs = Tables.documents(spark, sf001).limit(150).cache()
    val frac = TextAnalysis.decontaminationFraction(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val flagged = TextAnalysis.decontaminate(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical hit counts on the flagged set; every other train doc is
    // present with 0 hits and 0 fraction
    flagged.foreach { case (id, hits) => assert(frac(id)._2 == hits) }
    (frac.keySet -- flagged.keySet).foreach { id =>
      assert(frac(id)._2 == 0L && frac(id)._3 == 0L)
    }
    // fraction = exact integer micro ratio
    frac.values.foreach { case (n, h, f) =>
      assert(f == (if (n > 0) h * 1000000 / n else 0L))
    }
    assert(frac.nonEmpty && flagged.nonEmpty)
    docs.unpersist()
  }

  test("contamination deciles: equal-population cut conserving hits; ordered means") {
    val docs = Tables.documents(spark, sf001).limit(200).cache()
    val frac = TextAnalysis.decontaminationFraction(docs).collect()
    val dec = TextAnalysis.contaminationDeciles(docs).collect()
    docs.unpersist()
    assert(dec.map(_.getInt(0)).toSeq == (1 to 10))
    // equal population (±1) and exact conservation of docs + hits
    val sizes = dec.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sum == frac.length)
    assert(dec.map(_.getLong(2)).sum == frac.map(_.getLong(2)).sum)
    // means are nondecreasing across deciles (ntile by fraction) and
    // each is the floor-mean of its bucket's micro fractions
    val means = dec.map(_.getLong(3))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
  }

  test("bloom decontamination: no false negatives vs the exact operator, codegen'd test") {
    val d = Tables.documents(spark, sf0001)
    val exact = TextAnalysis.decontaminate(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TextAnalysis.decontaminateBloom(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bloom can only ADD hits (false positives), never lose one
    exact.foreach { case (id, hits) =>
      assert(bloom.getOrElse(id, 0L) >= hits,
        s"doc $id lost hits: exact=$hits bloom=${bloom.get(id)}")
    }
    // and at 2^20 bits over this tiny eval set, false positives are rare:
    // the totals stay close
    val extra = bloom.values.sum - exact.values.sum
    assert(extra >= 0 && extra <= math.max(5L, exact.values.sum / 10),
      s"implausible false-positive volume: $extra extra hits")

    // the membership test runs inside whole-stage codegen
    val plan = TextAnalysis.decontaminateBloom(d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      "bloom filter not visible in the physical plan")
  }

  test("count-min estimates are one-sided: never below the true count, exact when wide") {
    val d = Tables.documents(spark, sf0001)
    // production width: top tokens rarely collide → estimates ≈ exact
    val wide = TextAnalysis.vocabCmsTopK(d, k = 30).collect()
    wide.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}")
    }
    // adversarially narrow sketch: collisions force strict overestimates,
    // but the bound still holds for every token
    val narrow = TextAnalysis.vocabCmsTopK(d, k = 30, w = 64).collect()
    narrow.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    assert(narrow.exists(r => r.getLong(2) > r.getLong(1)),
      "64-cell sketch over a full vocabulary should collide somewhere")
  }

  test("repetition score: bounded, zero for unique text, high for loops") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),       // all distinct
      (2L, "spam ham spam ham spam ham spam ham"),       // 2-word loop
      (3L, "x")                                          // under n tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(3) == 0.0)
    // 8 tokens -> 6 trigram slots, only 2 distinct ("spam ham spam",
    // "ham spam ham") -> 1 - 2/6
    assert(math.abs(got(2L).getDouble(3) - (1.0 - 2.0 / 6.0)) < 1e-6)
    assert(got(3L).getLong(1) == 0L && got(3L).getDouble(3) == 0.0)
    // corpus-wide: always within [0, 1]
    val corpus = TextAnalysis.repetitionScore(Tables.documents(spark, sf0001))
      .collect()
    assert(corpus.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("chunking: gap-free coverage, stride-aligned starts, every non-empty doc chunked") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val chunks = TextAnalysis.chunkDocs(docs, window = 200, stride = 150)
      .collect()
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == lens.filter(_._2 > 0).keySet,
      "every doc with text must produce chunks")
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i, "chunk_idx must be dense from 0")
        assert(c.getLong(2) == i * 150L + 1, "starts step by stride")
      }
      // gap-free: each chunk start is within the previous chunk's span
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) <= a.getLong(2) + a.getLong(3),
            s"gap between chunks of doc $id")
        case _ =>
      }
      // the final chunk reaches the end of the document
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == lens(id),
        s"doc $id tail not covered")
    }
  }

  test("bpe pair census counts every adjacent occurrence, not the set") {
    val docs = Seq(
      (1L, "a b a b a", "en", "s", 9L), // pairs: ab ba ab ba → ab×2 ba×2
      (2L, "a b", "en", "s", 3L), // ab×1
      (3L, "x", "en", "s", 1L)) // no pairs
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.bpePairCounts(docs, k = 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("a b", 3L, 2L), ("b a", 2L, 1L)))
  }

  test("ngram novelty: shared shingles score 0, unique prose scores 1") {
    val shared = "the quick brown fox jumps over dogs"
    val docs = Seq(
      (1L, shared, "en", "s", 1L),
      (2L, shared, "en", "s", 1L), // exact dup: every shingle df=2
      (3L, "completely different words appear here tonight", "en", "s", 1L),
      (4L, "xy", "en", "s", 1L)) // too short: no shingles
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.ngramNovelty(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) == 0.0 && r(2L) == 0.0)
    assert(r(3L) == 1.0)
    assert(r(4L) == 0.0) // no shingles → 0 by convention
  }

  test("lexical richness: TTR and hapax micro floors, empty doc NULLs") {
    val docs = Seq(
      (1L, "a a b", "en", "s", 1L), // 3 tokens, 2 types, 1 hapax
      (2L, "", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.lexicalRichness(docs).collect()
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5)) == (3L, 2L, 1L, 666666L, 500000L))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3))
      == (0L, 0L, 0L))
    assert(r(1).isNullAt(4) && r(1).isNullAt(5))
  }

  test("winnowing: identical docs share all fingerprints, disjoint docs none") {
    val text = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, text, "en", "s", 1L),
      (2L, text, "en", "s", 1L), // identical → jaccard 1.0
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.winnowPairs(docs).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getDouble(3))
      == (1L, 2L, 1.0))
  }

  test("winnowing density: fingerprints ≪ grams, every long doc covered") {
    val docs = Tables.documents(spark, sf0001)
    val fps = TextAnalysis.winnowPairs(docs) // exercises the chain end-to-end
    fps.collect() // no assertion on pairs — corpus-dependent
    // density sanity on the fingerprint relation itself
    import graft.functions.{PortableHash, WordShingles}
    val grams = docs.select(col("doc_id"),
      posexplode(WordShingles.word_ngrams(
        graft.functions.TextOps.normalize(col("text")), 3))
        .as(Seq("pos", "gram")))
    val nGrams = grams.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(-3, 0)
    val nFps = grams
      .select(col("doc_id"), PortableHash.h60(col("gram")).as("h"),
        col("pos"))
      .withColumn("mh", min(col("h")).over(w))
      .withColumn("nw", count(col("h")).over(w))
      .where(col("nw") === 4)
      .select(col("doc_id"), col("mh")).distinct().count()
    // winnowing guarantees ≈ 2/(w+1) = 0.4 density; allow corpus slack
    assert(nFps > 0 && nFps < nGrams / 2 + 1)
  }

  test("readability: exact milli-score on a hand-counted sentence pair") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!", "en", "s", 1L),
      (2L, "no terminal punctuation here", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.readability(docs).collect()
    // 6 words, 2 sentence runs, 6 single-vowel groups:
    // 206835 − (1015·6)//2 − (84600·6)//6 = 206835 − 3045 − 84600
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == (6L, 2L, 6L))
    assert(r(0).getLong(4) == 119190L)
    assert(r(1).isNullAt(4)) // no sentences → NULL score
  }

  test("length deciles: histogram closed form equals a real ntile, ties included") {
    // 23 docs, heavy length ties → uneven buckets (N % 10 = 3)
    val docs = (1 to 23).map { i =>
      (i.toLong, "x" * (i % 7 + 1), "en", "s", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.lengthDeciles(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(length(col("text")), col("doc_id"))
    val want = docs
      .select(length(col("text")).cast("long").as("n_chars"),
        ntile(10).over(w).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("decile")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("lm perplexity: scalar Laplace-bigram reference on a tiny corpus") {
    // corpus: "a b a b", "a b c", "z" (single-token: outside event space)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    // bigram census: (a b)=3, (b a)=1, (b c)=1 → hist a·=3, b·=2
    // vocab over bigram types: {a, b} ∪ {b, a, c} = {a, b, c} → V=3
    def lp(cb: Long, cw: Long): Long =
      math.floor(math.log((cb + 1.0) / (cw + 3.0)) * 1e6).toLong
    val want = Map(
      1L -> (3L, 2 * lp(3, 3) + lp(1, 2)),  // a b, b a, a b
      2L -> (2L, lp(3, 3) + lp(1, 2)),      // a b, b c
      3L -> (0L, 0L))
    val got = TextAnalysis.lmPerplexity(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // avg of doc 2 is the exact integer ratio rounded
    val avg2 = TextAnalysis.lmPerplexity(docs)
      .filter(col("doc_id") === 2L).collect().head.getDouble(3)
    assert(avg2 == math.rint((lp(3, 3) + lp(1, 2)) / 2.0 * 1e6) / 1e6)
  }

  test("kneser-ney perplexity: scalar reference; discount mass reserved for unseen") {
    // corpus: "a b c", "a b d" — bigrams (a b)=2, (b c)=1, (b d)=1;
    // NB=3 distinct; ctx a: cw=2,F1=1; b: cw=2,F1=2; continuation
    // predecessors: b/c/d each 1.  P = ((4c−3)NB + 3·F1·P2)/(4·CW·NB):
    // P(b|a) = (5·3 + 3)/24 = 0.75, P(c|b) = P(d|b) = (3 + 6)/24 = 0.375
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    def lp(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
    val want = Map(
      1L -> (2L, lp(0.75) + lp(0.375)),
      2L -> (2L, lp(0.75) + lp(0.375)))
    val got = TextAnalysis.knPerplexity(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // The KN invariant the Laplace form lacks — seen-bigram mass per
    // context sums BELOW 1 (here 0.75 for ctx a and 0.375+0.375 for
    // ctx b), the discount reserved for unseen followers — is asserted
    // over the operator's own outputs on random corpora in
    // PropertySpec ("knPerplexity invariants").
  }

  test("kneser-ney: versatile continuation outranks frequent-but-predictable") {
    // "x y" appears 3× but y follows ONLY x (continuation count 1);
    // "q v" appears once but v follows three distinct contexts.
    // Unigram backoff would rank y over v; KN's continuation
    // probability must rank P(v|unseen-ish context) weight higher via
    // nprec — observable through the backoff term 3·F1·nprec.
    val docs = Seq((1L, "x y x y x y"), (2L, "q v"), (3L, "r v"),
      (4L, "s v")).toDF("doc_id", "text")
    val got = TextAnalysis.knPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every doc scored; the v-docs (rarer bigrams, richer continuation)
    // score identically to each other by symmetry
    assert(got(2L) == got(3L) && got(3L) == got(4L))
    assert(got.values.forall(_ < 0L))
  }

  test("lm perplexity: repartition-invariant (exact integer sums)") {
    val docs = Tables.documents(spark, sf0001).limit(120).cache()
    val a = TextAnalysis.lmPerplexity(docs).collect().toSeq
    val b = TextAnalysis.lmPerplexity(docs.repartition(13)).collect().toSeq
    assert(a == b)
    docs.unpersist()
  }

  test("chunk dedup: first doc keeps, later copies flagged, counts partition") {
    // window 200 / stride 150: a 200-char doc is ONE chunk. Doc 1 and 3
    // are identical; doc 2 is distinct. Keeper = lowest doc_id.
    val page = "lorem " * 33 + "xy"   // 200 chars
    assert(page.length == 200)
    val docs = Seq((1L, page), (2L, "другой " * 28), (3L, page))
      .toDF("doc_id", "text")
    val r = TextAnalysis.chunkDedup(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) == ((1L, 1L, 0L)))  // keeper
    assert(r(3L) == ((1L, 0L, 1L)))  // duplicate of doc 1's chunk
    assert(r(2L)._3 == 0L)           // unique content: nothing dup
    // counts partition on the corpus: kept + dup = chunks, every doc
    val corpus = Tables.documents(spark, sf001)
    TextAnalysis.chunkDedup(corpus).collect().foreach { x =>
      assert(x.getLong(1) == x.getLong(2) + x.getLong(3))
    }
  }

  test("bpe merges: greedy left-to-right counts; merged tokens feed later steps") {
    // step 1: "a b" appears 3× in doc 1 (consecutive overlaps merge
    // greedily) + 1× in doc 2 → count 4, beating everything else.
    // step 2: doc 2's "a_b c" (the MERGED token as pair member) plus
    // doc 3's tie-break fodder.
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c"),
      (3L, "x y"), (4L, "x y"), (5L, "x z")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(docs, steps = 3).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r(0) == ((1L, "a b", 4L)))
    // after step 1: doc1 = "a_b a_b a_b", doc2 = "a_b c"
    // step 2 candidates: "a_b a_b"×2, "a_b c"×1, "x y"×2, "x z"×1
    // → count tie 2 2, lexicographic: "a_b a_b" < "x y"
    assert(r(1) == ((2L, "a_b a_b", 2L)))
    // after step 2: doc1 = "a_b_a_b a_b" (left-to-right non-overlapping)
    // step 3: all remaining pairs count ≤ 2: "x y"×2 wins over 1-counts
    assert(r(2) == ((3L, "x y", 2L)))
    // the "a a a" shape: one non-overlapping merge, remainder survives
    val odd = Seq((1L, "a a a")).toDF("doc_id", "text")
    val r2 = TextAnalysis.bpeMerges(odd, steps = 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    // census counts 2 overlapping "a a", but the rewrite merges only the
    // non-overlapping first — the remainder then pairs with the merge
    assert(r2(0) == ((1L, "a a", 2L)))
    assert(r2(1) == ((2L, "a_a a", 1L)))
  }

  test("vocab growth: first-occurrence accounting; empty docs hold the curve flat") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, ""), (4L, "b c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 1L, 2L, 2L),   // {a, b}
      (2, 2L, 4L, 3L),   // +c
      (3, 3L, 4L, 3L),   // empty doc: docs advance, tokens/vocab flat
      (4, 4L, 7L, 4L)))  // +d
  }

  test("vocab growth: mismatched injected bucket relation fails loudly") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b"), (4L, "c d"))
      .toDF("doc_id", "text")
    // matching injection (granularity = checkpoints) reproduces the
    // default-path curve exactly
    val ok = graft.operators.Ranks.withNtileBucket(
      docs.select(col("doc_id")), 2, col("doc_id"), Nil, "bucket")
    val expected = TextAnalysis.vocabGrowth(docs, checkpoints = 2).collect()
    val gotOk = TextAnalysis.vocabGrowth(docs, checkpoints = 2,
      buckets = Some(ok)).collect()
    assert(gotOk.toSeq == expected.toSeq)
    // a 2-bucket relation injected against checkpoints=4 would silently
    // coarsen the curve — the plan guard must raise instead
    val ex = intercept[Exception] {
      TextAnalysis.vocabGrowth(docs, checkpoints = 4,
        buckets = Some(ok)).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) ""
      else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("growthCurve"), msgs(ex).take(500))
  }

  test("lang confusion: predicted vs labeled matrix over one scan") {
    val docs = Seq(
      (1L, "the and of time", "en"),   // correctly en
      (2L, "der und die zeit", "en"),  // mislabeled corpus row → (en, de)
      (3L, "zzz qqq", "fr"))           // no markers → (fr, und)
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("en", "en", 1L), ("en", "de", 1L), ("fr", "und", 1L)))
  }

  test("zipf slope: matches a BigInt scalar reference; degenerate source NULL") {
    val docs = Seq(
      (1L, "a a a a b b c", "s1"),
      (2L, "only", "s2")) // single rank → zero denominator → NULL
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.zipfSlope(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    // scalar reference: counts {a:4, b:2, c:1} → ranks 1..3, the same
    // micro-floor + exact moment formula evaluated independently
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 1L)).map { case (rk, c) =>
      (math.floor(math.log(rk.toDouble) * 1e6).toLong,
        math.floor(math.log(c.toDouble) * 1e6).toLong)
    }
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val expect = BigDecimal((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("s1").getLong(1) == 3L)
    assert(r("s1").getDouble(2) == expect)
    assert(expect < -1.0 && expect > -1.5) // Zipf-ish corpus sits near −1
    assert(r("s2").isNullAt(2))
  }

  test("dup spans: cross-doc trigrams only; interval union handles overlaps") {
    val docs = Seq(
      (1L, "a b c d e f"),        // shares only "a b c" with doc 2
      (2L, "a b c x y z"),
      (3L, "p q r p q r p q r"),  // self-repetition: NOT cross-doc dup
      (4L, "m n o p q m n o p q"), // overlapping dup spans union to all 10
      (5L, "m n o p q"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.dupSpans(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == ((6L, 1L, 3L, 500000L)))
    assert(r(2L) == ((6L, 1L, 3L, 500000L)))
    assert(r(3L) == ((9L, 0L, 0L, 0L)))
    // doc4 dup positions {0,1,2,5,6,7} → gains 3,1,1,3,1,1 = 10 = all
    assert(r(4L) == ((10L, 6L, 10L, 1000000L)))
    assert(r(5L) == ((5L, 3L, 5L, 1000000L)))
  }

  test("bpe encode: per-doc raw vs encoded counts, saved fraction in micros") {
    // steps=2 on this corpus learns "a b" then "a_b a_b":
    // doc1 "a b a b a b" → "a_b_a_b a_b" (6 → 2 tokens, saved 666666)
    // doc2 "a b c" → "a_b c" (3 → 2, saved 333333); doc3 empty → 0/0/0
    val docs = Seq((1L, "a b a b a b"), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val (learned, fin) = TextAnalysis.bpeTrain(docs, 2)
    assert(learned.map(_._2) == Seq("a b", "a_b a_b"))
    val r = TextAnalysis.bpeEncode(docs, fin).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    fin.unpersist(blocking = false)
    assert(r(1L) == ((6L, 2L, 666666L)))
    assert(r(2L) == ((3L, 2L, 333333L)))
    assert(r(3L) == ((0L, 0L, 0L)))
  }

  test("dsir weights: selection tilts toward the target domain; repartition-invariant") {
    // engineered domains: targets speak "quantum flux", decoys mimic
    // them, noise docs speak something else entirely
    val target = (0L until 5L).map(i =>
      (i, "quantum flux drive quantum flux core", "tgt"))
    val decoys = (10L until 13L).map(i =>
      (i, "quantum flux drive engaged", "raw"))
    val noise = (20L until 30L).map(i =>
      (i, s"parrot banana umbrella kettle${i} stone moss", "raw"))
    val docs = (target ++ decoys ++ noise).toDF("doc_id", "text", "source")
    val r = TextAnalysis.dsirWeights(docs, targetSources = Seq("tgt"), k = 8)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    val selected = r.filter(_._3 == 1L).map(_._1).toSet
    // the 8 slots go to the 5 targets + the 3 target-like decoys; every
    // noise doc's bigrams are rare-under-target, so they rank below
    assert(selected == ((0L until 5L) ++ (10L until 13L)).toSet,
      s"got $selected")
    // selected == scalar top-k over the emitted weights (flag honesty)
    val topk = r.sortBy(x => (-x._2, x._1)).take(8).map(_._1).toSet
    assert(selected == topk)
    // exact integer weights ⇒ identical under any partitioning
    val b = TextAnalysis.dsirWeights(docs.repartition(7),
      targetSources = Seq("tgt"), k = 8)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == b.toSeq)
  }

  test("gopher repetition: hand-computed spam loop; clean prose near zero") {
    // doc 1: "buy now " × 6 — top 2-gram "buy now" (or "now buy")
    //   appears 6 (resp. 5) times; every 5-gram repeats.
    // doc 2: all-distinct words — no duplicated 5-gram, top2 cnt 1.
    // doc 3: one word — no 2-grams at all (left-join zeros path).
    val docs = Seq(
      (1L, Array.fill(6)("buy now").mkString(" ")),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    // normalized text = 47 chars; "buy now" wins the tie over "now buy"
    // (6 occurrences vs 5); char mass 6*7 = 42
    assert(d1.getLong(1) == 47 && d1.getLong(2) == 6 &&
      d1.getString(3) == "buy now")
    assert(d1.getLong(4) == 42L * 1000000 / 47)
    // 12 tokens → 8 5-gram occurrences, 2 distinct types ("buy now buy
    // now buy" ×4, "now buy now buy now" ×4, 19 chars each): all duplicated
    assert(d1.getLong(5) == (4L * 19 + 4L * 19) * 1000000 / 47)
    val d2 = r(2L)
    assert(d2.getLong(2) == 1 && d2.getLong(5) == 0)
    val d3 = r(3L)
    assert(d3.getLong(2) == 0 && d3.getString(3) == "" &&
      d3.getLong(4) == 0 && d3.getLong(5) == 0)
  }

  test("token gini: 0 for a one-token loop, → 1−1/n for all-distinct text") {
    val docs = Seq(
      (1L, "spam spam spam spam", "en", "s", 1L), // one type → gini 0
      (2L, "a b c d", "en", "s", 1L), // 4 distinct → 1 − 1/4 = 0.75
      (3L, "", "en", "s", 0L)) // token-less → 0 by convention
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.tokenGini(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r == Map(1L -> 0L, 2L -> 750000L, 3L -> 0L))
  }

  test("dedup group sizes: mass identity against the groups relation") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
    val groups = Dedup.dedupGroups(docs, threshold = 0.8)
    val hist = groups
      .groupBy(col("rep_id")).agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size")).agg(count(lit(1)).as("n_groups"))
      .collect()
    val mass = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(mass == groups.count(), "Σ size·n_groups must equal |members|")
  }

  test("dup degree histogram: handshake identity on the corpus graph") {
    import graft.operators.Dedup
    val emb = Tables.embeddings(spark, sf0001)
    val nPairs = Dedup.embeddingCosineDups(emb, threshold = 0.3).count()
    val hist = Dedup.dupDegrees(emb, threshold = 0.3).collect()
    val sumDeg = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(sumDeg == 2 * nPairs, "Σ degree·n_nodes must equal 2·|E|")
  }

  test("kAnonymity: groups under k are flagged, bucket edges are integer floors") {
    import graft.operators.TextAnalysis
    // QI (web, en, bucket 0): 5 docs → safe at k=5; (web, en, bucket 1):
    // 2 docs → at risk; (wiki, de, bucket 0): 1 doc → at risk. 499/500
    // land in different buckets (floor, not round).
    val docs = (
      (1L to 5L).map(i => (i, "t", "en", "web", 499L)) ++
      Seq((6L, "t", "en", "web", 500L), (7L, "t", "en", "web", 999L),
        (8L, "t", "de", "wiki", 10L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.kAnonymity(docs, k = 5L, bucket = 500L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("web", "en", 0L)) == ((5L, 0L)))
    assert(got(("web", "en", 1L)) == ((2L, 1L)))
    assert(got(("wiki", "de", 0L)) == ((1L, 1L)))
    assert(got.size == 3)
  }

  test("tCloseness: skewed groups flagged, balanced safe, absent langs contribute mass") {
    import graft.operators.TextAnalysis
    // Corpus: en 15, de 15, fr 2 (N = 32). Group web(9en,1de) and
    // wiki(1en,9de) are skewed → TVD mass 276/640 = 431250 μ; blog
    // (5en,5de) is near the blend → 40/640 = 62500 μ; news(2fr) is
    // homogeneous in a rare lang → 120/128 = 937500 μ. fr is ABSENT
    // from web/wiki/blog yet must still contribute |0 − lang_n·g_n|.
    var id = 0L
    def mk(lang: String, source: String, n: Int) =
      (1 to n).map { _ => id += 1; (id, "t", lang, source, 10L) }
    val docs = (mk("en", "web", 9) ++ mk("de", "web", 1) ++
      mk("en", "wiki", 1) ++ mk("de", "wiki", 9) ++
      mk("en", "blog", 5) ++ mk("de", "blog", 5) ++ mk("fr", "news", 2))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.tCloseness(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("web") == ((10L, 431250L, 1L)))
    assert(got("wiki") == ((10L, 431250L, 1L)))
    assert(got("blog") == ((10L, 62500L, 0L)))
    assert(got("news") == ((2L, 937500L, 1L)))
  }

  test("sourceConfusion: separable feeds self-attribute; a borrowed-vocab doc is attributed away") {
    import graft.operators.TextAnalysis
    // A speaks x, B speaks y; doc 5 is LABELED A but written in B's
    // vocabulary — NB must hand it to B (its y-mass in A is diluted by
    // A's larger ns), giving confusion row (A,B)=1. Scores are exact
    // micro-integer sums, so the argmax is stable by construction.
    val docs = Seq(
      (1L, "x x x", "A"), (2L, "x x", "A"), (5L, "y y y y", "A"),
      (3L, "y y y", "B"), (4L, "y y", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "A") -> 2L, ("A", "B") -> 1L, ("B", "B") -> 2L))
  }

  test("skipgramCooc: directed pairs within the window only; counts fold across docs") {
    import graft.operators.TextAnalysis
    // window 2 over "a b c d": (a,b)(a,c)(b,c)(b,d)(c,d) — (a,d) is at
    // distance 3 and must NOT appear; the second doc repeats (a,b)
    val docs = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramCooc(docs, window = 2, minCount = 1L,
      k = 50).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L,
      ("b", "c") -> 1L, ("b", "d") -> 1L, ("c", "d") -> 1L))
  }

  test("qualityCalibration: within-source percentiles on the (q, doc_id) order; single-doc sources at 0") {
    import graft.operators.TextAnalysis
    // three equal-quality docs in one source: the doc_id tiebreak spreads
    // them across 0 / ½ / 1 on the micro grid; a single-doc source pins 0
    val docs = Seq(
      (1L, "the cat sat", "s", 11L), (2L, "the cat sat", "s", 11L),
      (3L, "the cat sat", "s", 11L), (9L, "hello world", "t", 11L))
      .toDF("doc_id", "text", "source", "n_chars")
    val got = TextAnalysis.qualityCalibration(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L, 9L -> 0L))
  }

  test("mediaPhashDups: identical payloads collide at 0; perturbed copy within banding; disjoint stays out") {
    import graft.operators.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (1L, base), (2L, base),              // exact copy → dist 0
      (3L, base.replace("quick", "quack")),// smooth perturbation
      (4L, "0123456789" * 40)              // different byte texture
    ).toDF("doc_id", "text")
    val got = Multimodal.mediaPhashDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 2L)) == 0, "identical payloads must collide at dist 0")
    got.foreach { case (_, d) => assert(d >= 0 && d <= 3) }
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated byte texture must not pair")
    // fingerprints are deterministic across runs
    val ph = Multimodal.perceptualHash(Multimodal.mediaTable(docs))
      .collect().map(p => p.media_id -> p.phash).toMap
    val ph2 = Multimodal.perceptualHash(Multimodal.mediaTable(docs))
      .collect().map(p => p.media_id -> p.phash).toMap
    assert(ph == ph2)
    assert(ph(1L) == ph(2L))
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(3L)) <= 10,
      "a smooth perturbation should move few bits")
  }

  test("mediaChunkPlan: ranges tile each blob exactly, half-open and ordered") {
    import graft.operators.Multimodal
    val docs = Seq((1L, "x" * 600), (2L, "y" * 256), (3L, "z"), (4L, ""))
      .toDF("doc_id", "text")
    val rows = Multimodal.mediaChunkPlan(docs, chunkBytes = 256L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // empty blob plans no fetch; others tile [0, n) with no gap/overlap
    assert(!rows.exists(_._1 == 4L))
    for ((id, n) <- Seq(1L -> 600L, 2L -> 256L, 3L -> 1L)) {
      val rs = rows.filter(_._1 == id).sortBy(_._2)
      assert(rs.head._3 == 0L && rs.last._4 == n)
      assert(rs.map(r => r._4 - r._3).sum == n)
      rs.zip(rs.tail).foreach { case (a, b) => assert(a._4 == b._3) }
      assert(rs.forall(r => r._4 - r._3 <= 256L))
    }
  }
}
