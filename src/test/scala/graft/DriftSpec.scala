package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, explode, max, min}

import graft.operators.Drift

/** Hand-computed drift statistics on crafted inputs; correctness at
  * volume is the driver oracle (`value_drift`, `vocab_jaccard`). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.map { case (id, ns, t, v) => (id, ns, t, v, "{}") }
      .toDF("event_id", "ts_ns", "event_type", "value", "props")

  test("valueDrift: identical halves give chi2 = 0") {
    // type a: same histogram both halves (mid = (0 + 3000000000)/2 ns→μs)
    val df = ev(
      (1L, 0L, "a", 5.0), (2L, 1000000000L, "a", 15.0),
      (3L, 2000000000L, "a", 5.0), (4L, 3000000000L, "a", 15.0))
    val r = Drift.valueDrift(df).collect()
    assert(r.length == 1)
    val Row(_, n0, n1, nBins, chi2) = r(0)
    assert((n0, n1, nBins, chi2) == (2L, 2L, 2L, 0L))
  }

  test("valueDrift matches the hand-evaluated two-sample chi-square") {
    // type a: early = {bin0: 2, bin1: 1}, late = {bin0: 1, bin1: 2}
    // n0 = 3, n1 = 3; per-bin term: (c0*n1 - c1*n0)^2 * 1e6 div (c0+c1)
    //   bin0: (6-3)^2 * 1e6 div 3 = 3000000; bin1 symmetric = 3000000
    // chi2_micro = 6000000 div 9 = 666666
    val df = ev(
      (1L, 0L, "a", 1.0), (2L, 1000L, "a", 2.0), (3L, 2000L, "a", 11.0),
      (4L, 6000000000L, "a", 1.0), (5L, 6000001000L, "a", 11.0),
      (6L, 6000002000L, "a", 12.0))
    val r = Drift.valueDrift(df).collect()
    val Row(_, n0, n1, nBins, chi2) = r(0)
    assert((n0, n1, nBins) == (3L, 3L, 2L))
    assert(chi2 == 666666L)
  }

  test("valueDrift: a half with no rows for a type yields NULL, not error") {
    // type b exists only before the global midpoint
    val df = ev(
      (1L, 0L, "b", 1.0), (2L, 1000L, "b", 2.0),
      (3L, 6000000000L, "a", 1.0), (4L, 0L, "a", 1.0))
    val r = Drift.valueDrift(df).collect().map(x => x.getString(0) -> x)
      .toMap
    assert(r("b").isNullAt(4))
    assert(!r("a").isNullAt(4))
  }

  test("chiSquare stays exact past the old 1e8-per-half DECIMAL38 bound") {
    // per-half counts of 4e9: the one-shot (c0·n1 − c1·n0)²·10⁶ would be
    // ~6.4e43 — a DECIMAL38 overflow-to-NULL — while the Euclidean-split
    // assembly keeps every intermediate ≤ ~max(n)³·2e6 and must equal the
    // BigInt-evaluated exact statistic.
    val c0a = 3000000000L; val c1a = 1000000000L
    val c0b = 1000000000L; val c1b = 3000000000L
    val binned = Seq(("x", 0L, c0a, c1a), ("x", 1L, c0b, c1b))
      .toDF("event_type", "bin", "c0", "c1")
    val r = Drift.chiSquare(binned).collect()
    val Row(_, n0, n1, nBins, chi2) = r(0)
    def term(c0: Long, c1: Long, n0: BigInt, n1: BigInt): BigInt =
      (c0 * n1 - c1 * n0).pow(2) * 1000000 / (BigInt(c0) + c1)
    val N0 = BigInt(c0a) + c0b; val N1 = BigInt(c1a) + c1b
    val expected =
      (term(c0a, c1a, N0, N1) + term(c0b, c1b, N0, N1)) / (N0 * N1)
    assert((n0, n1, nBins) == (N0.toLong, N1.toLong, 2L))
    assert(chi2 == expected.toLong, s"got $chi2, want $expected")
  }

  test("ksDrift matches the hand-evaluated max CDF gap") {
    // type a, early values {1, 2, 3}, late values {3, 4, 5}; n0 = n1 = 3
    // CDF gaps at v=1: |1*3-0| = 3; v=2: 6; v=3: |3*3-1*3| = 6;
    // v=4: |9-6| = 3; v=5: 0 → max = 6 → 6*1e6 div 9 = 666666
    val df = ev(
      (1L, 0L, "a", 1.0), (2L, 1000L, "a", 2.0), (3L, 2000L, "a", 3.0),
      (4L, 6000000000L, "a", 3.0), (5L, 6000001000L, "a", 4.0),
      (6L, 6000002000L, "a", 5.0))
    val r = Drift.ksDrift(df).collect()
    val Row(_, n0, n1, ks) = r(0)
    assert((n0, n1, ks) == (3L, 3L, 666666L))
  }

  test("ksDrift: identical halves give D = 0; one-sided type gives NULL") {
    val df = ev(
      (1L, 0L, "a", 1.0), (2L, 1000L, "a", 2.0),
      (3L, 6000000000L, "a", 1.0), (4L, 6000001000L, "a", 2.0),
      (5L, 0L, "b", 9.0))
    val r = Drift.ksDrift(df).collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(3) == 0L)
    assert(r("b").isNullAt(3))
  }

  test("embeddingDrift matches the hand-evaluated centroid shift") {
    // mid = (0+3) div 2 = 1 → ref = {0,1}, new = {2,3}.
    // label 1, dim0: ref mean micro = (100000+300000) div 2 + 1e6 →
    //   offset cancels → d = 200000 − 500000 = −300000; dim1: d = 0.
    // shift2 = 9e10; max |d| = 300000.
    val df = Seq(
      (0L, Seq(0.1f, 1.0f), 1), (1L, Seq(0.3f, -1.0f), 1),
      (2L, Seq(0.5f, 1.0f), 1), (3L, Seq(0.5f, -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Drift.embeddingDrift(df).collect()
    assert(r.length == 1)
    val Row(label, nRef, nNew, shift2, maxShift) = r(0)
    assert((label, nRef, nNew) == (1L, 2L, 2L))
    assert((shift2, maxShift) == (90000000000L, 300000L))
  }

  test("embeddingDrift: a label missing from one half yields NULL") {
    val df = Seq(
      (0L, Seq(0.1f), 1), (1L, Seq(0.2f), 2),
      (2L, Seq(0.3f), 1), (3L, Seq(0.4f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Drift.embeddingDrift(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(2L).isNullAt(3) && r(2L).isNullAt(4))
    assert(!r(1L).isNullAt(3))
  }

  // embeddingDrift's +10⁶ micro-offset keeps every floored dim
  // nonnegative ONLY under the data contract |x| ≤ 1 — a dim below −1
  // would silently reintroduce the Spark-trunc vs DuckDB-floor
  // divergence, so the precondition is pinned on the corpus like the
  // loader invariants (ADVICE r5).
  test("embeddingDrift precondition: corpus components are within [-1, 1]") {
    val mm = Tables.embeddings(spark, sf001)
      .select(explode(col("embedding")).as("x"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()(0)
    assert(mm.getFloat(0) >= -1.0f && mm.getFloat(1) <= 1.0f,
      s"embedding components outside [-1,1]: [${mm.getFloat(0)}, ${mm.getFloat(1)}]")
  }

  test("vocabJaccard: hand-counted overlap, zero-overlap pair included") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "beta gamma delta", "s2"),
      (3L, "omega", "s3"))
      .toDF("doc_id", "text", "source")
    val r = Drift.vocabJaccard(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.size == 3)
    // s1 ∩ s2 = {beta, gamma} = 2; union = 4 → 500000
    val Row(_, _, va, vb, ni, j) = r(("s1", "s2"))
    assert((va, vb, ni, j) == (3L, 3L, 2L, 500000L))
    // s1 ∩ s3 = 0, pair still present with jaccard 0
    val Row(_, _, _, _, ni13, j13) = r(("s1", "s3"))
    assert((ni13, j13) == (0L, 0L))
  }

  test("psiDrift: identical halves give PSI = 0; one-sided type gives NULL") {
    val same = ev(
      (1L, 0L, "a", 5.0), (2L, 1000000000L, "a", 15.0),
      (3L, 2000000000L, "a", 5.0), (4L, 3000000000L, "a", 15.0))
    val r = Drift.psiDrift(same).collect()
    val Row(_, n0, n1, nBins, psi) = r(0)
    assert((n0, n1, nBins, psi) == (2L, 2L, 2L, 0L))
    // type b only before the global midpoint → undefined → NULL
    val oneSided = ev(
      (1L, 0L, "b", 1.0),
      (2L, 6000000000L, "a", 1.0), (3L, 0L, "a", 1.0))
    val m = Drift.psiDrift(oneSided).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(m("b").isNullAt(4))
    assert(!m("a").isNullAt(4))
  }

  test("psiDrift matches the hand-evaluated smoothed PSI") {
    // early = {bin0: 2, bin1: 1}, late = {bin0: 1, bin1: 2}, B = 2
    // p0(bin0) = 3/5, p1(bin0) = 2/5 → (−0.2)·ln(2/3) = 0.0810930…
    // bin1 symmetric → per-bin micro floor 81093, total 162186
    val df = ev(
      (1L, 0L, "a", 1.0), (2L, 1000L, "a", 2.0), (3L, 2000L, "a", 11.0),
      (4L, 6000000000L, "a", 1.0), (5L, 6000001000L, "a", 11.0),
      (6L, 6000002000L, "a", 12.0))
    val Row(_, n0, n1, nBins, psi) = Drift.psiDrift(df).collect()(0)
    assert((n0, n1, nBins) == (3L, 3L, 2L))
    assert(psi == 162186L)
  }

  test("sourceKl: a single source has zero divergence from the blend") {
    val docs = Seq((1L, "alpha beta alpha", "s1"), (2L, "beta", "s1"))
      .toDF("doc_id", "text", "source")
    val Row(_, nTok, vocab, kl) = Drift.sourceKl(docs).collect()(0)
    assert((nTok, vocab, kl) == (4L, 2L, 0L))
  }

  test("sourceKl matches the hand-evaluated micro-floored KL") {
    // A: {x:2, y:1} (n=3), B: {x:1, z:1} (n=2); corpus {x:3, y:1, z:1}/5
    // A: (2/3)ln((2/3)/(3/5)) + (1/3)ln((1/3)/(1/5))
    //    → floor 70240 + floor 170275 = 240515
    // B: (1/2)ln((1/2)/(3/5)) + (1/2)ln((1/2)/(1/5))
    //    → floor(−91160.7…) = −91161, floor 458145 → 366984
    val docs = Seq((1L, "x x y", "A"), (2L, "x z", "B"))
      .toDF("doc_id", "text", "source")
    val r = Drift.sourceKl(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3))).toMap
    assert(r("A") == ((3L, 2L, 240515L)))
    assert(r("B") == ((2L, 2L, 366984L)))
  }

  test("jsDivergence: a single source is the blend — zero distance") {
    val docs = Seq((1L, "alpha beta alpha", "s1"), (2L, "beta", "s1"))
      .toDF("doc_id", "text", "source")
    val Row(_, nTok, js) = Drift.jsDivergence(docs).collect()(0)
    assert((nTok, js) == (4L, 0L))
  }

  test("jsDivergence: disjoint-vocab sources, absent tokens carry their q·ln2 mass") {
    // A: {a:2}, B: {b:2}, corpus {a:2,b:2}/4. For A — cell a: p=1,
    // q=1/2, m=3/4: 1·ln(4/3) + ½·ln(2/3) = 0.08494951… → ×500000
    // floor 42474; cell b (ABSENT from A): ½·ln((1/2)/(1/4)) = ½·ln 2
    // → floor 173286. js_micro = 215760, symmetric for B. Dropping
    // the absent cell would halve the distance — the grid is load-
    // bearing, exactly like the t-closeness TVD zero cells.
    val docs = Seq((1L, "a a", "A"), (2L, "b b", "B"))
      .toDF("doc_id", "text", "source")
    val r = Drift.jsDivergence(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("A") == ((2L, 215760L)))
    assert(r("B") == ((2L, 215760L)))
  }

  test("emdLengthDrift: identical length dists at zero; gap-weighted CDF steps") {
    // A: both docs in bucket 0; B: both in bucket 2; bucket 1 is EMPTY.
    // CDF_A=[1,1] vs CDF_C=[½,1] at support {0,2} — the deviation at
    // bucket 0 holds across the empty bucket (gap 2), so W₁ = 2·½ = 1
    // bucket exactly: emd_micro = 1000000 for both sources (an
    // unweighted sum would misprice it at 500000). C has one doc in
    // each bucket — the blend itself → 0.
    val docs = Seq(
      (1L, "t", "A", 10L), (2L, "t", "A", 20L),
      (3L, "t", "B", 100L), (4L, "t", "B", 110L),
      (5L, "t", "C", 30L), (6L, "t", "C", 120L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Drift.emdLengthDrift(docs).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("A") == ((2L, 1000000L)))
    assert(r("B") == ((2L, 1000000L)))
    assert(r("C") == ((2L, 0L)))
  }

  test("labelSimMatrix: parallel centroids at cos 1, orthogonal at 0; counts cancel") {
    // label 0: two vectors along e1 (count 2); label 2: ONE vector along
    // e1 — different counts, same direction → cos(0,2) must still be 1
    // (the sum-vector trick: means never materialize). label 1 ⟂ both.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.5f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Drift.labelSimMatrix(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0L, 1L) -> 0.0, (0L, 2L) -> 1.0, (1L, 2L) -> 0.0))
  }
}
