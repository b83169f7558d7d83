package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Distribution-drift detection — the audit that decides whether a new
 * corpus drop still looks like the corpus a model was trained on. Two
 * first-class shapes:
 *
 *  - [[valueDrift]]: chi-square homogeneity of the per-type value
 *    histogram between the EARLY and LATE halves of the time range
 *    (feature drift over time — the retrain trigger);
 *  - [[vocabJaccard]]: pairwise vocabulary Jaccard between sources
 *    (corpus-mixing audit: how much two feeds overlap lexically).
 *
 * Both are exact-integer end to end (micro-scaled floors), so the DuckDB
 * oracle reproduces every bit; the chi-square intermediates ride
 * DECIMAL/HUGEINT (a count product squared overflows int64).
 *
 * Reference scope: the reference engine has no drift surface
 * (trends/listing/service.go:47-62 is its one query); this extends the
 * same tick/corpus tables toward the training-pipeline feature set.
 */
object Drift {

  /** Per-type chi-square drift statistic between time halves.
    *
    * Split point = (min μs + max μs) div 2 over the WHOLE stream (one
    * tiny agg, broadcast) — a fixed wall-clock midpoint, not a row-count
    * median, so both engines and any partitioning agree. Bins reuse the
    * `value_histogram` width (10.0; exact-double floors on 2-dp values).
    *
    * χ²·10⁶ = (Σ_b (c0·n1 − c1·n0)²·10⁶ div (c0+c1)) div (n0·n1),
    * summed per type — the two-sample homogeneity form with per-bin
    * floors; every numerator is a square (nonnegative), so truncating
    * div IS floor on both engines. NULL when a half is empty (the
    * statistic is undefined; DuckDB's integer x//0 NULL convention is
    * not relied on — both sides CASE it explicitly).
    *
    * Shape at 100 TB: ONE data-sized shuffle — the (type, bin) partial
    * aggregate (histogram cardinality is types × bins regardless of
    * corpus size); totals join back on the bins×types relation,
    * broadcast-sized by construction. */
  def valueDrift(events: DataFrame, width: Double = 10.0): DataFrame =
    chiSquare(binnedHalves(events, width))

  /** The shared (event_type, bin, c0, c1) histogram between the
    * wall-clock halves — the input frame for [[chiSquare]] and [[psi]].
    * Split point = (min μs + max μs) div 2 over the WHOLE stream (one
    * tiny agg, broadcast) — a fixed wall-clock midpoint, not a
    * row-count median, so both engines and any partitioning agree. */
  private def binnedHalves(events: DataFrame, width: Double): DataFrame = {
    val mid = events.agg(
      expr("(min(ts_ns div 1000) + max(ts_ns div 1000)) div 2").as("mid"))
    events
      .select(col("event_type"), expr("ts_ns div 1000").as("us"),
        floor(col("value") / width).cast("long").as("bin"))
      .crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("c0"),
        sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("c1"))
  }

  /** Per-type Population Stability Index between the same wall-clock
    * halves as [[valueDrift]] — the retrain-trigger metric model-ops
    * dashboards threshold on (PSI < 0.1 stable, > 0.25 drifted), read
    * next to chi² (significance) and KS (shape).
    *
    * PSI = Σ_b (p1 − p0)·ln(p1/p0) with +1 Laplace smoothing over the
    * OBSERVED (type, bin) set: p0 = (c0+1)/(n0+B), p1 = (c1+1)/(n1+B),
    * B = bins observed for the type — every observed bin contributes,
    * zero-count halves included, and the smoothed ratios are strictly
    * positive so ln() is total. Each term is ≥ 0 ((p1−p0) and
    * ln(p1/p0) share sign), so the statistic is a sum of nonnegative
    * terms.
    *
    * Float determinism: a cross-row double sum is order-dependent — the
    * shape the determinism ladder forbids — so each term is floored
    * onto the integer micro grid FIRST (the [[TextAnalysis.lmPerplexity]]
    * surrogate) and the per-type sum runs in exact BIGINT. NULL when a
    * half is empty (the statistic is undefined). */
  def psiDrift(events: DataFrame, width: Double = 10.0): DataFrame =
    psi(binnedHalves(events, width))

  /** The PSI assembly over a generic (event_type, bin, c0, c1) count
    * relation — the [[chiSquare]] twin, shared so a streaming variant
    * (frozen reference vs live counts) equals the batch statistic by
    * construction. Input is group-cardinality (types × bins). */
  def psi(binned: DataFrame): DataFrame = {
    val totals = binned.groupBy(col("event_type"))
      .agg(sum(col("c0")).cast("long").as("n0"),
        sum(col("c1")).cast("long").as("n1"),
        count(lit(1)).as("nb"))
    binned.join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n0")).as("n_early"), max(col("n1")).as("n_late"),
        max(col("nb")).as("n_bins"),
        sum(expr("""CAST(floor(
            |  ((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) -
            |   (CAST(c0 + 1 AS DOUBLE) / (n0 + nb))) *
            |  ln((CAST(c1 + 1 AS DOUBLE) / (n1 + nb)) /
            |     (CAST(c0 + 1 AS DOUBLE) / (n0 + nb))) * 1000000)
            |AS BIGINT)""".stripMargin)).as("s"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("n_bins"),
        expr("CASE WHEN n_early = 0 OR n_late = 0 THEN NULL ELSE s END")
          .as("psi_micro"))
      .orderBy(col("event_type"))
  }

  /** The chi-square assembly over a generic (event_type, bin, c0, c1)
    * count relation — shared by [[valueDrift]] (time halves) and
    * `streaming.StreamDrift` (frozen reference vs live counts), so the
    * streamed statistic equals the batch one by construction. The input
    * is group-cardinality (types × bins), never corpus-sized.
    *
    * Headroom: the naive exact numerator (c0·n1 − c1·n0)²·10⁶ needs
    * (n0·n1)²·10⁶ ≤ 10³⁸ — dead past ~10⁸ rows per half. This assembly
    * computes the IDENTICAL integer via two exact Euclidean splits, so
    * the oversized products never materialize:
    *
    *   d = c0·n1 − c1·n0;  t = c0 + c1;  |d| = a·t + b  (0 ≤ b < t)
    *   d² div t   = a²·t + 2ab + b² div t          (every term exact)
    *   d² mod t   = b² mod t = r
    *   d²·10⁶ div t = (d² div t)·10⁶ + r·10⁶ div t  (exact: the
    *     quotient part is divisible by t after scaling)
    *
    * Largest intermediate is now a²·t·10⁶ ≤ max(n0,n1)³·2·10⁶ — exact
    * through DECIMAL38/HUGEINT for per-type per-half counts up to
    * ~3·10¹⁰ rows (two orders past the old bound; trillions-of-raw-rows
    * halves should pre-aggregate to coarser bins first — χ² inputs are
    * (type, bin) counts, so that is a grain choice, not a limit of this
    * operator). Values are bit-identical to the one-shot formula — the
    * driver hash proves it against the oracle's direct statement. */
  def chiSquare(binned: DataFrame): DataFrame = {
    val totals = binned.groupBy(col("event_type"))
      .agg(sum(col("c0")).cast("long").as("n0"),
        sum(col("c1")).cast("long").as("n1"),
        count(lit(1)).as("n_bins"))
    binned.join(broadcast(totals), Seq("event_type"))
      .withColumn("t", expr("c0 + c1"))
      .withColumn("ad", expr("""abs(CAST(c0 AS DECIMAL(19,0)) * n1 -
        | CAST(c1 AS DECIMAL(19,0)) * n0)""".stripMargin))
      .withColumn("a", expr("ad div t")) // ≤ max(n0, n1): fits BIGINT
      .withColumn("b", expr("CAST(ad % t AS BIGINT)"))
      .withColumn("term", expr(
        """(CAST(a AS DECIMAL(19,0)) * a * t +
          | 2 * CAST(a AS DECIMAL(19,0)) * b +
          | CAST(b AS DECIMAL(19,0)) * b div t) * 1000000 +
          |(CAST(CAST(b AS DECIMAL(19,0)) * b % t AS BIGINT)
          | * 1000000) div t""".stripMargin))
      .groupBy(col("event_type"))
      .agg(max(col("n0")).as("n_early"), max(col("n1")).as("n_late"),
        max(col("n_bins")).as("n_bins"),
        sum(expr("CAST(term AS DECIMAL(38,0))")).as("s"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("n_bins"),
        expr("""CASE WHEN n_early = 0 OR n_late = 0 THEN NULL
                |ELSE CAST(s div (CAST(n_early AS DECIMAL(19,0)) * n_late)
                |          AS BIGINT) END""".stripMargin).as("chi2_micro"))
      .orderBy(col("event_type"))
  }

  /** Per-type two-sample Kolmogorov–Smirnov drift statistic between the
    * same wall-clock halves as [[valueDrift]] — the binning-free
    * companion (chi-square sees density shifts; KS sees location/shape
    * shifts a coarse histogram can miss).
    *
    * D·10⁶ = max over distinct values of |k0·n1 − k1·n0|·10⁶
    * div (n0·n1), where k0/k1 are cumulative counts at-or-below the
    * value — the empirical-CDF gap in exact integers (DECIMAL/HUGEINT
    * intermediates; at corpus scale the count product overflows int64).
    * NULL when a half is empty.
    *
    * Shape at 100 TB: one (type, value) partial aggregate (output
    * bounded by types × value domain — 2-dp values, not corpus rows),
    * then a per-type running-sum window over that bounded relation. */
  def ksDrift(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mid = events.agg(
      expr("(min(ts_ns div 1000) + max(ts_ns div 1000)) div 2").as("mid"))
    val counts = events
      .select(col("event_type"), expr("ts_ns div 1000").as("us"),
        col("value"))
      .crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("value"))
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("c0"),
        sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("c1"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("c0")).cast("long").as("n0"),
        sum(col("c1")).cast("long").as("n1"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("k0", sum(col("c0")).over(w))
      .withColumn("k1", sum(col("c1")).over(w))
      .join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n0")).as("n_early"), max(col("n1")).as("n_late"),
        max(expr("""abs(CAST(k0 AS DECIMAL(19,0)) * n1 -
                    |    CAST(k1 AS DECIMAL(19,0)) * n0)""".stripMargin))
          .as("gap"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        expr("""CASE WHEN n_early = 0 OR n_late = 0 THEN NULL
                |ELSE CAST(gap * 1000000
                |  div (CAST(n_early AS DECIMAL(19,0)) * n_late)
                |  AS BIGINT) END""".stripMargin).as("ks_micro"))
      .orderBy(col("event_type"))
  }

  /** Per-label centroid shift in EMBEDDING space between the early and
    * late vec_id halves (ingest-order surrogate: "did the new drop's
    * vectors move?") — the embedding-modality member of the drift
    * family (chi-square/KS see scalar values; this sees representation
    * drift the value columns can't).
    *
    * Exact-integer end to end: each float dim is floored onto a micro
    * scale WITH a +10⁶ offset so every per-dim sum and mean stays
    * strictly positive — truncating integer division then IS floor on
    * both engines (Spark `div` truncates toward zero, DuckDB `//`
    * floors; they only agree on nonnegative operands). The offset
    * cancels in the mean difference. The offset is derived from the
    * embedding data contract |x| ≤ 1 (unit-normalized components): a
    * dim below −1 would make xi negative and silently reintroduce the
    * trunc-vs-floor divergence — DriftSpec asserts the precondition on
    * the corpus alongside the μ-alignment invariant. Per-dim means are bounded by the
    * value range REGARDLESS of corpus size, so d, d², and Σd² over 64
    * dims all fit BIGINT at any scale — no HUGEINT anywhere.
    *
    *   shift2_micro2 = Σ_i ((s0_i div c0) − (s1_i div c1))²   [micro²]
    *   max_dim_shift_micro = max_i |…|                        [micro]
    *
    * NULL when a half has no vectors for the label (both engines CASE
    * it explicitly). Shape at 100 TB: ONE data-sized shuffle — the
    * (label, dim) partial aggregate (output bounded by labels × dims);
    * everything after runs on that bounded relation. */
  /** Pairwise COSINE between label centroids — the embedding-space
    * separability matrix next to [[embeddingDrift]]'s time view: labels
    * whose centroids sit at cos ≈ 1 are regions the space does not
    * separate (expect confusions, poor hard-negative mining, unreliable
    * IVF purity there); a near-orthogonal matrix is the healthy read.
    *
    * Exactness: the per-label mean NEVER materializes — cosine is
    * scale-invariant, so the per-(label, dim) integer SUM vectors
    * n_i = Σ floor(x·10⁶) (exact BIGINTs, the embeddingDrift micro
    * convention without the offset — sums may be negative but no
    * division happens) stand in for the centroids; dot and norms ride
    * DECIMAL(38)/HUGEINT, and the ONLY float ops are the final
    * sqrt·sqrt·divide on exact integers, the identical IEEE expression
    * both engines evaluate (the ulcer_index convention), 6-dp rounded.
    * Zero-sum centroids yield NULL (guarded — Spark ÷0 is Inf, DuckDB
    * NULL). Everything after the scan is bounded by labels × dims.
    *
    * Bound: the BIGINT sum vector needs |Σ floor(x·10⁶)| < 2⁶³, i.e.
    * under ~9·10¹² vectors per label at |x| ≤ 1 — beyond any labeled
    * corpus; the products already ride DECIMAL(38)/HUGEINT. */
  def labelSimMatrix(embeddings: DataFrame): DataFrame = {
    val nvec = embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("i"),
        floor(col("x").cast("double") * 1000000).cast("long").as("xi"))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("xi")).cast("long").as("n"))
    val norms = nvec.groupBy(col("label"))
      .agg(sum(col("n").cast("decimal(38,0)") * col("n")).as("n2"))
    val dots = nvec.as("a")
      .join(nvec.as("b"),
        col("a.i") === col("b.i") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("la"), col("b.label").as("lb"))
      .agg(sum(col("a.n").cast("decimal(38,0)") * col("b.n")).as("dot"))
    dots
      .join(norms.select(col("label").as("la"), col("n2").as("na2")), "la")
      .join(norms.select(col("label").as("lb"), col("n2").as("nb2")), "lb")
      .select(col("la"), col("lb"),
        when(col("na2") > 0 && col("nb2") > 0,
          round(col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))),
            6)).as("cos6"))
      .orderBy(col("la"), col("lb"))
  }

  def embeddingDrift(embeddings: DataFrame): DataFrame = {
    val mid = embeddings.agg(
      expr("(min(vec_id) + max(vec_id)) div 2").as("mid"))
    val dims = embeddings
      .crossJoin(broadcast(mid))
      .select(col("label").cast("long").as("label"),
        when(col("vec_id") <= col("mid"), 0).otherwise(1).as("half"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("half"), col("i"),
        (floor(col("x").cast("double") * 1000000).cast("long") +
          1000000L).as("xi"))
      .groupBy(col("label"), col("i"))
      .agg(sum(when(col("half") === 0, col("xi"))).as("s0"),
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("half") === 1, col("xi"))).as("s1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"))
    centroidShift(dims)
  }

  /** Per-BIT activation counts of the binary-quantization sign codes
    * (bit i set iff `emb[i] >= 0` AND not NaN — [[graft.functions
    * .SignPack]]'s Java-comparison contract; Spark SQL's own `>= 0`
    * would SET the bit on NaN because SQL comparison orders NaN above
    * every float, so the NaN case is excluded explicitly to keep the
    * monitor's rule identical to the pack rule it monitors): one
    * (bit, set-count, count) row per bit — the SUM-mergeable
    * sufficient statistic under [[bqBitDriftFrom]], shared by the
    * streaming twin so streamed ≡ batch. */
  def bqBitSums(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding")).as(Seq("bit", "x")))
      .filter(col("bit") < 64)
      .groupBy(col("bit"))
      .agg(sum(when(col("x") >= 0 && !isnan(col("x")), 1L).otherwise(0L))
        .as("s"),
        count(lit(1)).as("c"))

  /** The per-bit drift assembly over a generic (bit, s0, c0, s1, c1)
    * relation — rates in integer micros, truncating division (all
    * terms nonnegative ⇒ floor on both engines). Input is ≤ 64 rows. */
  def bqBitDriftFrom(bits: DataFrame): DataFrame =
    bits
      .select(col("bit"),
        expr("CASE WHEN c0 > 0 THEN s0 * 1000000 div c0 END")
          .as("ref_rate_micro"),
        expr("CASE WHEN c1 > 0 THEN s1 * 1000000 div c1 END")
          .as("new_rate_micro"))
      .withColumn("delta_micro",
        abs(col("ref_rate_micro") - col("new_rate_micro")))
      .orderBy(col("bit"))

  /** Per-BIT activation drift of the BQ codes between vec_id halves —
    * the 1-bit marginal of [[embeddingDrift]] and the cheapest
    * embedding-distribution monitor there is: a bit whose set-rate
    * moves is a sign dimension whose balance moved (a "rogue
    * dimension" forming, an encoder swap, a normalization bug), caught
    * from 8-byte codes without touching float geometry. Integer-exact
    * end to end, so the oracle replays it bit-for-bit. Output ≤ 64
    * rows; the scan is the same 64-rows-per-vector posexplode shape as
    * [[embeddingDrift]], collapsing to a bit-cardinality aggregate. */
  def bqBitDrift(embeddings: DataFrame): DataFrame = {
    val mid = embeddings.agg(
      expr("(min(vec_id) + max(vec_id)) div 2").as("mid"))
    val bits = embeddings
      .crossJoin(broadcast(mid))
      .select(when(col("vec_id") <= col("mid"), 0).otherwise(1).as("half"),
        posexplode(col("embedding")).as(Seq("bit", "x")))
      .filter(col("bit") < 64)
      .groupBy(col("bit"))
      .agg(
        // sign rule = SignPack's (bit clear on NaN) — see bqBitSums
        sum(when(col("half") === 0 && col("x") >= 0 && !isnan(col("x")),
          1L).otherwise(0L)).as("s0"),
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("half") === 1 && col("x") >= 0 && !isnan(col("x")),
          1L).otherwise(0L)).as("s1"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"))
    bqBitDriftFrom(bits)
  }

  /** The centroid-shift assembly over a generic (label, i, s0, c0, s1,
    * c1) per-dim sum/count relation — shared by [[embeddingDrift]]
    * (vec_id halves) and `streaming.StreamEmbeddingDrift` (frozen
    * reference vs live sums), so the streamed statistic equals the
    * batch one by construction. Input is labels × dims, never
    * corpus-sized. */
  def centroidShift(dims: DataFrame): DataFrame =
    dims
      .select(col("label"), col("c0"), col("c1"),
        expr("""CASE WHEN c0 = 0 OR c1 = 0 THEN NULL
                |ELSE (s0 div c0) - (s1 div c1) END""".stripMargin).as("d"))
      .groupBy(col("label"))
      .agg(max(col("c0")).as("n_ref"), max(col("c1")).as("n_new"),
        sum(expr("d * d")).as("shift2_micro2"),
        max(abs(col("d"))).as("max_dim_shift_micro"))
      .orderBy(col("label"))

  /** Pairwise source vocabulary Jaccard — every unordered source pair,
    * zero-overlap pairs included (the full mixing matrix).
    *
    * jaccard_micro = |A∩B|·10⁶ div (|A|+|B|−|A∩B|), exact BIGINTs.
    *
    * Shape at 100 TB: the (source, token) DISTINCT is the one data-sized
    * shuffle (its output is bounded by sources × vocabulary, not corpus
    * rows); the intersection self-join keys on token over that bounded
    * relation, and the pair matrix itself is sources² — driver-trivial.
    * Tokenization is the repo-wide [[TextOps.tokens]] normalization, so
    * the oracle reproduces it 1:1. */
  def vocabJaccard(documents: DataFrame): DataFrame = {
    val vocab = documents
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = vocab.groupBy(col("source"))
      .agg(count(lit(1)).as("v"))
    val inter = vocab.toDF("sa", "tok")
      .join(vocab.toDF("sb", "tok"), Seq("tok"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = broadcast(sizes.toDF("sa", "va"))
      .join(broadcast(sizes.toDF("sb", "vb")), col("sa") < col("sb"))
    pairs.join(inter, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("va").as("vocab_a"), col("vb").as("vocab_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("jaccard_micro",
        expr("n_inter * 1000000 div (vocab_a + vocab_b - n_inter)"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Per-source unigram KL divergence vs the whole corpus — the mixing
    * diagnostic that ranks sources by how far their token distribution
    * sits from the blend they feed ([[vocabJaccard]] compares vocabulary
    * SETS pairwise; this weighs the FREQUENCIES against the mixture).
    * High-KL sources dominate a temperature-mix decision: they are the
    * ones whose up/down-weighting actually moves the blend.
    *
    * KL(p_s ‖ p_c) = Σ_{t: c_s(t)>0} p_s·ln(p_s/p_c), p_s = c_s(t)/n_s,
    * p_c = c(t)/N — both ratios of exact counts; terms where the source
    * lacks the token contribute 0 by the 0·ln0 convention, and p_c > 0
    * whenever p_s > 0 (a source token IS a corpus token), so ln() is
    * total. Per-term contributions carry MIXED signs (total ≥ 0); each
    * is floored onto the integer micro grid first and the per-source
    * sum runs in exact BIGINT (the [[TextAnalysis.lmPerplexity]]
    * surrogate — floor is toward −∞ for negatives on both engines).
    *
    * Shape at 100 TB: ONE tokenize feeds the (source, token) count
    * aggregate — bounded by sources × vocabulary, not corpus rows; the
    * per-token corpus totals re-aggregate THAT relation and join back
    * token-keyed; source totals and the corpus grand total broadcast. */
  def sourceKl(documents: DataFrame,
      tokenTf: Option[DataFrame] = None): DataFrame = {
    // per-source view derives from the shared per-doc tf census via a
    // doc->source join (doc-cardinality; size-based planning
    // broadcasts while it fits — no forced broadcast, which would cap
    // out at corpus scale)
    val cnt = tokenTf.map(_.join(
        documents.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"), col("tok"))
        .agg(sum(col("tf")).cast("long").as("c")))
      .getOrElse(documents
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c")))
    val srcTot = cnt.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("ns"),
        count(lit(1)).as("vocab"))
    val termTot = cnt.groupBy(col("tok"))
      .agg(sum(col("c")).cast("long").as("ct"))
    val corpus = srcTot.agg(sum(col("ns")).cast("long").as("n"))
    cnt.join(termTot, Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), max(col("vocab")).as("vocab"),
        sum(expr("""CAST(floor(
            |  (CAST(c AS DOUBLE) / ns) *
            |  ln((CAST(c AS DOUBLE) / ns) /
            |     (CAST(ct AS DOUBLE) / n)) * 1000000)
            |AS BIGINT)""".stripMargin)).as("kl_micro"))
      .orderBy(col("source"))
  }

  /** Per-source Jensen–Shannon divergence vs the corpus blend — the
    * symmetric, bounded (≤ ln 2) companion to [[sourceKl]]: KL answers
    * "how surprised is the corpus LM by this source", JS answers "how
    * far apart are the two distributions" without KL's asymmetry or its
    * blow-up on rare-token sources, so it is the number mixing
    * dashboards actually plot side by side across feeds.
    *
    * JS(p‖q) = ½·Σ_t [p·ln(p/m) + q·ln(q/m)], m = (p+q)/2, p = source
    * unigram dist, q = corpus dist. Unlike KL, tokens ABSENT from the
    * source still contribute (their q·ln(q/m) = q·ln 2 mass is exactly
    * what separates a narrow source from the blend), so the sum runs
    * over the full source × vocabulary grid, with absent cells restored
    * by a left join — the same restored-zero-cell discipline as the
    * t-closeness TVD audit. p = 0 terms use the 0·ln 0 = 0 convention;
    * q > 0 always (a vocab token IS a corpus token), so ln() is total.
    *
    * Determinism: each grid cell's combined term is one float
    * expression over exact integer counts, floored onto the micro grid
    * (×10⁶, the ½ folded into a ×500000 scale so the floor is the only
    * rounding), and the per-source sum runs in exact BIGINT — the
    * [[sourceKl]] ladder verbatim.
    *
    * Shape at 100 TB: everything after the one tokenize is bounded by
    * sources × vocabulary — cnt, the term census, and the grid (a
    * broadcast cross of two aggregates, left-joined back to cnt).
    * Nothing is corpus-row-sized past the first aggregate. */
  def jsDivergence(documents: DataFrame,
      tokenTf: Option[DataFrame] = None): DataFrame = {
    val cnt = tokenTf.map(_.join(
        documents.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"), col("tok"))
        .agg(sum(col("tf")).cast("long").as("c")))
      .getOrElse(documents
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c")))
    val srcTot = cnt.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("ns"))
    val termTot = cnt.groupBy(col("tok"))
      .agg(sum(col("c")).cast("long").as("ct"))
    val corpus = srcTot.agg(sum(col("ns")).cast("long").as("n"))
    // vocab-sized × BROADCAST sources-sized grid (explicit hint so the
    // cross can never degrade to CartesianProduct on stats-less input)
    termTot.crossJoin(broadcast(srcTot))
      .join(cnt, Seq("source", "tok"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(corpus))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"),
        sum(expr("""CAST(floor((
            |  CASE WHEN c = 0 THEN CAST(0 AS DOUBLE)
            |       ELSE (CAST(c AS DOUBLE) / ns) *
            |         ln((CAST(c AS DOUBLE) / ns) /
            |            ((CAST(c AS DOUBLE) / ns + CAST(ct AS DOUBLE) / n) / 2))
            |  END
            |  + (CAST(ct AS DOUBLE) / n) *
            |    ln((CAST(ct AS DOUBLE) / n) /
            |       ((CAST(c AS DOUBLE) / ns + CAST(ct AS DOUBLE) / n) / 2))
            |) * 500000) AS BIGINT)""".stripMargin)).as("js_micro"))
      .orderBy(col("source"))
  }

  /** Per-source 1-D Wasserstein (earth-mover) distance between the
    * source's document-length distribution and the corpus blend — the
    * transport metric completing the drift kit (χ² / KS / PSI / KL /
    * JS / TVD): KS sees only the worst single CDF gap and TVD ignores
    * ORDER entirely, so a source whose lengths are shifted one bucket
    * over scores the same TVD as one shifted ten buckets over; EMD is
    * the audit that prices the shift by how far the mass must move —
    * the quantity that actually predicts sequence-packing and batch-
    * shape damage when a feed drifts long or short.
    *
    * On an ordered 1-D integer support the transport problem is closed
    * form: W₁ = ∫|CDF_s − CDF_c| (Vallender 1974), which over the
    * discrete support is Σ_b |CDF_s(b) − CDF_c(b)|·gap(b) with gap(b) =
    * distance to the NEXT occupied bucket — the CDF is a step function,
    * so a deviation holds across every empty bucket until the next
    * support point (drop the gap and a 10-bucket shift prices like a
    * 1-bucket shift). Absent (source, bucket) cells must still ride the
    * running sums, so the cumulative runs over the full source × bucket
    * grid (restored-zero-cell discipline again); the final support
    * point's gap is 0 (both CDFs are 1 there — zero deviation anyway).
    *
    * Determinism: the CDF difference per bucket is the exact integer
    * |cum_s·N − cum_c·ns| widened through DECIMAL(38,0) (cum·count
    * products pass 2⁶³ near 10¹⁰ rows), summed exactly, with ONE
    * micro-floor division at the end — no float anywhere, so the
    * distance cannot flip with partitioning or combine order.
    *
    * Shape at 100 TB: one scan → the (source, bucket) cell aggregate;
    * everything after is attribute-domain-bounded (sources × buckets).
    * The window cumulative runs per-source over that bounded grid —
    * a few hundred rows regardless of corpus size — never over data. */
  def emdLengthDrift(documents: DataFrame, bucket: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = documents.select(col("source"),
      expr(s"n_chars div $bucket").as("b"))
    val cell = base.groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val srcTot = cell.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("ns"))
    // gap to the next occupied bucket: a bounded-relation window (the
    // bucket census, never data rows) — the same day-spine class the
    // repo's single-partition-window allowance documents
    val bkTot = cell.groupBy(col("b"))
      .agg(sum(col("c")).cast("long").as("cb"))
      .withColumn("gap", coalesce(
        lead(col("b"), 1).over(Window.orderBy(col("b"))) - col("b"),
        lit(0L)))
    val corpus = bkTot.agg(sum(col("cb")).cast("long").as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("b"))
    srcTot.crossJoin(broadcast(bkTot))
      .join(cell, Seq("source", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_s", sum(col("c")).over(w))
      .withColumn("cum_c", sum(col("cb")).over(w))
      .crossJoin(broadcast(corpus))
      .groupBy(col("source"), col("ns"), col("n"))
      .agg(sum(expr("abs(CAST(cum_s AS DECIMAL(38,0)) * n" +
        " - CAST(cum_c AS DECIMAL(38,0)) * ns) * gap")).as("dev"))
      .select(col("source"), col("ns").as("n_docs"),
        expr("CAST(dev * 1000000 div (CAST(ns AS DECIMAL(38,0)) * n)" +
          " AS BIGINT)").as("emd_micro"))
      .orderBy(col("source"))
  }
}
