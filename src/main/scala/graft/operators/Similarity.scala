package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`embeddings.parquet`: vec_id, embedding Array[Float], label).
 *
 * Two paths, per the training-data-pipeline brief:
 *  - brute-force cosine top-k: the exactness baseline. Query set is tiny and
 *    broadcast; candidates stream through a single scan (no shuffle of the
 *    corpus), per-query heap via window row_number at (queries × corpus)
 *    cardinality.
 *  - LSH-bucketed top-k: the 100 TB scale path. Deterministic random-
 *    hyperplane signatures (seeded xxhash64-derived planes — no RNG state,
 *    reproducible across executors); candidates only from the query's
 *    bucket, so per-query work drops from O(N) to O(N / 2^bits) expected.
 *    Recall is approximate by construction — verified in ScalaTest against
 *    the brute-force baseline, not the SQL oracle.
 */
object Similarity {

  /** NULLS-LAST heap key for the bounded-heap ANN rank: a zero-norm
    * vector has undefined cosine (cos = NULL), and [[graft.functions
    * .TopKRows]] drops null scores outright — whereas the row_number
    * window these operators replaced ordered `cos DESC NULLS LAST` and
    * still EMITTED such degenerate candidates when fewer than k finite
    * ones existed. Mapping NULL to Long.MinValue restores that
    * contract: MinValue is below every real cosine's order key (its
    * [[graft.functions.OrderBits]] preimage is negative NaN, which no
    * cosine in [-1, 1] produces), so degenerate candidates rank last
    * but are kept. [[keyCos6]] is the readout half, mapping the
    * sentinel back to a NULL cosine. */
  private def nullsLastKey(cos: Column): Column = {
    import graft.functions.OrderBits.order_bits
    coalesce(order_bits(cos), lit(Long.MinValue))
  }

  /** Readout of [[nullsLastKey]]: the 6-dp cosine, NULL for the
    * degenerate-candidate sentinel. */
  private def keyCos6(key: Column): Column = {
    import graft.functions.OrderBits.bits_order
    when(key =!= Long.MinValue, round(bits_order(key), 6))
  }

  /** Exact brute-force cosine top-k for a fixed set of query vectors.
    * Output: (query_id, rank, neighbor_id, cos6) — ints plus a 6-dp cosine.
    *
    * Ranking rides the bounded-heap [[graft.functions.TopKRows]]
    * aggregate on the order-isomorphic bit key
    * ([[graft.functions.OrderBits]] — lossless, so ties and ranks are
    * exactly the (cos DESC, vec_id ASC) order a sort would produce):
    * each map-side partial keeps ≤ k candidates per query, the shuffle
    * carries ≤ k rows per (query × partition), and NOTHING is ever
    * per-query full-sorted — the row_number-window form this replaced
    * held corpus-sized window partitions per query. */
  def annBruteForce(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10): DataFrame = {
    import graft.functions.OrderBits.{bits_order, order_bits}
    import graft.functions.TopKRows.topk_rows
    // precompute norms once per vector — never per candidate pair
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val queries = broadcast(
      corpus
        .filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm")))
    val denom = col("nrm") * col("q_nrm")
    corpus
      .crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .as("cos"))
      .groupBy(col("query_id"))
      .agg(topk_rows(nullsLastKey(col("cos")), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        keyCos6(col("col.score")).as("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative mining for contrastive training — for each query
    * vector, the top-k most-similar vectors carrying a DIFFERENT label:
    * exactly the "hard negatives" a retrieval/embedding trainer pairs
    * with each anchor (random negatives are too easy; the near-miss
    * wrong-label neighbors are where the gradient signal is). Same
    * exact-cosine scoring, (cos desc, vec_id) rank order, and
    * broadcast-queries/stream-corpus shape as [[annBruteForce]] — the
    * label inequality is one extra pushed filter on the candidate scan,
    * so the plan is the ANN plan minus the same-label candidates. At
    * 100 TB the IVF/LSH retrievers substitute as with ANN; mining then
    * probes write-time cells instead of scanning. */
  def hardNegatives(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10): DataFrame = {
    import graft.functions.OrderBits.{bits_order, order_bits}
    import graft.functions.TopKRows.topk_rows
    val corpus = embeddings.select(col("vec_id"), col("label"),
      col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val queries = broadcast(
      corpus
        .filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm")))
    val denom = col("nrm") * col("q_nrm")
    // bounded-heap rank (the annBruteForce shape); the heap carries
    // (score, id) only, so the neighbor's label re-attaches from a
    // pruned 2-column scan via a broadcast of the queries·k result —
    // never a second shuffle, never a sort
    val top = corpus
      .crossJoin(queries)
      .filter(col("label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"), col("vec_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .as("cos"))
      .groupBy(col("query_id"), col("q_label"))
      .agg(topk_rows(nullsLastKey(col("cos")), col("vec_id"), k).as("top"))
      .select(col("query_id"), col("q_label"), posexplode(col("top")))
      .select(col("query_id"), col("q_label"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        keyCos6(col("col.score")).as("cos6"))
    embeddings
      .select(col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label"))
      .join(broadcast(top), Seq("neighbor_id"))
      .select(col("query_id"), col("q_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"), col("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** kNN majority-label classification over the embedding corpus — the
    * standard label-propagation / quality-probe read on an embedded
    * dataset (kNN accuracy is the classic "are these embeddings any
    * good" check, and the same shape assigns labels to unlabeled drops).
    * Holdout = vec_id ≡ 0 (mod `modulus`); each holdout vector is
    * scored against every NON-holdout vector by exact cosine, votes are
    * its k nearest (cosine desc, vec_id tiebreak — the [[annBruteForce]]
    * order), prediction = majority label with ties to the smallest
    * label. Output: per-query true/predicted label, the winning vote
    * count, and the correctness flag.
    *
    * Shape at 100 TB: identical to [[annBruteForce]] — holdout set
    * broadcast, candidates stream through one corpus scan; beyond
    * broadcastable holdouts the IVF probe path ([[annIvfWith]]) serves
    * the same votes from write-time cells. */
  def knnClassify(embeddings: DataFrame, k: Int = 5,
      modulus: Int = 10): DataFrame = {
    import graft.functions.OrderBits.order_bits
    import graft.functions.TopKRows.topk_rows
    val corpus = embeddings.select(col("vec_id"), col("label"),
      col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val holdout = pmod(col("vec_id"), lit(modulus.toLong)) === 0
    val queries = broadcast(
      corpus.filter(holdout)
        .select(col("vec_id").as("query_id"),
          col("label").as("true_label"),
          col("embedding").as("q_emb"), col("nrm").as("q_nrm")))
    val denom = col("nrm") * col("q_nrm")
    // bounded-heap k-nearest per holdout query (the annBruteForce
    // shape — no corpus-sized window partitions); vote labels
    // re-attach from a pruned 2-column scan via a broadcast of the
    // queries·k neighbor list
    val nearest = corpus.filter(!holdout)
      .crossJoin(queries)
      .select(col("query_id"), col("true_label"), col("vec_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .as("cos"))
      .groupBy(col("query_id"), col("true_label"))
      .agg(topk_rows(nullsLastKey(col("cos")), col("vec_id"), k).as("top"))
      .select(col("query_id"), col("true_label"),
        explode(col("top.id")).as("vec_id"))
    val votes = embeddings.select(col("vec_id"), col("label"))
      .join(broadcast(nearest), Seq("vec_id"))
      .groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("v"))
    // majority election via min(struct) — most votes, ties to the
    // smallest label (the house deterministic-election idiom; no
    // window at all in this plan)
    votes
      .groupBy(col("query_id"), col("true_label"))
      .agg(min(struct((-col("v")).as("nv"), col("label"))).as("win"))
      .select(col("query_id"), col("true_label"),
        col("win.label").as("pred_label"), (-col("win.nv")).as("votes"),
        when(col("win.label") === col("true_label"), 1L).otherwise(0L)
          .as("correct"))
      .orderBy(col("query_id"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion — the standard way a
    * training-data miner combines the lexical (BM25) and semantic
    * (embedding-cosine) views of the same corpus: each system returns
    * its depth-`depth` ranked list, and a document's fused score is
    * Σ 1/(k + rank_s) over the systems that retrieved it (RRF,
    * Cormack et al.; k=60). Documents ranked by only one system still
    * fuse (the other contribution is 0) — the union-of-lists semantics
    * that makes RRF robust to a system missing a hit.
    *
    * Determinism: each 1/(k+rank) contribution is the exact integer
    * `10⁹ div (k+rank)` (nonnegative ⇒ div = floor on both engines) and
    * the fused score is a sum of two such integers — no float ranking
    * anywhere in the fusion. The input ranks themselves follow the
    * ann_topk precedent (cosine desc, id tiebreak) and bm25's 6-dp
    * rounded score (ties to doc_id).
    *
    * Scale shape: both systems cut to `depth` with TakeOrderedAndProject
    * (never a global sort); the fusion then works on two depth-sized
    * lists — broadcast-joinable at any corpus size. The semantic side
    * here is the brute-force scorer for oracle-exactness; at 100 TB the
    * same fusion consumes the IVF/LSH top-`depth` list instead (the
    * rank list is the interface, the retriever is pluggable). */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
      terms: Seq[String] = Seq("spark", "hash", "vector", "merge"),
      queryId: Long = 0L, kRrf: Int = 60, depth: Int = 100,
      topN: Int = 20, bm25: Option[DataFrame] = None): DataFrame = {
    // `bm25` injects a precomputed (doc_id, bm25, …) score relation —
    // the memoized corpus prefix shared with the bm25_scores gate
    val lexList = bm25
      .getOrElse(graft.operators.TextAnalysis.bm25Scores(documents, terms))
      .orderBy(col("bm25").desc, col("doc_id")).limit(depth)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_lex"))
    val q = broadcast(embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn")))
    val denom = sqrt(dot(col("embedding"), col("embedding"))) * col("qn")
    val semList = embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id").as("doc_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("qe")) / denom)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(depth)
      .withColumn("rank_sem", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_sem"))
    lexList.join(semList, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_sem"), lit(0L)).as("rank_sem"),
        (when(col("rank_lex").isNotNull,
            expr(s"1000000000 div ($kRrf + rank_lex)")).otherwise(lit(0L)) +
         when(col("rank_sem").isNotNull,
            expr(s"1000000000 div ($kRrf + rank_sem)")).otherwise(lit(0L)))
          .as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("doc_id")).limit(topN)
  }

  /**
   * Spherical k-means (Lloyd) for the IVF coarse quantizer. Structurally
   * deterministic: seeds are the `nCentroids` lowest vec_ids (measured
   * against a stride-spread variant on the synthetic embeddings: first-k
   * seeds won at every (k, iters) combination — recall@10 0.92-0.96 vs
   * 0.66-0.90), a fixed number of iterations, assignment ties to the lowest
   * centroid id. Caveat: the per-(c_id, pos) avg() is a distributed double
   * reduction whose combine order follows shuffle-fetch order, so centroids
   * are NOT bit-stable across runs — near-tie assignments can flip, which is
   * why ann_ivf is gated by a recall spec rather than a value oracle.
   * Each iteration is ONE map-side assignment pass (the codegen'd
   * NearestCentroid expression — no crossJoin, no window shuffle) plus a
   * (c_id, dim) mean aggregate; only the k×d centroid table is collected
   * to the driver between iterations (the same loop shape MLlib's KMeans
   * uses — centroids are tiny, the corpus never moves). Clusters that
   * lose all members keep their previous centroid.
   *
   * `fitPermille` fits the quantizer on a deterministic portable-hash
   * sample of the corpus — the 100 TB path: Lloyd costs `iters` full
   * passes, and quantizer quality depends on the embedding DISTRIBUTION,
   * not the corpus size, so production IVF trains centroids on a
   * fixed-size sample (FAISS-style ~100k-1M vectors) while assignment
   * still covers every vector. 1000 = fit on everything (test default,
   * keeps the recall gate unchanged).
   */
  def kmeansCentroids(embeddings: DataFrame, nCentroids: Int = 12,
      iters: Int = 3, fitPermille: Int = 1000): Array[Array[Double]] = {
    import graft.functions.NearestCentroid.nearest_centroid
    import graft.functions.PortableHash.h60
    val all = embeddings.select(col("vec_id"), col("embedding"))
    val base = if (fitPermille >= 1000) all
      else all.filter(
        pmod(h60(col("vec_id").cast("string")), lit(1000L)) < fitPermille)
    var cents: Array[Array[Double]] = base.orderBy(col("vec_id"))
      .limit(nCentroids).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      val meansDf = base
        .select(nearest_centroid(col("embedding"), cents).as("c_id"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("c_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
      graft.plans.PlanTrace.record("kmeans_fit",
        graft.plans.PlanFingerprint.structSha(meansDf))
      val means = meansDf
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      cents = cents.zipWithIndex.map { case (old, cid) =>
        means.getOrElse(cid, old)
      }
    }
    cents
  }

  /**
   * IVF-flat top-k: the inverted-file ANN scale path. Coarse quantizer =
   * k-means-refined centroids ([[kmeansCentroids]]); every vector is
   * assigned to its nearest centroid MAP-SIDE by the codegen'd
   * NearestCentroid expression (the centroid table rides the task binary
   * as a plan reference — never a join, never a shuffle); queries compute
   * their `nProbe` probe lists on the driver (queries × centroids is
   * driver-sized by definition) and the corpus is filtered to the probed
   * lists with one broadcast semi-style join. Scanned candidates drop to
   * ~nProbe/nCentroids of the corpus. At 100 TB the assignment becomes a
   * write-time partitioning (cluster-by centroid_id), and probing prunes
   * partitions instead of rows.
   */
  def annIvf(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10, nCentroids: Int = 12, nProbe: Int = 4,
      kmeansIters: Int = 3, fitPermille: Int = 1000): DataFrame =
    annIvfWith(embeddings,
      kmeansCentroids(embeddings, nCentroids, kmeansIters, fitPermille),
      queryIds, k, nProbe)

  /**
   * Spherical PRODUCT-QUANTIZATION codebooks — the residual half of the
   * IVF-PQ layout every 100 TB ANN deployment runs (Jégou et al. 2011):
   * the embedding splits into `m` contiguous subvectors and each
   * subspace gets its own `k`-centroid quantizer, so a vector stores as
   * m small codes (64 floats → m bytes at k ≤ 256) while distances are
   * approximated from per-subspace lookup tables. Codebooks follow the
   * repo's SPHERICAL convention (cosine argmax via the codegen'd
   * [[graft.functions.NearestCentroid]], ties to the lowest code —
   * consistent with the IVF coarse quantizer; textbook PQ is min-L2,
   * the deviation is documented) and the same first-k seeding / fixed
   * iterations / empty-cluster-keeps-old structure as
   * [[kmeansCentroids]].
   *
   * ONE job per Lloyd iteration fits ALL subspaces: the m per-subspace
   * assignments are m map-side expressions over sliced subvectors, the
   * per-(sub, code, pos) means come from a single posexplode aggregate
   * keyed by pos div subDim, and only the m×k×subDim codebook table
   * crosses the driver between iterations — the corpus never moves,
   * exactly the kmeansCentroids loop shape. Like the IVF quantizer, the
   * per-cell avg() is a distributed double reduction (not bit-stable
   * across runs), which is why the gate replays the DUMPED write-time
   * codebooks (`__AUX__`) rather than refitting.
   */
  def pqCodebooks(embeddings: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 3, dim: Int = 64): Array[Array[Array[Double]]] = {
    import graft.functions.NearestCentroid.nearest_centroid
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"), col("embedding"))
    var cbs: Array[Array[Array[Double]]] = {
      val seeds = base.orderBy(col("vec_id")).limit(k)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      Array.tabulate(m)(s =>
        seeds.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    }
    for (_ <- 0 until iters) {
      val assigns = (0 until m).map { s =>
        nearest_centroid(
          slice(col("embedding"), s * subDim + 1, subDim), cbs(s))
          .as(s"__c$s")
      }
      val means = base
        .select(col("embedding") +: assigns: _*)
        .select(array((0 until m).map(s => col(s"__c$s")): _*).as("__cs"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(
          expr(s"CAST(pos div $subDim AS INT)").as("sub"),
          element_at(col("__cs"),
            expr(s"CAST(pos div $subDim AS INT)") + 1).as("c_id"),
          expr(s"pos % $subDim").as("spos"), col("x"))
        .groupBy(col("sub"), col("c_id"), col("spos"))
        .agg(avg(col("x")).as("mw"))
        .transform { d =>
          graft.plans.PlanTrace.record("pq_fit",
            graft.plans.PlanFingerprint.structSha(d))
          d
        }
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((s, cid), rows) =>
          (s, cid) -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      cbs = Array.tabulate(m)(s => cbs(s).zipWithIndex.map {
        case (old, cid) => means.getOrElse((s, cid), old)
      })
    }
    cbs
  }

  /** PQ ENCODE — each vector as its m per-subspace codes, long form
    * (vec_id, sub, code): the compressed representation an IVF-PQ index
    * stores per vector. Assignment is the same map-side codegen'd
    * cosine argmax the fit used (codebooks ride the plan as reference
    * objects — no join, no shuffle before the result sort); at 100 TB
    * this projection IS the index build's encode pass, writing m bytes
    * per vector next to the IVF cell id. Gated by the `__AUX__` replay:
    * the oracle recomputes every assignment from the dumped write-time
    * codebooks. */
  def pqEncode(embeddings: DataFrame,
      cbs: Array[Array[Array[Double]]], dim: Int = 64): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    val m = cbs.length
    val subDim = dim / m
    embeddings
      .select(col("vec_id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"),
          nearest_centroid(
            slice(col("embedding"), s * subDim + 1, subDim), cbs(s))
            .as("code"))
      }: _*)).as("sc"))
      .select(col("vec_id"), col("sc.sub").as("sub"),
        col("sc.code").as("code"))
      .orderBy(col("vec_id"), col("sub"))
  }

  /** Per-cell LABEL PURITY of the write-time IVF clustering — the
    * clustering-quality audit an embedding pipeline reads before
    * trusting the cells for ANN serving or stratified sampling: a cell
    * whose members share a label is a coherent region; low-purity cells
    * flag centroid starvation or an embedding space that doesn't
    * separate the classes. Majority election is the sort-free
    * min(struct(−cnt, label)) partial aggregate (ties to the smallest
    * label — the [[gopherRepetition]] pattern); purity is the exact
    * micro floor maj·10⁶ div n. One map-side centroid assignment
    * (codegen'd [[graft.functions.NearestCentroid]], no shuffle of the
    * vectors) feeding a cells × labels bounded aggregate — nothing
    * data-sized after the scan at any corpus scale. The oracle replays
    * the assignment from the SAME write-time cell dump the
    * `ann_ivf_topk` gate uses. */
  def ivfPurity(embeddings: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    embeddings
      .select(col("label"),
        nearest_centroid(col("embedding"), cents).as("c_id"))
      .groupBy(col("c_id"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("c_id"))
      .agg(sum(col("cnt")).cast("long").as("n_vecs"),
        min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
      .select(col("c_id"), col("n_vecs"), col("m.l").as("maj_label"),
        (-col("m.nc")).as("maj_cnt"))
      .withColumn("purity_micro", expr("maj_cnt * 1000000 div n_vecs"))
      .orderBy(col("c_id"))
  }

  /** IVF assignment-MARGIN audit — the geometry-health read of a coarse
    * quantizer, next to [[ivfPurity]] (label-based) and [[annRecall]]
    * (query-based): per cell, how decisively do its members belong?
    * Margin = s(best) − s(second best) per vector on the cosine micro
    * scale; a cell whose mean margin collapses toward 0 sits on a
    * quantizer boundary — its members split across neighboring cells'
    * probe sets, and the re-cluster trigger should fire (the continuous
    * counterpart of [[graft.streaming.StreamIvfIngest]]'s size census).
    *
    * Determinism: scoring runs ENTIRELY on the integer micro grid via
    * the quantized codegen twins ([[graft.functions.NearestCentroidQ]] /
    * [[graft.functions.CentroidMarginQ]]): qx = floor(x·10⁶) and
    * qw = floor(w·10⁶) are single-op IEEE floors, dots are exact BIGINT
    * sums, norms cross one correctly-rounded sqrt of a < 2^53 integer,
    * and every division truncates toward zero on both engines — so the
    * oracle replays every score, every argmax comparison and every
    * margin bit-for-bit from the `__AUX__` centroid dump (float scoring
    * could not promise this: dot sums are accumulation-order-dependent
    * and a boundary-straddling floor over 10⁵ vectors WILL flip
    * somewhere). Ties: lowest cell id wins, tied top scores ⇒ margin 0.
    * Contract requires ≥ 2 centroids (margin is undefined otherwise).
    *
    * Scale shape: ONE corpus scan, two codegen'd projections (centroid
    * table rides the task binary, never a join), an nCells-bounded
    * aggregate. */
  def ivfMargin(embeddings: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import graft.functions.NearestCentroid.{nearest_centroid_q, centroid_margin_q}
    val spark = embeddings.sparkSession
    import spark.implicits._
    // margin is undefined under < 2 centroids — an empty/near-empty
    // corpus trains no quantizer, so the audit is vacuously empty
    // (EmptyInputSpec contract: plan and return empty, never throw)
    if (cents.length < 2)
      return Seq.empty[(Int, Long, Long)]
        .toDF("c_id", "n_vecs", "mean_margin_micro")
    embeddings
      .select(nearest_centroid_q(col("embedding"), cents).as("c_id"),
        centroid_margin_q(col("embedding"), cents).as("m"))
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("m")).cast("long").as("sum_m"))
      .select(col("c_id"), col("n_vecs"),
        expr("sum_m div n_vecs").as("mean_margin_micro"))
      .orderBy(col("c_id"))
  }

  /** PQ CODEBOOK-health audit — [[ivfMargin]]'s sibling for the product
    * quantizer: per (subspace, code), how many vectors land there and
    * how faithfully the codeword represents them (mean cosine between
    * each sub-vector and its assigned codeword, micro scale). Dead
    * codes (n = 0 rows absent), over-loaded codes and low-fidelity
    * cells are the retrain triggers for the [[pqCodebooks]] state that
    * [[annIvfPq]] serves from.
    *
    * Determinism: the [[ivfMargin]] contract — assignment AND fidelity
    * both run on the exact integer micro grid via the quantized codegen
    * twins ([[graft.functions.NearestCentroidQ]] /
    * [[graft.functions.CentroidCosQ]]) over each 16-dim sub-slice, so
    * the oracle replays every per-subspace argmax and cosine from the
    * `__AUX__` codebook dump bit-for-bit. Zero-norm sub-vectors and
    * all-zero-norm codebooks emit cosine 0 (guards mirrored in SQL).
    *
    * Scale shape: ONE corpus scan, 2m codegen'd projections (codebooks
    * ride the task binary), an m·k-bounded aggregate after a map-side
    * m-way explode of 3-integer structs. */
  def pqCellStats(embeddings: DataFrame,
      cbs: Array[Array[Array[Double]]], dim: Int = 64): DataFrame = {
    import graft.functions.NearestCentroid.{nearest_centroid_q, centroid_cos_q}
    val m = cbs.length
    val subDim = dim / m
    val projected = embeddings.select(col("vec_id") +:
      (0 until m).flatMap { s =>
        val sub = slice(col("embedding"), s * subDim + 1, subDim)
        Seq(nearest_centroid_q(sub, cbs(s)).as(s"__c$s"),
          centroid_cos_q(sub, cbs(s)).as(s"__q$s"))
      }: _*)
    projected
      .select(explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), col(s"__c$s").as("code"),
          col(s"__q$s").as("cosm"))): _*)).as("p"))
      .groupBy(col("p.sub").as("sub"), col("p.code").as("code"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("p.cosm")).cast("long").as("sum_cos"))
      .select(col("sub"), col("code"), col("n_vecs"),
        expr("sum_cos div n_vecs").as("mean_cos_micro"))
      .orderBy(col("sub"), col("code"))
  }

  /** The QUERY-TIME half of IVF search, over centroids trained at WRITE
    * time ([[kmeansCentroids]] / `store.EmbeddingStore`) — production
    * never re-clusters per query, so the serving path takes the trained
    * centroids as an argument (SparkEntry memoizes them per corpus,
    * exactly like the dedup-groups prefix). */
  def annIvfWith(embeddings: DataFrame, cents: Array[Array[Double]],
      queryIds: Seq[Long] = 0L to 4L, k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val base = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    // probe lists per query, computed on the driver: score = dot(q, c)/|c|
    // (|q| constant per query), rank desc with ties to the lowest c_id —
    // identical ordering to the joined form this replaces
    val qRows = base.filter(col("vec_id").isin(queryIds: _*)).collect()
    val probeRows = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qEmb = r.getSeq[Float](1)
      val qNrm = r.getDouble(2)
      val q = qEmb.map(_.toDouble).toArray
      cents.indices
        // zero-norm centroid guard mirrors NearestCentroid.assign: score
        // -Inf, never NaN (NaN would make sortBy order-unstable and could
        // disagree with the executor-side assignment path)
        .map { c =>
          val s =
            if (cnorms(c) != 0.0)
              cents(c).zip(q).map { case (a, b) => a * b }.sum / cnorms(c)
            else Double.NegativeInfinity
          (s, c)
        }
        .sortBy { case (s, c) => (-s, c) }
        .take(nProbe)
        .map { case (_, c) => (qid, c, qEmb, qNrm) }
    }
    val probes = broadcast(
      probeRows.toDF("query_id", "c_id", "q_emb", "q_nrm"))
    // scan only the probed lists; assignment fused into the scan projection
    val assigned = base.select(col("vec_id"), col("embedding"), col("nrm"),
      nearest_centroid(col("embedding"), cents).as("c_id"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned
      .join(probes, "c_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ ASYMMETRIC-DISTANCE search — the serving shape a 100 TB ANN
    * index actually runs: the coarse quantizer routes each query to its
    * `nProbe` cells, and candidates there are scored from their m-byte
    * PQ codes ALONE — the full vectors are never touched at query time.
    * Score is the spherical ADC consistent with the repo's cosine
    * convention: cos(q, x̂) for the codeword reconstruction x̂ —
    * numerator Σ_sub LUT[sub][code] where LUT is the per-query
    * dot(q_sub, codeword) table (m·k doubles, computed once on the
    * driver and broadcast WITH the probe row, the classic ADC trick),
    * denominator |q|·sqrt(Σ_sub |codeword|²). Both m-term sums are
    * fixed-order left-to-right scalar additions, so the oracle can
    * state the identical arithmetic (pivot per subspace, then ordered
    * addition) and match exactly; zero denominators sink to −1e308
    * (total order — the [[annIvfWith]] NaN/NULL-ordering guard).
    *
    * Scale shape: ONE corpus scan; the cell id and the m codes are
    * map-side codegen'd [[graft.functions.NearestCentroid]] projections
    * here (a real deployment reads them from the write-time index —
    * exactly what the gate's oracle does, replaying BOTH assignments
    * from the `__AUX__` centroid/codebook dumps); the probe join
    * broadcasts nProbe·|queries| rows; the only shuffle is the
    * per-query top-k window at probed-candidate cardinality. */
  def annIvfPq(embeddings: DataFrame, cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10, nProbe: Int = 4, dim: Int = 64): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    val spark = embeddings.sparkSession
    import spark.implicits._
    val m = cbs.length
    val subDim = dim / m
    val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val base = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val qRows = base.filter(col("vec_id").isin(queryIds: _*)).collect()
    val probeRows = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      val qNrm = r.getDouble(2)
      val probes = cents.indices.map { c =>
        val s = if (cnorms(c) != 0.0)
          cents(c).zip(q).map { case (a, b) => a * b }.sum / cnorms(c)
        else Double.NegativeInfinity
        (s, c)
      }.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)
      val lut = (0 until m).map { s =>
        cbs(s).map { w =>
          var acc = 0.0
          var i = 0
          while (i < subDim) { acc += q(s * subDim + i) * w(i); i += 1 }
          acc
        }.toSeq
      }
      probes.map(c => (qid, c, qNrm, lut))
    }
    val probesDf = broadcast(
      probeRows.toDF("query_id", "c_id", "q_nrm", "lut"))
    val codeCols = (0 until m).map { s =>
      nearest_centroid(slice(col("embedding"), s * subDim + 1, subDim),
        cbs(s)).as(s"__code$s")
    }
    val coded = base.select(col("vec_id") +:
      nearest_centroid(col("embedding"), cents).as("c_id") +: codeCols: _*)
    val num = (0 until m).map(s =>
      element_at(element_at(col("lut"), s + 1), col(s"__code$s") + 1))
      .reduceLeft(_ + _)
    val recon2 = (0 until m).map { s =>
      element_at(array(cbs(s).map(w => lit(w.map(x => x * x).sum)): _*),
        col(s"__code$s") + 1)
    }.reduceLeft(_ + _)
    val denom = col("q_nrm") * sqrt(recon2)
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    coded
      .join(probesDf, "c_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc",
        when(denom =!= 0.0, num / denom).otherwise(lit(-1e308)))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("adc"), 6).as("adc6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ with EXACT RE-RANK — the full production serving chain: the
    * ADC scan ([[annIvfPq]]) cuts the probed cells to a per-query
    * SHORTLIST of `shortlist` candidates from their m-byte codes alone,
    * then ONLY those ids fetch their true vectors for an exact cosine
    * re-rank to the final top-k. This is how FAISS/ScaNN deployments
    * recover exactness lost to quantization while still never scoring
    * the corpus: the expensive exact arithmetic touches
    * |queries|·shortlist vectors, not |corpus|.
    *
    * Scale shape: the shortlist relation is |queries|·shortlist rows —
    * broadcast into one corpus scan keyed by `vec_id` (the random-read
    * "fetch" expressed relationally; a real deployment does point reads
    * against the vector store), queries broadcast as in
    * [[annBruteForce]], and the final window ranks a
    * shortlist-cardinality relation. Zero-norm candidates sink to
    * −1e308 (total order; nulls would rank differently across
    * engines). The oracle replays the ENTIRE chain — probes, cells,
    * codes, ADC shortlist from the `__AUX__` write-time dumps, then the
    * exact-cosine re-rank. */
  def annIvfPqRefine(embeddings: DataFrame, cents: Array[Array[Double]],
      cbs: Array[Array[Array[Double]]], queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10, shortlist: Int = 50, nProbe: Int = 4,
      dim: Int = 64): DataFrame = {
    val cand = annIvfPq(embeddings, cents, cbs, queryIds, shortlist,
      nProbe, dim).select(col("query_id"), col("neighbor_id"))
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val queries = broadcast(corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val denom = col("nrm") * col("q_nrm")
    broadcast(cand)
      .join(corpus, col("neighbor_id") === col("vec_id"))
      .join(queries, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .otherwise(lit(-1e308)).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** RECALL@k of an approximate index against the exact scorer — the
    * metric an ANN deployment actually watches before trusting a
    * probe/band configuration: what fraction of the TRUE top-k does the
    * index return per query? Takes the two result relations (any pair
    * with `query_id`/`neighbor_id` columns — brute vs IVF, brute vs
    * LSH, brute vs IVF-PQ), left-joins the exact list against the
    * approximate one and counts hits; recall crosses the boundary as
    * the exact integer micro hits·10⁶ div n_exact. Output is
    * |queries| rows — driver-bounded; both inputs keep their own scale
    * shapes. */
  /** DCG gain table for [[retrievalEval]]: floor(1e6 / log2(rank+1))
    * per rank 1..k — computed ONCE on the driver and shipped to BOTH
    * engines as literals (the planeWeight convention), so no libm call
    * ever touches the data path and the metric is integer-exact. */
  def retrievalGains(k: Int): IndexedSeq[Long] =
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** RETRIEVAL-QUALITY EVAL — MRR@k and nDCG@k of a retriever's rank
    * list against label relevance (neighbor relevant ⇔ same label as
    * the query, self excluded): the embedding-quality read a pipeline
    * takes before trusting a retriever for mining or serving, next to
    * [[annRecall]] (which scores INDEX fidelity against the exact
    * scorer; this scores the RANKING against ground truth). Per query:
    * relevant-corpus size, hits@k, reciprocal rank (micro), DCG/IDCG
    * and nDCG (micro) — all integer arithmetic over the driver-shipped
    * gain literals, so the oracle replays every value bit-for-bit.
    *
    * `ranked` is any (query_id, neighbor_id, rank) relation —
    * [[annBruteForce]] here, the IVF/LSH retrievers at scale (the rank
    * list is the interface, as with hybridRrf). Scale shape: the rank
    * list is queries×k and broadcast into one labels join; n_rel is
    * one label-keyed aggregate over the corpus; everything downstream
    * is queries-sized. */
  def retrievalEval(ranked: DataFrame, labels: DataFrame,
      k: Int = 10): DataFrame = {
    val gains = retrievalGains(k)
    val prefix = gains.scanLeft(0L)(_ + _).tail // idcg for n_rel = 1..k
    val lab = labels.select(col("vec_id"), col("label"))
    // the rank list defines the evaluated query set — restrict the
    // label side to it BEFORE anything joins the corpus (the queries
    // are the only labels ever read; broadcasting the whole corpus's
    // labels as the query side would make nRel a corpus×cluster join)
    val ql = lab
      .join(broadcast(ranked.select(col("query_id")).distinct()),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("label").as("q_label"))
    // per-query relevant-corpus size (same label, self excluded) — one
    // broadcast of the query labels against the corpus label column
    val nRel = lab
      .join(broadcast(ql),
        col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val gainArr = array(gains.map(lit): _*)
    val prefArr = array(prefix.map(lit): _*)
    // metrics are @k: a deeper supplied list must not leak ranks > k
    // into hits/MRR (and gain lookup past the table would be null)
    val scoredRows = lab
      .join(broadcast(ranked.select(col("query_id"), col("neighbor_id"),
          col("rank")).filter(col("rank") <= k)),
        col("vec_id") === col("neighbor_id"))
      .join(broadcast(ql), Seq("query_id"))
      .select(col("query_id"), col("rank"),
        (col("label") === col("q_label")).as("is_rel"))
    val perQuery = scoredRows.groupBy(col("query_id"))
      .agg(
        sum(when(col("is_rel"), 1L).otherwise(0L)).cast("long").as("hits"),
        min(when(col("is_rel"), col("rank"))).as("first_rel"),
        coalesce(sum(when(col("is_rel"),
          element_at(gainArr, col("rank").cast("int")))), lit(0L))
          .cast("long").as("dcg_micro"))
    // spine = the evaluated queries (a query with zero scored rows
    // still reports), metrics null-safe
    ranked.select(col("query_id")).distinct()
      .join(nRel, Seq("query_id"), "left")
      .join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).cast("long").as("n_rel"),
        coalesce(col("hits"), lit(0L)).cast("long").as("hits"),
        coalesce(expr("1000000 div first_rel"), lit(0L)).cast("long")
          .as("rr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).cast("long").as("dcg_micro"))
      .withColumn("idcg_micro",
        when(col("n_rel") > 0,
          element_at(prefArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .otherwise(0L).cast("long"))
      .withColumn("ndcg_micro",
        when(col("idcg_micro") > 0,
          expr("dcg_micro * 1000000 div idcg_micro")).otherwise(0L)
          .cast("long"))
      .orderBy(col("query_id"))
  }

  def annRecall(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("__hit")), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).cast("long").as("n_hits"))
      .withColumn("recall_micro", expr("n_hits * 1000000 div n_exact"))
      .orderBy(col("query_id"))

  /** IVF PROBE SWEEP — the recall-vs-cost ladder that TUNES the knob
    * [[annRecall]] only audits at one setting: for each nProbe on the
    * ladder, total recall@k of the IVF index against the exact scorer,
    * one summary row per rung. The read every vector-store deployment
    * takes before pinning its serving config — recall is monotone
    * non-decreasing up the ladder (rung p's candidate set contains
    * rung p−1's; spec-asserted), and the operator shows exactly where
    * it plateaus, i.e. how few of the nCentroids cells (= what fraction
    * of corpus bytes, since cells are partition-pruned at the scan)
    * buy the target recall.
    *
    * Shape at 100 TB: the sweep is `ladder.length` probes of the
    * serving tier — each reads nProbe/nCentroids of the bytes — plus
    * ONE exact pass for ground truth (amortize it: at scale the exact
    * side is computed once and checkpointed/persisted, as the judge
    * sample here shares one `exact` plan across rungs). Summary rows
    * are rung-cardinality; everything driver-visible is bounded. */
  def ivfProbeSweep(embeddings: DataFrame, cents: Array[Array[Double]],
      queryIds: Seq[Long] = 0L to 4L, k: Int = 10,
      ladder: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val exact = annBruteForce(embeddings, queryIds, k)
    ladder.map { p =>
      annRecall(exact, annIvfWith(embeddings, cents, queryIds, k, p))
        .agg(sum(col("n_exact")).cast("long").as("n_exact"),
          sum(col("n_hits")).cast("long").as("n_hits"))
        .select(lit(p).as("n_probe"), col("n_exact"), col("n_hits"),
          expr("CASE WHEN n_exact > 0 THEN n_hits * 1000000 div n_exact" +
            " ELSE NULL END").as("recall_micro"))
    }.reduce(_.unionByName(_)).orderBy(col("n_probe"))
  }

  /** Fixed-point DIMENSION-MOMENT audit of the embedding space — the
    * feature-health read before whitening/PCA or an index build: per
    * ordered dim pair (i ≤ j), the exact integer sums of the
    * micro-quantized values and products, plus the derived covariance.
    * A collapsed dim (zero variance), a pair of near-duplicate dims, or
    * a covariance structure far from isotropic all flag an embedding
    * model regression before any ANN metric moves.
    *
    * Determinism: every per-element term is floored onto the integer
    * micro grid FIRST — q(v) = floor(v·10⁶), q(vw) = floor(v·w·10⁶) —
    * and f32→f64 widening, IEEE multiplication and floor round
    * identically in every engine, so the sums are exact integers with
    * no float-accumulation order hazard (the one double expression,
    * `cov6`, is computed from those identical integers with an
    * identical operation tree on both sides). n² goes through DOUBLE —
    * at 10¹² vectors the squared count overflows a long.
    *
    * Scale shape: the d(d+1)/2 quantized products are generated
    * MAP-SIDE per vector by a nested array transform (no self-join, no
    * pre-aggregation shuffle of anything row-sized); the aggregate is
    * map-combined into d(d+1)/2 cells, and the per-dim sums relation
    * (d rows) broadcast-joins back. Output is dim-bounded regardless of
    * corpus size. */
  def embeddingCov(embeddings: DataFrame): DataFrame = {
    val pairs = embeddings.select(explode(expr(
      """flatten(transform(embedding, (xi, i) ->
        |  transform(slice(embedding, i + 1, size(embedding) - i),
        |    (xj, dj) -> named_struct(
        |      'i_dim', i + 1, 'j_dim', i + dj + 1,
        |      'qq', CAST(floor(CAST(xi AS DOUBLE) * CAST(xj AS DOUBLE)
        |        * 1000000.0) AS BIGINT)))))""".stripMargin)).as("p"))
      .groupBy(col("p.i_dim").as("i_dim"), col("p.j_dim").as("j_dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("p.qq")).cast("long").as("s_ij_q"))
    val dims = embeddings.select(explode(expr(
      """transform(embedding, (x, i) -> named_struct('dim', i + 1,
        |  'q', CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)))"""
        .stripMargin)).as("d"))
      .groupBy(col("d.dim").as("dim"))
      .agg(sum(col("d.q")).cast("long").as("s_q"))
    pairs
      .join(broadcast(dims.select(col("dim").as("i_dim"),
        col("s_q").as("s_i_q"))), "i_dim")
      .join(broadcast(dims.select(col("dim").as("j_dim"),
        col("s_q").as("s_j_q"))), "j_dim")
      .select(col("i_dim"), col("j_dim"), col("n_vecs"),
        col("s_i_q"), col("s_j_q"), col("s_ij_q"),
        // + 0.0 collapses IEEE −0.0 to +0.0 (a tiny negative covariance
        // rounds to −0.0, which the two engines RENDER differently)
        (round((col("s_ij_q").cast("double") / col("n_vecs")
          - col("s_i_q").cast("double") * col("s_j_q").cast("double")
            / (col("n_vecs").cast("double") * col("n_vecs").cast("double"))
            / lit(1000000.0))
          / lit(1000000.0), 6) + lit(0.0)).as("cov6"))
      .orderBy(col("i_dim"), col("j_dim"))
  }

  /** Top PRINCIPAL DIRECTION of the embedding cloud by a fixed-iteration
    * POWER METHOD over the exact integer covariance — the whitening /
    * anisotropy audit that runs before an OPQ rotation or a PCA
    * dimensionality cut. Any dominant direction in a corpus embedding
    * cloud (a "rogue dimension") distorts cosine retrieval; this emits
    * that direction as a deterministic micro-scaled integer vector.
    *
    * Determinism: the covariance numerator C_ij = n·s_ij·10⁶ − s_i·s_j
    * (= cov·n²·10¹² — the s_ij sum carries one micro factor, the
    * s_i·s_j product two) is EXACT BigInt arithmetic over
    * [[embeddingCov]]'s integer moment cells, and each power iteration
    * v ← C·v is BigInt
    * multiply-accumulate followed by an integer rescale
    * v_i ← v_i·10⁶ quot max|v| (truncation toward zero — Scala BigInt
    * `/` ≡ DuckDB `//`, the repo's verified pair). No float enters at
    * any step, so the oracle replays the identical iterations as
    * HUGEINT CTEs and matches bit-for-bit. Sign is canonicalized by
    * making the largest-|component| coordinate positive (ties to the
    * lowest dim) — the eigenvector sign ambiguity pinned the same way
    * on both engines. Fixed `iters` (not convergence-tested): the
    * operator contract is "iterate exactly T times", so engine and
    * oracle agree REGARDLESS of spectral gap.
    *
    * Scale shape: the distributed work is the one [[embeddingCov]]
    * scan (map-side pair generation, d(d+1)/2-cell aggregate); the
    * power iteration is driver arithmetic on the collected d(d+1)/2
    * cells — d×d matrix-vector products, corpus-size-independent
    * (documented EAGER, the k-means-centroid class). Output is d rows. */
  def pcaPower(embeddings: DataFrame, iters: Int = 6): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cellsDf = embeddingCov(embeddings)
      .select(col("i_dim"), col("j_dim"), col("n_vecs"),
        col("s_i_q"), col("s_j_q"), col("s_ij_q"))
    // the published result is a driver-local relation; record the cov
    // prefix so the plan fingerprint distinguishes this query
    graft.plans.PlanTrace.record("pca_cov",
      graft.plans.PlanFingerprint.structSha(cellsDf))
    val cells = cellsDf.collect()
    // empty corpus ⇒ no moment cells ⇒ vacuously empty direction
    // (EmptyInputSpec contract: return empty, never throw)
    if (cells.isEmpty) return Seq.empty[(Int, Long)].toDF("dim", "v_micro")
    val d = cells.map(_.getInt(1)).max
    val c = Array.ofDim[BigInt](d + 1, d + 1)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      // cov·n²·10¹² = n·s_ij·10⁶ − s_i·s_j: the s_ij term carries one
      // micro factor, the s_i·s_j product two — align before differencing
      val num = BigInt(r.getLong(2)) * r.getLong(5) * 1000000L -
        BigInt(r.getLong(3)) * r.getLong(4)
      c(i)(j) = num; c(j)(i) = num
    }
    var v: IndexedSeq[BigInt] = IndexedSeq.fill(d + 1)(BigInt(1000000))
    for (_ <- 1 to iters) {
      val u = (1 to d).map { i =>
        var acc = BigInt(0)
        var j = 1
        while (j <= d) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val s = u.map(_.abs).max
      v = BigInt(0) +: u.map(x => if (s == 0) BigInt(0) else x * 1000000 / s)
    }
    val best = (1 to d).maxBy(i => (v(i).abs, -i))
    val sg = if (v(best) < 0) BigInt(-1) else BigInt(1)
    (1 to d).map(i => (i, (v(i) * sg).toLong))
      .toDF("dim", "v_micro")
      .orderBy(col("dim"))
  }

  /** Random-hyperplane LSH signature (one bit per plane) of an embedding —
    * the codegen'd [[graft.functions.PlaneSignature]] expression: every
    * plane projection in one native loop. Plane weights are engine-portable
    * (PortableHash.planeWeight, an md5-derived fold to [-1,1)), so the
    * DuckDB oracle rebuilds the exact same planes and buckets. */
  def lshSignature(emb: Column, bits: Int): Column =
    graft.functions.PlaneSignature.plane_signature(emb, bits)

  /** LSH-bucketed cosine top-k: same output shape as [[annBruteForce]] but
    * candidates restricted to hyperplane-bucket matches — MULTI-BAND, like
    * MinHash banding: one `bands × bitsPerBand`-plane signature, sliced
    * into `bands` independent values; a corpus vector is a candidate if ANY
    * band matches the query's. A single wide bucket makes recall fall off a
    * cliff for near-threshold neighbors (P[candidate] = p^bits once);
    * banding gives 1-(1-p^r)^b — the knob that keeps recall controlled as
    * the corpus grows. Candidates are verified with the exact cosine, so
    * only recall is probabilistic. One corpus scan; the explode fans each
    * vector into `bands` bucket rows, the per-pair dedup collapses
    * multi-band matches.
    *
    * Defaults (16 bands × 4 bits) are tuned to this corpus's regime: true
    * top-10 neighbors sit at cos ≈ 0.3 (per-plane agreement p ≈ 0.6), so
    * expected recall is 1-(1-0.6⁴)¹⁶ ≈ 0.9 while a single 32-bit bucket
    * recalls essentially nothing (0.6³² ≈ 6×10⁻⁸). The price of recall at
    * such low similarity is selectivity (a band passes ~1/16 of random
    * vectors); in a high-similarity dedup regime (cos ≥ 0.7, p ≥ 0.85)
    * fewer, wider bands — e.g. 4×16 — are selective AND high-recall.
    * Both knobs are per-call; the oracle mirrors whatever is chosen. */
  def annLsh(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10, bands: Int = 16, bitsPerBand: Int = 4): DataFrame = {
    require(bands * bitsPerBand <= graft.functions.PlaneSignature.MaxBits,
      "signature wider than the plane table")
    // JVM shifts are mod 64: 1L << 64 == 1L, which would zero the mask for
    // a single full-width band — special-case it to all-ones
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val signed = embeddings
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"),
        lshSignature(col("embedding"), bands * bitsPerBand).as("sig"))
    val bandCols = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        shiftright(col("sig"), bd * bitsPerBand).bitwiseAND(mask).as("bv"))
    }
    val banded = signed
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val queries = broadcast(
      banded.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("band").as("q_band"),
          col("bv").as("q_bv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val denom = col("nrm") * col("q_nrm")
    banded
      .join(queries, col("band") === col("q_band") &&
        col("bv") === col("q_bv") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .as("cos"))
      // a pair can match in several bands; cos is pair-determined, so the
      // distinct collapses exactly to one row per candidate pair
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Binary-quantization Hamming top-k — the cheapest retrieval rung:
    * each embedding collapses to its 1-bit sign code ([[graft.functions
    * .SignPack]], 64 dims → ONE long, a 32× scan-width cut vs the float
    * vectors), and candidates are ranked by Hamming distance
    * `bit_count(code ^ q_code)` ASC (vec_id tiebreak) — two ALU ops per
    * candidate instead of a 64-lane dot product. Exact over the CODE
    * domain (the oracle replays the same pack + popcount arithmetic
    * bit-for-bit; integer-only, no float on the data path), approximate
    * over the original cosine — which is why production stacks pair it
    * with an exact re-rank ([[annBqRerank]]).
    *
    * Shape at 100 TB: the codes relation is a 2-column (id, long) scan —
    * the embedding column never leaves the map side — and ranking rides
    * the bounded-heap [[graft.functions.TopKRows]] (≤ k rows per
    * query × partition cross the shuffle, nothing per-query sorted).
    * Output: (query_id, rank, neighbor_id, hamming). */
  def annHamming(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      k: Int = 10): DataFrame = {
    import graft.functions.SignPack.sign_pack
    import graft.functions.TopKRows.topk_rows
    val codes = embeddings.select(col("vec_id"),
      sign_pack(col("embedding")).as("code"))
    val queries = broadcast(
      codes.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("code").as("q_code")))
    codes.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        bit_count(col("code").bitwiseXOR(col("q_code"))).cast("long")
          .as("ham"))
      // heap keeps (score DESC, id ASC); negate for Hamming ASC — ham is
      // in [0, 64], so the negation can't hit the Long.MinValue edge
      .groupBy(col("query_id"))
      .agg(topk_rows(-col("ham"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        (-col("col.score")).cast("long").as("hamming"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** BQ serving chain: Hamming shortlist (rank ≤ `m` over the 1-bit
    * codes, [[annHamming]]) → exact-cosine re-rank of the `m` fetched
    * vectors — the standard two-stage binary-quantization read (the
    * [[annIvfPqRefine]] shape with BQ codes as the coarse stage). Only
    * the shortlisted m vectors per query are ever fetched at full float
    * width: the corpus-wide pass touches 8 bytes per vector, the
    * re-rank is queries·m rows — driver-sized, broadcast both ways.
    * Output: (query_id, rank, neighbor_id, cos6), the [[annBruteForce]]
    * shape restricted to the BQ shortlist. */
  def annBqRerank(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      m: Int = 50, k: Int = 10): DataFrame = {
    val shortlist = annHamming(embeddings, queryIds, m)
      .select(col("query_id").as("sq"), col("neighbor_id"))
    bqExactRerank(embeddings, shortlist, queryIds, k)
  }

  /** The exact-cosine RE-RANK tail every coarse-shortlist chain shares
    * ([[annBqRerank]], [[annIvfBq]], [[annBqAsym]]): `shortlist` is a
    * tiny (sq = query_id, neighbor_id) relation; only those vectors are
    * fetched at full float width (broadcast semi-ish join into one
    * corpus scan — a corpus vector can be shortlisted by several
    * queries, so the pair is kept), scored exactly, and ranked by the
    * bounded heap. Output: (query_id, rank, neighbor_id, cos6) — the
    * [[annBruteForce]] shape restricted to the shortlist. */
  private def bqExactRerank(embeddings: DataFrame, shortlist: DataFrame,
      queryIds: Seq[Long], k: Int): DataFrame = {
    import graft.functions.TopKRows.topk_rows
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val queries = broadcast(
      corpus.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm")))
    val denom = col("nrm") * col("q_nrm")
    corpus
      .join(broadcast(shortlist), col("vec_id") === col("neighbor_id"))
      .join(queries, col("sq") === col("query_id"))
      .select(col("query_id"), col("vec_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .as("cos"))
      .groupBy(col("query_id"))
      .agg(topk_rows(nullsLastKey(col("cos")), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        keyCos6(col("col.score")).as("cos6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF×BQ COMPOSED serving — the production binary-quantization shape
    * at 100 TB: the coarse quantizer routes each query to its `nProbe`
    * cells (partition pruning — the scan touches nProbe/nCentroids of
    * the corpus), candidates THERE are shortlisted by 8-byte Hamming
    * codes ([[graft.functions.SignPack]] — two ALU ops per candidate,
    * the embedding column never leaves the map side), and only the `m`
    * shortlisted vectors per query fetch their floats for the exact
    * re-rank. Cells cut the SCAN, codes cut the BYTES, the re-rank
    * restores exactness on queries·m rows — each stage bounded by the
    * one before it.
    *
    * Degenerate-parameter contract (spec-pinned): nProbe = nCentroids ∧
    * m ≥ |corpus| ⇒ every candidate reaches the exact re-rank, so the
    * output is bit-equal to [[annBruteForce]].
    *
    * Scale shape: ONE codes-only corpus pass (vec_id + cell id + sign
    * code — both projections codegen'd, ~12 bytes of payload per
    * vector); probes broadcast (driver-sized, the [[annIvfWith]]
    * argument); Hamming rank rides the bounded heap (≤ m rows per
    * query × partition cross the shuffle); the re-rank is
    * [[bqExactRerank]]. The oracle replays probes + cells from the
    * `__AUX__` write-time dumps and the pack/popcount/re-rank
    * arithmetic exactly. */
  def annIvfBq(embeddings: DataFrame, cents: Array[Array[Double]],
      queryIds: Seq[Long] = 0L to 4L, k: Int = 10, m: Int = 50,
      nProbe: Int = 4): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    import graft.functions.SignPack.sign_pack
    import graft.functions.TopKRows.topk_rows
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    // codes-only corpus relation: cell id + sign code, both map-side
    // codegen'd projections — a real deployment reads them from the
    // write-time index (exactly what the gate's oracle does)
    val coded = embeddings.select(col("vec_id"),
      nearest_centroid(col("embedding"), cents).as("c_id"),
      sign_pack(col("embedding")).as("code"))
    // probe lists on the driver (queries × centroids is driver-sized);
    // the query's own code comes from the SAME engine expression — pack
    // portability is the engine's problem exactly once (the annIvfSq
    // convention)
    val qRows = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"),
        sign_pack(col("embedding")).as("code"))
      .collect()
    val probeRows = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      val qCode = r.getLong(2)
      cents.indices.map { c =>
        val s = if (cnorms(c) != 0.0)
          cents(c).zip(q).map { case (a, b) => a * b }.sum / cnorms(c)
        else Double.NegativeInfinity
        (s, c)
      }.sortBy { case (s, c) => (-s, c) }.take(nProbe)
        .map { case (_, c) => (qid, c, qCode) }
    }
    val probesDf = broadcast(probeRows.toDF("query_id", "c_id", "q_code"))
    val shortlist = coded
      .join(probesDf, "c_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        bit_count(col("code").bitwiseXOR(col("q_code"))).cast("long")
          .as("ham"))
      // heap keeps (score DESC, id ASC); negate for Hamming ASC — ham
      // is in [0, 64], the annHamming convention
      .groupBy(col("query_id"))
      .agg(topk_rows(-col("ham"), col("vec_id"), m).as("top"))
      .select(col("query_id").as("sq"), explode(col("top.id")).as("neighbor_id"))
    bqExactRerank(embeddings, shortlist, queryIds, k)
  }

  /** ASYMMETRIC binary-quantization top-k — the standard recall upgrade
    * over symmetric Hamming ([[annHamming]]): the corpus stays at 1 bit
    * per dimension, but the QUERY is never quantized — each candidate
    * scores score(q, b) = Σᵢ qᵢ·(2bᵢ−1), the dot product of the float
    * query against the candidate's sign pattern. The query loses no
    * information (the whole reason asymmetric scoring exists — recall
    * at the same shortlist width is ≥ the symmetric chain's,
    * spec-pinned), while the corpus pass still touches 8 bytes per
    * vector.
    *
    * Determinism: query coordinates are micro-FLOORED to integers on
    * the driver (qmᵢ = floor(qᵢ·10⁶) — single-op IEEE floor, portable),
    * so every score is an exact BIGINT sum the oracle replays
    * bit-for-bit; the sign rule is [[graft.functions.SignPack]]'s
    * (bit clear on NaN). Ties to the lowest vec_id.
    *
    * Scale shape: codes-only corpus pass (8 bytes/vector), queries'
    * micro vectors broadcast, scoring one map-side higher-order
    * aggregate over the 64 bits, shortlist via the bounded heap, exact
    * re-rank on queries·m rows ([[bqExactRerank]]). */
  def annBqAsym(embeddings: DataFrame, queryIds: Seq[Long] = 0L to 4L,
      m: Int = 50, k: Int = 10): DataFrame = {
    import graft.functions.SignPack.sign_pack
    import graft.functions.TopKRows.topk_rows
    val spark = embeddings.sparkSession
    import spark.implicits._
    val codes = embeddings.select(col("vec_id"),
      sign_pack(col("embedding")).as("code"))
    val qRows = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding")).collect()
    val queryMicro = qRows.toSeq.map { r =>
      val qid = r.getLong(0)
      // floor(f32→f64 · 1e6): bit-identical to the oracle's
      // floor(CAST(x AS DOUBLE) * 1000000.0) — widen, multiply, floor
      val qm = r.getSeq[Float](1).take(64)
        .map(x => math.floor(x.toDouble * 1e6).toLong)
      (qid, qm)
    }
    val queries = broadcast(queryMicro.toDF("query_id", "q_micro"))
    // Σᵢ qmᵢ·(2bᵢ−1) over the candidate's packed bits — exact BIGINT,
    // order-free; one higher-order fold per candidate, map-side
    val score = expr(
      """aggregate(
        |  zip_with(q_micro,
        |    sequence(CAST(0 AS INT), CAST(size(q_micro) - 1 AS INT)),
        |    (qm, i) -> CASE WHEN (shiftright(code, i) & CAST(1 AS BIGINT)) = 1
        |      THEN qm ELSE -qm END),
        |  CAST(0 AS BIGINT), (s, x) -> s + x)""".stripMargin)
    val shortlist = codes.crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), score.as("score"))
      .groupBy(col("query_id"))
      .agg(topk_rows(col("score"), col("vec_id"), m).as("top"))
      .select(col("query_id").as("sq"), explode(col("top.id")).as("neighbor_id"))
    bqExactRerank(embeddings, shortlist, queryIds, k)
  }

  /** SEMANTIC dedup (SemDeDup-family): drop every embedding whose cosine
    * to an earlier-kept one clears `threshold`, transitively — the
    * embedding-space analogue of MinHash dedup_groups, used to prune
    * semantically redundant training examples that share no n-grams.
    *
    * Pipeline: multi-band hyperplane-LSH buckets generate candidate pairs
    * (never all-pairs), the exact cosine verifies each candidate
    * (precision 1.0 — only recall is probabilistic, controlled by
    * 1-(1-p^r)^b), pairs close transitively via [[graft.operators.Dedup
    * .connectedComponents]], and each component keeps its minimum vec_id
    * (deterministic election; the SemDeDup paper keeps the vector
    * farthest from the cluster centroid — centroid distance is not
    * engine-portable, min-id is, and the choice of WHICH member survives
    * does not change how many survive). Output: the kept corpus.
    *
    * Band defaults mirror [[annLsh]] (16×4), tuned to THIS corpus's dup
    * regime — its near-dups sit at cos ≈ 0.4 (p ≈ 0.63, recall ≈ 0.94), where
    * recall costs selectivity (a 4-bit band passes 1/16 of random pairs). At
    * production SemDeDup thresholds (cos ≥ 0.9, p ≥ 0.85) the same knobs
    * go fewer-and-wider (e.g. 8×12: random-pair pass 8·2⁻¹² ≈ 0.2%,
    * recall 0.93) — selectivity AND recall rise together as the dup bar
    * rises; both are per-call, the oracle mirrors whatever is chosen.
    * 100 TB: signatures are write-time state (computed once per vector,
    * like EmbeddingStore's IVF cells), the band join is the only corpus
    * shuffle, and CC runs on the pair set (orders of magnitude smaller
    * than the corpus). */
  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.4,
      bands: Int = 16, bitsPerBand: Int = 4): DataFrame = {
    val banded = bandTable(embeddings, bands, bitsPerBand)
    // verify INLINE in the band join: the exact-cosine filter runs in the
    // join's own stage, so the candidate fanout (bands × bucket² rows —
    // easily ≫ corpus in a dense-similarity regime) streams through the
    // codegen'd dot and DIES there; only true dup pairs (rare by
    // definition) reach a shuffle. The tempting id-only alternative
    // (distinct the candidate ids, join vectors back) shuffles that
    // superlinear candidate table three times — measured 1.3M candidate
    // rows from a 2k-vector corpus. Carrying the vectors widens the
    // banded shuffle by the embedding payload, a corpus-linear cost that
    // buys freedom from every candidate-linear shuffle.
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(dot(col("a.embedding"), col("b.embedding"))
        / (col("a.nrm") * col("b.nrm")) >= threshold)
      // a pair can match in several bands; collapse after the verify,
      // when multiplicity is true-pair-sized
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val dropped = graft.operators.Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as("vec_id"))
    embeddings
      // no broadcast hint: the drop-set is pair-bounded but a dup-heavy
      // corpus can make it large; AQE broadcasts it when it is small
      .join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** The banded hyperplane-LSH table (vec_id, embedding, nrm, band, bv)
    * — the WRITE-TIME index state of the semantic-dedup family, shared
    * by [[semanticDedup]] (self-join), [[semanticDedupAgainstStore]]
    * (probe side), and `store.EmbeddingStore.writeBanded` (persistence).
    * Plane weights are engine-portable, so signatures are a pure
    * function of the embedding — computed once per vector ever. */
  def bandTable(df: DataFrame, bands: Int = 16,
      bitsPerBand: Int = 4): DataFrame = {
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val signed = df.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"),
      lshSignature(col("embedding"), bands * bitsPerBand).as("sig"))
    val bandCols = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        shiftright(col("sig"), bd * bitsPerBand).bitwiseAND(mask).as("bv"))
    }
    signed.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
  }

  /** CROSS-CORPUS semantic near-dup check — the embedding twin of
    * [[graft.operators.Dedup.dedupAgainst]]: which INCOMING vectors
    * semantically duplicate something already in the corpus? The
    * asymmetry is the scale story, same as the MinHash side: the corpus
    * band table is write-time state (signatures computed once per vector
    * ever), the new batch's signatures cost ∝ batch. This overload
    * computes both sides inline (self-contained form); the gated query
    * uses [[semanticDedupAgainstStore]] over an index persisted by
    * `store.EmbeddingStore.writeBanded`. */
  def semanticDedupAgainst(newVecs: DataFrame, corpus: DataFrame,
      threshold: Double = 0.4, bands: Int = 16,
      bitsPerBand: Int = 4): DataFrame =
    semanticDedupAgainstStore(newVecs,
      bandTable(corpus, bands, bitsPerBand).select("vec_id", "band", "bv"),
      corpus.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm")),
      threshold, bands, bitsPerBand)

  /** The PROBE half of the cross-corpus check, over a persisted index:
    * `corpusSigs` (vec_id, band, bv) and `corpusVecs` (vec_id,
    * embedding, nrm) are write-time state read back from
    * [[graft.store.EmbeddingStore]] — the batch never pays the corpus's
    * signature cost. Shape: new-batch bands probe the signature table
    * (the only corpus-keyed join is on 3 small integer columns, not
    * payloads); candidates are batch-bounded id pairs; the exact-cosine
    * verify joins vectors back for candidates only — the same
    * candidates-then-verify shape as `Dedup.dedupAgainst`'s postings
    * probe. Output: (new_id, corpus_id, cos6), identical to the inline
    * overload (spec-pinned). */
  def semanticDedupAgainstStore(newVecs: DataFrame, corpusSigs: DataFrame,
      corpusVecs: DataFrame, threshold: Double = 0.4, bands: Int = 16,
      bitsPerBand: Int = 4): DataFrame = {
    val cands = bandTable(newVecs, bands, bitsPerBand).as("a")
      .join(corpusSigs.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .select(col("a.vec_id").as("new_id"), col("b.vec_id").as("corpus_id"))
      .distinct()
      // SELF-EXCLUSION: index rows carrying ANY of the probing batch's
      // own ids can only exist via an at-least-once REPLAY after the
      // batch's own append (the admitting loop appends after the
      // probe; ids are unique per ingest otherwise). Without the cut a
      // replayed micro-batch self-flags at cos 1.0 AND cross-flags its
      // own batch-internal near-dups — either way the replayed gate
      // decision differs from the original run. The batch id set is
      // broadcast; candidates are batch-bounded, so the anti-join is
      // output-sized.
      .join(broadcast(
          newVecs.select(col("vec_id").as("corpus_id")).distinct()),
        Seq("corpus_id"), "left_anti")
    val newSide = newVecs.select(col("vec_id").as("new_id"),
      col("embedding").as("e_a"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_a"))
    cands
      .join(newSide, "new_id")
      .join(corpusVecs.select(col("vec_id").as("corpus_id"),
        col("embedding").as("e_b"), col("nrm").as("n_b")), "corpus_id")
      .withColumn("cos", dot(col("e_a"), col("e_b"))
        / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("cos"), 6).as("cos6"))
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** INT8 symmetric quantization audit of the embedding column — the
    * 4× vector-store compression every production ANN tier applies
    * (scale = max|x|/127 per vector, q_i = round(x_i·127/max|x|)). The
    * gated output is the per-vector audit summary, not the int8 array
    * itself (array columns hash differently across engine result
    * formats): dim count, the 6-dp scale, and the exact integer sum /
    * L1-mass of the quantized vector — any single q_i differing flips a
    * checksum. Both engines evaluate the identical double expression
    * (float→double widening is exact, one multiply, one divide) and the
    * identical round-half-away-from-zero, so the integers are
    * bit-portable. Zero vectors quantize to all-zero (scale NULL).
    * Map-side per-row arithmetic at scan speed; no shuffle but the
    * presentation sort. */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        expr("CAST(size(embedding) AS BIGINT)").as("n_dims"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))").as("maxabs"))
      .select(col("vec_id"), col("n_dims"),
        when(col("maxabs") > 0.0, round(col("maxabs") / 127.0, 6))
          .as("scale6"),
        when(col("maxabs") > 0.0, expr(
          "aggregate(embedding, CAST(0 AS BIGINT), (a, x) -> a + " +
            "CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0) AS BIGINT))"))
          .otherwise(0L).as("q_sum"),
        when(col("maxabs") > 0.0, expr(
          "aggregate(embedding, CAST(0 AS BIGINT), (a, x) -> a + " +
            "abs(CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0) AS BIGINT)))"))
          .otherwise(0L).as("q_l1"))
      .orderBy(col("vec_id"))

  /** The int8 CODE VECTOR under [[quantizeInt8]]'s audit — the
    * write-time state the SQ8 serving tier stores per vector:
    * q_i = round(x_i·127/max|x|), round half-away-from-zero, zero
    * vectors to all-zero codes. Long-typed elements so downstream dot
    * products stay in exact BIGINT arithmetic. The identical expression
    * produces the `sq8_codes` aux dump and the query-time codes in
    * [[annIvfSq]], so the two cannot drift. */
  def sq8Codes(emb: Column): Column = {
    val maxabs = aggregate(emb, lit(0.0),
      (a, x) => greatest(a, abs(x.cast("double"))))
    transform(emb, x =>
      when(maxabs > 0.0,
        round(x.cast("double") * lit(127.0) / maxabs, 0).cast("long"))
        .otherwise(lit(0L)))
  }

  /** IVF-SQ8 search — the scalar-quantized sibling of [[annIvfPq]],
    * completing the FAISS serving trio (flat / PQ / SQ): the coarse
    * quantizer routes each query to its `nProbe` cells, and candidates
    * there are scored from their per-vector int8 codes ALONE — the
    * full float vectors are never touched at query time. Under the
    * symmetric per-vector scale (max|x|/127) the scale CANCELS in the
    * cosine, so the score is the integer-grid cosine of the code
    * vectors themselves: Σ qqᵢ·qcᵢ / (√Σqqᵢ²·√Σqcᵢ²). Numerator and
    * both norm² sums are exact BIGINTs (|q|≤127, d=64 ⇒ every sum
    * < 2³⁰, no accumulation-order hazard), the denominator crosses two
    * correctly-rounded sqrts and one multiply, the score one divide —
    * the oracle replays every comparison bit-for-bit from the
    * `__AUX__/sq8_codes` dump. Zero-norm codes sink to −1e308 (total
    * order); ties to the lowest vec_id.
    *
    * Scale shape: ONE corpus scan; the cell id and the 64 int8 codes
    * are map-side codegen'd projections here (a real deployment reads
    * them from the write-time index — exactly what the gate's oracle
    * does); the probe join broadcasts nProbe·|queries| rows carrying
    * the query's own codes; the only shuffle is the per-query top-k
    * window at probed-candidate cardinality. */
  def annIvfSq(embeddings: DataFrame, cents: Array[Array[Double]],
      queryIds: Seq[Long] = 0L to 4L, k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cnorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val coded = embeddings.select(col("vec_id"), col("embedding"),
      sq8Codes(col("embedding")).as("codes"))
      .withColumn("n2",
        aggregate(col("codes"), lit(0L), (s, q) => s + q * q))
    // query codes come from the SAME Spark expression (collected, not
    // recomputed on the driver) — round-half-away-from-zero portability
    // is the engine's problem exactly once
    val qRows = coded.filter(col("vec_id").isin(queryIds: _*)).collect()
    val probeRows = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1).map(_.toDouble).toArray
      val qCodes = r.getSeq[Long](2)
      val qN2 = r.getLong(3)
      val probes = cents.indices.map { c =>
        val s = if (cnorms(c) != 0.0)
          cents(c).zip(q).map { case (a, b) => a * b }.sum / cnorms(c)
        else Double.NegativeInfinity
        (s, c)
      }.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)
      probes.map(c => (qid, c, qCodes, qN2))
    }
    val probesDf = broadcast(
      probeRows.toDF("query_id", "c_id", "q_codes", "q_n2"))
    val assigned = coded.select(col("vec_id"), col("codes"), col("n2"),
      nearest_centroid(col("embedding"), cents).as("c_id"))
    val num = aggregate(
      zip_with(col("q_codes"), col("codes"), (a, b) => a * b),
      lit(0L), (s, x) => s + x)
    val denom = sqrt(col("q_n2").cast("double")) *
      sqrt(col("n2").cast("double"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq").desc, col("vec_id"))
    assigned
      .join(probesDf, "c_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sq",
        when(col("q_n2") > 0L && col("n2") > 0L,
          num.cast("double") / denom).otherwise(lit(-1e308)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("sq"), 6).as("sq6"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Reciprocal-kNN (mutual nearest neighbor) pair mining — the
    * high-precision near-duplicate / paraphrase miner: an unordered pair
    * (a, b) survives only when EACH side ranks the other inside its own
    * cosine top-`k`. One-directional kNN edges are mostly hub noise (a
    * generic centroid-ish vector is "near" everything); requiring
    * reciprocity is the classic precision filter (RNN pairs are what
    * SemDeDup-style pipelines trust enough to delete against).
    *
    * This is the DEFAULT entry point and it is the bounded one: the
    * directed top-k lists come from the banded hyperplane-LSH retriever
    * ([[knnLshDirected]], hot-bucket guard on), so the reciprocity join
    * is candidates×k-bounded — never the corpus square. Every emitted
    * pair is exactly scored and exactly ranked among the candidates;
    * only recall is probabilistic, the LSH contract every sketch
    * operator here carries. The corpus² scorer survives as
    * [[mutualKnnExact]] for audits (recall measurement, tiny corpora),
    * where its cost is affordable by construction. */
  def mutualKnn(embeddings: DataFrame, k: Int = 5): DataFrame =
    mutualKnnFrom(knnLshDirected(embeddings, k))

  /** AUDIT-ONLY exact form of [[mutualKnn]]: the corpus×corpus
    * brute-force scorer — quadratic in the corpus, so it exists for
    * recall audits and oracle-exact baselines, never as the default.
    * Scoring, rank order (cos desc, vec_id tiebreak) and the zero-norm
    * guard are exactly [[annBruteForce]]'s; the directed top-k relation
    * (≤ N·k rows) is localCheckpoint'ed so the reciprocity self-join
    * doesn't re-derive the scorer, and each surviving pair is emitted
    * once (a < b) with both ranks. At 100 TB inject a bounded directed
    * relation into [[mutualKnnFrom]] instead (any (src, cand_id, rank,
    * cos) list works — the rank list is the interface, as with
    * hybridRrf). */
  def mutualKnnExact(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val right = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("cand_id"))
    val denom = col("nrm") * col("c_nrm")
    val directed = corpus.crossJoin(right)
      .filter(col("vec_id") =!= col("cand_id"))
      .select(col("vec_id").as("src"), col("cand_id"),
        when(denom =!= 0.0, dot(col("embedding"), col("c_emb")) / denom)
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("cand_id"), col("rank"), col("cos"))
    mutualKnnFrom(directed)
  }

  /** The reciprocity step of [[mutualKnn]] over an INJECTED directed
    * kNN relation — the bounded-retriever entry point the 100 TB path
    * uses: `directed` must carry (src, cand_id, rank, cos) with rank
    * 1-based within src (what [[knnLshDirected]], or any ANN retriever's
    * rank list reshaped to those names, emits). A pair survives when
    * each side lists the other; emitted once (a < b) with both ranks.
    * The relation is localCheckpoint'ed so the self-join doesn't
    * re-derive the (possibly expensive) retriever, and the join is
    * candidates×k-bounded — never the corpus square. */
  def mutualKnnFrom(directed: DataFrame): DataFrame = {
    val d = directed
      .select(col("src"), col("cand_id"), col("rank"), col("cos"))
      .transform(x => graft.plans.PlanTrace.cp(x, tag = "knn_directed"))
    d.as("x")
      .join(d.as("y"),
        col("x.src") === col("y.cand_id") &&
          col("x.cand_id") === col("y.src") &&
          col("x.src") < col("x.cand_id"))
      .select(col("x.src").as("a"), col("x.cand_id").as("b"),
        col("x.rank").as("rank_ab"), col("y.rank").as("rank_ba"),
        round(col("x.cos"), 6).as("cos6"))
      .orderBy(col("a"), col("b"))
  }

  /** The banded-LSH DIRECTED candidate relation (src, cand_id) feeding
    * [[knnLshDirected]], with the hot-bucket df-cut guard: band keys are
    * censused over the deterministic h60 `samplePermille`‰ vector
    * sample, and any (band, bv) bucket whose sampled count exceeds
    * `max(1, maxBucket·samplePermille/1000)` is dropped from pair
    * generation (the `Dedup.hotShingles` calculus on plane-signature
    * keys). The census costs one pass over the sampled ids-only band
    * relation; the surviving hot set is bands·2^bitsPerBand-bounded and
    * broadcast to an anti join. Exposed so specs can assert the
    * candidate bound directly under an adversarial common-direction
    * cluster. */
  def lshCandidatePairs(embeddings: DataFrame, bands: Int = 16,
      bitsPerBand: Int = 4, maxBucket: Long = 200,
      samplePermille: Int = 100): DataFrame = {
    import graft.functions.PortableHash.h60
    require(bands * bitsPerBand <= graft.functions.PlaneSignature.MaxBits,
      "signature wider than the plane table")
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val bandCols = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        shiftright(col("sig"), bd * bitsPerBand).bitwiseAND(mask).as("bv"))
    }
    val banded = embeddings
      .select(col("vec_id"),
        lshSignature(col("embedding"), bands * bitsPerBand).as("sig"))
      .select(col("vec_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"),
        col("bk.bv").as("bv"))
    val sampleCut = math.max(1L, maxBucket * samplePermille / 1000)
    val hot = banded
      .filter(pmod(h60(col("vec_id").cast("string")), lit(1000L))
        < samplePermille)
      .groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > sampleCut)
      .select(col("band"), col("bv"))
    val kept = banded.join(broadcast(hot), Seq("band", "bv"), "left_anti")
    kept
      .join(kept.select(col("vec_id").as("cand_id"),
          col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("vec_id") =!= col("cand_id"))
      .select(col("vec_id").as("src"), col("cand_id"))
      .distinct()
  }

  /** ALL-SOURCE directed cosine top-`k` through the banded hyperplane
    * LSH — the bounded retriever that replaces [[mutualKnnExact]]'s
    * brute-force corpus×corpus scorer at scale: candidates come from the
    * banded self-join (two vectors meet iff SOME band of their plane
    * signature matches — the same banding calculus as [[annLsh]], whose
    * broadcast-queries form only serves a handful of query ids), then
    * the exact cosine verifies every candidate, so like every LSH
    * operator here only RECALL is probabilistic — a returned (src,
    * cand_id, rank, cos) row is exactly scored and exactly ranked among
    * the candidates. The band join is ids-only (band, bv keys); vectors
    * are re-attached by id afterwards, so the wide embedding arrays
    * never ride the candidate shuffle. The hot-bucket df-cut guard the
    * MinHash family carries (`Dedup`'s sampled shingle census) is ON:
    * a (band, bv) bucket whose SAMPLED occupancy exceeds
    * `maxBucket·samplePermille/1000` is dropped from pair generation —
    * a common-direction cluster (the zero vector, boilerplate
    * embeddings) is the one shape that would otherwise make the band
    * self-join quadratic in that bucket's size. The cut is
    * deterministic (h60 doc sample), so the DuckDB oracle mirrors the
    * candidate set exactly — the `ngram_jaccard_pairs` precedent. */
  def knnLshDirected(embeddings: DataFrame, k: Int = 5,
      bands: Int = 16, bitsPerBand: Int = 4,
      maxBucket: Long = 200, samplePermille: Int = 100): DataFrame = {
    val pairs = lshCandidatePairs(embeddings, bands, bitsPerBand,
      maxBucket, samplePermille)
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val denom = col("s_nrm") * col("c_nrm")
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("cand_id"))
    pairs
      .join(corpus.select(col("vec_id").as("src"),
        col("embedding").as("s_emb"), col("nrm").as("s_nrm")), Seq("src"))
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"), col("nrm").as("c_nrm")),
        Seq("cand_id"))
      .select(col("src"), col("cand_id"),
        when(denom =!= 0.0, dot(col("s_emb"), col("c_emb")) / denom)
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("cand_id"), col("rank"), col("cos"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998) of
    * the brute-force top-`n` candidates for one query vector — the
    * diversity pass a retrieval pipeline runs between ANN and the
    * consumer: pure cosine top-k hands back near-duplicates of the best
    * hit; MMR greedily picks argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s),
    * trading relevance against redundancy with what's already selected.
    *
    * Determinism: relevance and pairwise similarity are micro-FLOORED to
    * BIGINTs first (floor is portable on both engines for either sign),
    * and with λ = 0.7 the greedy criterion is the exact integer
    * 7·rel_micro − 3·maxsim_micro (×10 scale — no division anywhere);
    * ties break to the smallest vec_id; the empty-set max is 0 (the
    * textbook convention), so step 1 is the pure-relevance pick.
    *
    * Scale shape: the corpus-sized work is the ONE scan that scores and
    * cuts to `n` candidates (TakeOrdered semantics via the rank window —
    * at 100 TB the IVF/LSH retrievers substitute, as with ann_topk); the
    * greedy loop then runs on the constant-size candidate window — k·n²
    * integer ops independent of corpus size, driver-resident by the same
    * "queries × centroids is driver-sized by definition" argument as the
    * IVF probe selection. Output: one row per selection step with the
    * audit trail (relevance, redundancy, combined score).
    *
    * EAGER: the candidate cut `.collect()`s at CONSTRUCTION time (two
    * Spark jobs — the scoring scan and the top-n cut), and every call
    * recomputes them; build the DataFrame only when the result is
    * wanted (a plan-inspection pass pays the jobs too — the same note
    * the localCheckpointed prefixes carry). */
  def mmrRerank(embeddings: DataFrame, queryId: Long = 0L, n: Int = 20,
      k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val q = broadcast(corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm")))
    val denom = col("nrm") * col("q_nrm")
    // distributed half: score the corpus, cut to the top-n candidate
    // window with TakeOrderedAndProject (orderBy+limit — never a global
    // sort, never a single-partition window)
    val candsDf = corpus.crossJoin(q)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding"),
        when(denom =!= 0.0, dot(col("embedding"), col("q_emb")) / denom)
          .otherwise(0.0).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(n)
      .select(col("vec_id"), col("embedding"),
        floor(col("cos") * lit(1e6)).cast("long").as("rel_micro"))
    graft.plans.PlanTrace.record("mmr_cands",
      graft.plans.PlanFingerprint.structSha(candsDf))
    val cands = candsDf.collect()
    val ids = cands.map(_.getLong(0))
    val rel = cands.map(_.getLong(2))
    val vecs = cands.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val nrms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    def simMicro(i: Int, j: Int): Long = {
      val d = nrms(i) * nrms(j)
      val c = if (d != 0.0) vecs(i).zip(vecs(j)).map(p => p._1 * p._2).sum / d
        else 0.0
      math.floor(c * 1e6).toLong
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    for (step <- 1 to math.min(k, cands.length)) {
      val best = cands.indices
        .filterNot(selected.contains)
        .map { i =>
          val maxsim =
            if (selected.isEmpty) 0L else selected.map(simMicro(i, _)).max
          (i, rel(i), maxsim, 7L * rel(i) - 3L * maxsim)
        }
        .minBy { case (i, _, _, score) => (-score, ids(i)) }
      selected += best._1
      out += ((step.toLong, ids(best._1), best._2, best._3, best._4))
    }
    out.toSeq
      .toDF("step", "vec_id", "rel_micro", "maxsim_micro", "mmr_scaled")
      .orderBy(col("step"))
  }

  /** Cluster-stratified DIVERSITY sample — the cluster-balanced subset
    * selection a curation pipeline runs after clustering (the SemDeDup /
    * prototype-selection shape: raw hash sampling over-represents the
    * corpus's dense regions, so sample a fixed `quota` per semantic
    * cluster instead; every mode of the embedding distribution is
    * represented regardless of its mass). Cells are the write-time IVF
    * assignment ([[graft.functions.NearestCentroid]] over the persisted
    * coarse quantizer — the same state `ann_ivf_topk` probes); within a
    * cell, selection is the deterministic h60 priority (smallest first,
    * vec_id tiebreak), the Duffield–Thorup convention the weighted
    * sampler carries, so the subset is engine-reproducible bit-for-bit.
    *
    * Shape at 100 TB: cell assignment is map-side (centroids ride the
    * plan as literals); per-cell selection is the bounded-heap
    * [[graft.functions.TopKRows]] aggregate — ≤ quota rows per cell per
    * partition cross the shuffle, never the cell's population (the
    * group_topk lesson: a rank window would sort whole cells). Output
    * is nCells·quota rows. */
  /** Cluster-level CORPUS MAP — the per-cluster report a curation team
    * reads before acting on a clustering (the Atlas/Nomic-style corpus
    * cartography read): for every write-time IVF cell, its document
    * mass, char mass, source mixture (dominant source + its share) and
    * language spread, joining the cell assignment to the documents
    * table on the vec_id ≡ doc_id identity the semantic-dedup family
    * already carries.
    *
    * Determinism: counts and char sums are exact BIGINTs; the dominant
    * source is a min(struct(-cnt, source)) argmax (count desc, then
    * lexicographic — the ivfPurity election); its share is an integer
    * micro floor. No floats anywhere.
    *
    * Shape at 100 TB: cell assignment is map-side; the metadata join is
    * doc_id-keyed (AQE-broadcast when the embedding side is a probe);
    * both aggregates are (cells × sources)- and cells-bounded. */
  def clusterProfile(embeddings: DataFrame,
      centroids: Array[Array[Double]], documents: DataFrame): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    val cells = embeddings.select(col("vec_id").as("doc_id"),
      nearest_centroid(col("embedding"), centroids).as("c_id"))
    val joined = cells.join(
      documents.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars")), Seq("doc_id"))
    val bySource = joined.groupBy(col("c_id"), col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("ch"))
    val perCell = bySource.groupBy(col("c_id"))
      .agg(sum(col("cnt")).cast("long").as("n_docs"),
        sum(col("ch")).cast("long").as("n_chars"),
        count(lit(1)).as("n_sources"),
        min(struct((-col("cnt")).as("neg"), col("source")))
          .as("top"))
    val langs = joined.groupBy(col("c_id"))
      .agg(count_distinct(col("lang")).as("n_langs"))
    perCell.join(langs, Seq("c_id"))
      .select(col("c_id"), col("n_docs"), col("n_chars"),
        col("n_sources"), col("top.source").as("top_source"),
        expr("(-top.neg) * 1000000 div n_docs")
          .as("top_source_share_micro"),
        col("n_langs"))
      .orderBy(col("c_id"))
  }

  def diversitySample(embeddings: DataFrame,
      centroids: Array[Array[Double]], quota: Int = 10): DataFrame = {
    import graft.functions.NearestCentroid.nearest_centroid
    import graft.functions.PortableHash.h60
    import graft.functions.TopKRows.topk_rows
    embeddings
      .select(col("vec_id"),
        nearest_centroid(col("embedding"), centroids).as("c_id"),
        h60(col("vec_id").cast("string")).as("pr"))
      // bottom-k by priority = top-k of the negated score (pr < 2^60,
      // so negation is overflow-safe); ties to the smallest vec_id
      .groupBy(col("c_id"))
      .agg(topk_rows(-col("pr"), col("vec_id"), quota).as("top"))
      .select(col("c_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("c_id"), (col("i") + 1).cast("long").as("rank"),
        col("e.id").as("vec_id"), (-col("e.score")).as("pr"))
      .orderBy(col("c_id"), col("rank"))
  }
}
