package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.store.EmbeddingStore
import graft.streaming.StreamIvfIngest

/** The IVF maintenance loop CLOSED: a drifted ingest unbalances the
  * cell census (the trigger `StreamIvfIngest` emits), the re-cluster
  * executor refits + rewrites swap-on-success, and the layout health
  * audits improve while serving recall does not regress.
  *
  * Drift model: the testdata embeddings are label-uncorrelated noise
  * (intra-label mean cosine ≈ inter-label — measured), so the drift
  * cohorts are CONSTRUCTED geometric modes the stale quantizer never
  * saw: two tight blobs along orthogonal unseen directions (dims 0–3 /
  * dims 4–7), each with its own label. Under the stale centroids each
  * blob piles into whatever original cell its direction happens to
  * argmax (cosine assignment is magnitude-invariant), so cells skew and
  * assignment margins for the blob mass collapse; a refit gives each
  * mode a dedicated centroid. */
class IvfReclusterSpec extends SparkSpec {
  import spark.implicits._

  private def blob(base: org.apache.spark.sql.DataFrame, idOffset: Long,
      dimLo: Int, dimHi: Int, label: Int) =
    base.filter(col("vec_id") < 250)
      .select((col("vec_id") + idOffset).as("vec_id"),
        expr(s"""transform(embedding, (x, i) ->
          CAST(x * CAST(0.05 AS FLOAT) +
            CASE WHEN i >= $dimLo AND i < $dimHi THEN CAST(2.0 AS FLOAT)
                 ELSE CAST(0.0 AS FLOAT) END AS FLOAT))""")
          .as("embedding"),
        lit(label).as("label"))

  test("drift census triggers; recluster improves skew+margin, holds purity+recall") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label"))
    val driftA = blob(emb, 500L, 0, 4, 100)
    val driftB = blob(emb, 750L, 4, 8, 101)
    val full = emb.unionByName(driftA).unionByName(driftB)

    // the pre-drift world: quantizer fit + layout written on the
    // original corpus only
    val stale = Similarity.kmeansCentroids(emb)
    val path = java.nio.file.Files
      .createTempDirectory("graft_recluster_store").toString
    EmbeddingStore.writeClustered(
      emb.select(col("vec_id"), col("embedding")), path, stale)

    // drifted ingest under the FROZEN quantizer; the per-batch cell
    // counts are the trigger statistic
    val rows = driftA.unionByName(driftB)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Array[Float])]
    val counts = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    val q = StreamIvfIngest.start(
      src.toDF().toDF("vec_id", "embedding"), path, stale,
      (df, _) => df.collect()
        .foreach(r => counts(r.getInt(0)) += r.getLong(1)))
    try {
      src.addData(rows: _*); q.processAllAvailable()
    } finally q.stop()

    // TRIGGER: merge the streamed counts with the pre-drift census and
    // measure balance — each 250-vector blob landed whole in one cell
    // (cosine argmax is direction-only), so max/mean load must scream
    val preCensus = EmbeddingStore.read(spark, path)
      .filter(col("vec_id") < 500)
      .groupBy(col("c_id").cast("int").as("c")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val census = (preCensus.keySet ++ counts.keySet).toSeq
      .map(c => c -> (preCensus.getOrElse(c, 0L) + counts(c)))
    val skewBefore = EmbeddingStore.cellSkewMicro(census)
    assert(skewBefore >= 2000000L,
      s"drift must unbalance the census (max/mean = $skewBefore micro)")

    // EXECUTOR: refit from the store contents, rewrite, swap
    val out = java.nio.file.Files
      .createTempDirectory("graft_recluster_out").toString
    val fresh = EmbeddingStore.recluster(spark, path, out)
    EmbeddingStore.swapReclustered(path, out)

    // layout/centroids swapped TOGETHER: every stored c_id is the fresh
    // assignment, and the census rebalanced
    val store = EmbeddingStore.read(spark, path)
    assert(store.count() == 1000L)
    val freshCensus = store.groupBy(col("c_id").cast("int").as("c"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
    val skewAfter = EmbeddingStore.cellSkewMicro(freshCensus)
    assert(skewAfter < skewBefore,
      s"recluster must rebalance ($skewBefore -> $skewAfter micro)")

    def weightedMarginMicro(cents: Array[Array[Double]]): Double = {
      val rs = Similarity.ivfMargin(full, cents).collect()
      val n = rs.map(_.getLong(1)).sum.toDouble
      rs.map(r => r.getLong(1) * r.getLong(2).toDouble).sum / n
    }
    val mStale = weightedMarginMicro(stale)
    val mFresh = weightedMarginMicro(fresh)
    assert(mFresh > mStale,
      s"dedicated mode centroids must widen margins ($mStale -> $mFresh)")

    def purityMicro(cents: Array[Array[Double]]): Long = {
      val rs = Similarity.ivfPurity(full, cents).collect()
      val n = rs.map(_.getLong(1)).sum
      rs.map(_.getLong(3)).sum * 1000000L / n
    }
    val pStale = purityMicro(stale)
    val pFresh = purityMicro(fresh)
    assert(pFresh >= pStale,
      s"purity must not regress ($pStale -> $pFresh micro)")

    // serving recall over the drifted corpus: not worse under the fresh
    // quantizer (queries span both cohorts)
    val qids = Seq(0L, 1L, 500L, 501L, 750L)
    val exact = Similarity.annBruteForce(full, qids)
    def minRecall(cents: Array[Array[Double]]): Long =
      Similarity.annRecall(exact, Similarity.annIvfWith(full, cents, qids))
        .collect().map(_.getLong(3)).min
    assert(minRecall(fresh) >= minRecall(stale),
      "recall must not regress after the re-cluster")

    // BAND-INDEX refresh — the last leg of the maintenance loop: the
    // hyperplane signatures are centroid-independent, but the index
    // must cover the vectors the DRIFTED INGEST added, so the refresh
    // rebuilds it from the post-swap store contents; the cross-corpus
    // semantic check then flags an exact re-send of a drifted vector
    // (it could not before: the pre-drift index never saw the blob)
    val bandPath = java.nio.file.Files
      .createTempDirectory("graft_recluster_bands").toString
    EmbeddingStore.writeBanded(
      store.select(col("vec_id"), col("embedding")), bandPath)
    // the blob re-arrives under a FRESH id: an id already in the index
    // is the replay self-exclusion cut (it can only be this batch
    // re-probed after its own append — r14 against-family contract),
    // so a true duplicate presents as a new document
    val resend = driftA.filter(col("vec_id") === 500L)
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    val flagged = Similarity.semanticDedupAgainstStore(resend,
      EmbeddingStore.readBandedSigs(spark, bandPath),
      EmbeddingStore.readBandedVecs(spark, bandPath))
    assert(flagged.filter(col("corpus_id") === 500L).count() == 1L,
      "refreshed band index must cover the ingested drift cohort")

    // the swap shares Swap.commit — the crash window recovers here too
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_recluster_out2").toString
    EmbeddingStore.recluster(spark, path, out2)
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + ".retired")) // swap step 1, crash
    graft.store.Swap.recover(path)
    assert(EmbeddingStore.read(spark, path).count() == 1000L)
  }
}
