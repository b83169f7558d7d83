package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16 directive #6): same-host interleaved A/B of the
  * semantic_dedup candidate-pair stage — the committed INLINE-verify
  * shape (band join carries embeddings, exact cosine dies in the join
  * stage) vs the GATHER shape (ids-only band join, distinct the
  * candidate pairs, join vectors back, verify) — plus the stage split
  * (pairs vs connected components) so the decision targets where the
  * time actually goes. Results identical by construction (same
  * candidates, same verify); this probe only times. Not part of the
  * driver contract; never run by Bench/Verify.
  *
  * Usage: runMain graft.SemProbe [sfDir]
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorOps.dot
    import graft.operators.Similarity.bandTable

    val threshold = 0.4
    def emb = Tables.embeddings(spark, sfDir)

    // A: the committed inline-verify pair stage (Similarity.semanticDedup's
    // `pairs` subtree, verbatim)
    def pairsInline(): DataFrame = {
      val banded = bandTable(emb, 16, 4)
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")) >= threshold)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
    }
    // B: ids-only band join, distinct candidates, gather vectors, verify
    def pairsGather(): DataFrame = {
      val banded = bandTable(emb, 16, 4).select("vec_id", "band", "bv")
      val cands = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
      val vecs = emb.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      cands
        .join(vecs.select(col("vec_id").as("id_a"),
          col("embedding").as("e_a"), col("nrm").as("n_a")), "id_a")
        .join(vecs.select(col("vec_id").as("id_b"),
          col("embedding").as("e_b"), col("nrm").as("n_b")), "id_b")
        .filter(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))
          >= threshold)
        .select(col("id_a"), col("id_b"))
    }
    def fullFrom(pairs: DataFrame): DataFrame = {
      val dropped = graft.operators.Dedup.connectedComponents(pairs)
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("doc_id").as("vec_id"))
      emb.join(dropped, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }

    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) =>
        if (!SparkEntry.pinnedRddIds.contains(id))
          rdd.unpersist(blocking = false)
      }
    def timed(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      sweep()
      (System.nanoTime() - t0) / 1e9
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000

    // warmup both shapes (JIT), then interleave A B A B A B
    timed(pairsInline); timed(pairsGather)
    val stages = Seq(
      "pairs_inline" -> (() => pairsInline()),
      "pairs_gather" -> (() => pairsGather()),
      "full_inline" -> (() => fullFrom(pairsInline())),
      "full_gather" -> (() => fullFrom(pairsGather())))
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to 3).foreach { _ =>
      stages.foreach { case (n, mk) => samples(n) = samples(n) :+ timed(mk) }
    }
    val nPairs = pairsInline().count()
    val nCandRows = {
      val banded = bandTable(emb, 16, 4).select("vec_id", "band", "bv")
      banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id")).count()
    }
    val out = stages.map { case (n, _) =>
      s""""$n":{"min":${r3(samples(n).min)},"runs":[${samples(n).map(r3).mkString(",")}]}"""
    }.mkString(",")
    println(s"""{"probe":"semantic_dedup_ab","sf":"$sfDir","n_verified_pairs":$nPairs,"n_candidate_rows":$nCandRows,$out}""")
    spark.stop()
  }
}
