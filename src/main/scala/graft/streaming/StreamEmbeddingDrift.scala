package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift

/**
 * Streaming embedding-drift monitor — the representation-space twin of
 * [[StreamDrift]]: a FROZEN per-(label, dim) sum/count table (the
 * training snapshot's centroid state) against a continuously-folded
 * live table, with the centroid-shift statistic re-assembled on demand
 * via the SAME [[Drift.centroidShift]] the batch operator uses, so
 * streamed ≡ batch by construction.
 *
 * Per-dim sums and counts are SUM-mergeable, so each micro-batch folds
 * with one (label, i) sum; state is bounded at labels × dims FOREVER,
 * independent of how many vectors have streamed past. The same +10⁶
 * micro-floor offset as the batch operator keeps every mean positive,
 * so the shared assembly's truncating division is floor on both the
 * Spark and oracle sides.
 */
object StreamEmbeddingDrift {

  /** Per-(label, i) sum/count of micro-floored offset dims — the
    * mergeable sufficient statistic for a centroid. */
  def sums(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("i"),
        (floor(col("x").cast("double") * 1000000).cast("long") +
          1000000L).as("xi"))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("c"))

  /** Running live centroid state vs a frozen reference. */
  final class CentroidTable(spark: SparkSession, reference: DataFrame)
      extends StandingTable(spark) {
    import spark.implicits._
    private val ref = reference.select(col("label"), col("i"),
      col("s").cast("long").as("s"), col("c").cast("long").as("c"))
      .localCheckpoint(true)
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Int, Long, Long)].toDF("label", "i", "s", "c")
    protected def stateColumns: Seq[String] = Seq("label", "i", "s", "c")
    /** The folded live state — rows bounded by labels × dims. */
    def liveSums: DataFrame = currentState
    protected def foldInto(state: DataFrame,
        embeddings: DataFrame): DataFrame =
      state
        .unionByName(sums(embeddings))
        .groupBy(col("label"), col("i"))
        .agg(sum(col("s")).cast("long").as("s"),
          sum(col("c")).cast("long").as("c"))
    /** Centroid shift of live vs reference, one row per label. */
    def stat: DataFrame = {
      val joined = ref.select(col("label"), col("i"),
          col("s").as("s0"), col("c").as("c0"))
        .join(currentState.select(col("label"), col("i"),
          col("s").as("s1"), col("c").as("c1")),
          Seq("label", "i"), "full_outer")
        .select(col("label"), col("i"),
          coalesce(col("s0"), lit(0L)).as("s0"),
          coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("s1"), lit(0L)).as("s1"),
          coalesce(col("c1"), lit(0L)).as("c1"))
      Drift.centroidShift(joined)
    }
  }

  /** Stream of (vec_id, embedding, label) rows → continuously-folded
    * centroid state. */
  def start(embeddings: DataFrame, table: CentroidTable): StreamingQuery =
    embeddings.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
