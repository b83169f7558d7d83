package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/**
 * Incremental dedup GROUPS over a stream of near-dup candidate pairs —
 * the streaming completion of the batch pipeline
 * (Dedup.minhashLshPairs → Dedup.connectedComponents): as new documents
 * arrive and pair against the corpus, their pairs fold into the existing
 * (doc_id, rep_id) assignment without recomputing components from
 * history.
 *
 * Why foreachBatch and not mapGroupsWithState: connected components is
 * CROSS-key state — one new pair can merge two arbitrary groups, so no
 * per-key partitioning of the state is stable under arrival. Structured
 * Streaming's keyed-state operators cannot express that; the standard
 * production shape is a micro-batch merge against a maintained table
 * (here a driver-held checkpointed DataFrame; at 100 TB a compacted
 * storage table keyed by doc_id, merged with the same three joins).
 *
 * Per-batch cost is proportional to the batch's pairs plus the members
 * of the groups it touches — NOT to history: the rep-graph CC runs on
 * contracted edges (one node per existing group), and near-dup batches
 * touch few groups. The relabel join is the one full-table op; with the
 * groups table bucketed by rep_id it is a map-side broadcast of the
 * (tiny) rep remap.
 *
 * Invariants (spec-asserted): after each fold the assignment equals the
 * batch CC over all pairs seen so far; groups only ever MERGE (the
 * partition coarsens monotonically — a doc's rep never moves to a
 * different component, it only drops to a smaller min-id).
 */
object StreamGroups {

  /** Fold one batch of pairs (id_a, id_b) into an existing assignment
    * (doc_id, rep_id). Unseen doc ids enter as their own singleton before
    * merging. Result: the same assignment batch CC would produce over
    * (members of `groups`) ∪ (endpoints of all pairs folded so far). */
  def merge(groups: DataFrame, newPairs: DataFrame): DataFrame = {
    val g = groups.select(col("doc_id"), col("rep_id"))
    // each endpoint → its current representative (identity if unseen)
    val ga = g.select(col("doc_id").as("id_a"), col("rep_id").as("rep_a"))
    val gb = g.select(col("doc_id").as("id_b"), col("rep_id").as("rep_b"))
    val mapped = newPairs.select(col("id_a"), col("id_b"))
      .join(ga, Seq("id_a"), "left")
      .join(gb, Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("rep_a"), col("id_a")).as("src"),
        coalesce(col("rep_b"), col("id_b")).as("dst"))
      .localCheckpoint(true) // referenced 3× below; compute the joins once
    // contracted rep-graph: one node per touched group, edges only where
    // a pair actually bridges two groups
    val repEdges = mapped
      .select(col("src").as("id_a"), col("dst").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    // old rep → new (merged, min-id) rep, for touched groups only
    val repMap = Dedup.connectedComponents(repEdges)
      .select(col("doc_id").as("old_rep"), col("rep_id").as("new_rep"))
    // relabel existing members of merged groups; untouched rows pass through
    val relabeled = g
      .join(repMap, g("rep_id") === repMap("old_rep"), "left")
      .select(g("doc_id"), coalesce(col("new_rep"), g("rep_id")).as("rep_id"))
    // endpoints never seen before join with their (possibly merged) rep
    val newMembers = mapped
      .select(col("id_a").as("doc_id"), col("src").as("rep"))
      .union(mapped.select(col("id_b").as("doc_id"), col("dst").as("rep")))
      .distinct()
      .join(g.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .join(repMap, col("rep") === col("old_rep"), "left")
      .select(col("doc_id"), coalesce(col("new_rep"), col("rep")).as("rep_id"))
    relabeled.union(newMembers)
  }

  /** Driver-held assignment, checkpointed per fold so the iterative
    * lineage never grows across batches. At scale this is a storage
    * table; the merge logic is identical. */
  final class GroupTable(spark: SparkSession)
      extends StandingTable(spark) {
    import spark.implicits._
    protected def emptyState: DataFrame =
      Seq.empty[(Long, Long)].toDF("doc_id", "rep_id")
    protected def stateColumns: Seq[String] = Seq("doc_id", "rep_id")
    def groups: DataFrame = currentState
    protected def foldInto(state: DataFrame, pairs: DataFrame): DataFrame =
      merge(state, pairs)
  }

  /** Stream of pairs → continuously-folded group table. */
  def start(pairs: DataFrame, table: GroupTable): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        table.fold(batch, batchId))
      .start()
}
