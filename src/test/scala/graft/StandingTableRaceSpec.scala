package graft

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StandingTable

/** Block-release attribution for driver-held standing state: the fold's
  * checkpoint bookkeeping reads the persisted-RDD ids DIRECTLY off the
  * checkpointed plan ([[GraftBridge.checkpointedRddIds]]), never by
  * diffing the global persistent-RDD registry — two tables folding
  * concurrently (locks are per-instance) could capture each other's
  * fresh blocks in such a diff and later unpersist the OTHER table's
  * live checkpointed state. */
class StandingTableRaceSpec extends SparkSpec {

  /** Minimal standing table: per-key row counts. */
  private final class CountTable(s: SparkSession) extends StandingTable(s) {
    protected def emptyState: DataFrame = {
      import s.implicits._
      Seq.empty[(String, Long)].toDF("k", "cnt")
    }
    protected def stateColumns: Seq[String] = Seq("k", "cnt")
    protected def foldInto(state: DataFrame, batch: DataFrame): DataFrame =
      state
        .unionByName(batch.groupBy(col("k")).agg(count(lit(1)).as("cnt")))
        .groupBy(col("k")).agg(sum(col("cnt")).cast("long").as("cnt"))
    def readout: DataFrame = currentState
  }

  test("checkpointedRddIds attributes exactly the checkpointed blocks") {
    val a = spark.range(10).toDF("v").localCheckpoint(true)
    val b = spark.range(5).toDF("v").localCheckpoint(true)
    val idsA = GraftBridge.checkpointedRddIds(a)
    val idsB = GraftBridge.checkpointedRddIds(b)
    assert(idsA.size == 1 && idsB.size == 1,
      "an eager localCheckpoint persists exactly one RDD")
    assert(idsA.intersect(idsB).isEmpty,
      "distinct checkpoints must attribute distinct blocks")
    val live = spark.sparkContext.getPersistentRDDs.keySet
    assert(idsA.subsetOf(live) && idsB.subsetOf(live),
      "attributed ids must be registered persistent RDDs")
    // a plain (non-checkpointed) plan attributes nothing
    assert(GraftBridge.checkpointedRddIds(
      spark.range(3).toDF("v")).isEmpty)
  }

  test("two tables folding concurrently never release each other's state") {
    import spark.implicits._
    val ta = new CountTable(spark)
    val tb = new CountTable(spark)
    val batchA = (1 to 40).map(i => "a" + (i % 5)).toDF("k")
    val batchB = (1 to 40).map(i => "b" + (i % 3)).toDF("k")
    val folds = 12
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new Runnable {
        def run(): Unit = (1 to folds).foreach(_ => ta.fold(batchA))
      })
      val fb = pool.submit(new Runnable {
        def run(): Unit = (1 to folds).foreach(_ => tb.fold(batchB))
      })
      fa.get(); fb.get() // surfaces any fold-side missing-block error
    } finally pool.shutdown()
    // with keyset-diff attribution a fold could have unpersisted the
    // OTHER table's live checkpoint — its readout then dies on a
    // missing block; exact attribution keeps both readable and exact
    val sumA = ta.readout.agg(sum(col("cnt"))).as[Long].head()
    val sumB = tb.readout.agg(sum(col("cnt"))).as[Long].head()
    assert(sumA == folds.toLong * 40, s"table A folded $sumA")
    assert(sumB == folds.toLong * 40, s"table B folded $sumB")
  }

  test("resetWatermark enables positionless re-feed after load") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_standing_reset").toString + "/snap"
    val t = new CountTable(spark)
    t.fold((1 to 10).map(_ => "x").toDF("k"), batchId = 5L)
    t.save(dir)

    val resumed = new CountTable(spark)
    resumed.load(dir)
    assert(resumed.lastFolded == 5L)
    // a NEW stream checkpoint restarts batchIds at 0 — guarded (skipped)
    resumed.fold((1 to 7).map(_ => "y").toDF("k"), batchId = 0L)
    assert(resumed.readout.filter(col("k") === "y").count() == 0)
    // positionless-start mode: clear the watermark, the batch applies
    resumed.resetWatermark()
    assert(resumed.lastFolded == -1L)
    resumed.fold((1 to 7).map(_ => "y").toDF("k"), batchId = 0L)
    assert(resumed.readout.filter(col("k") === "y")
      .agg(sum(col("cnt"))).as[Long].head() == 7L)
  }
}
