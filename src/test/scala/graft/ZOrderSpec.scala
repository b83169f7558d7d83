package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.store.ZOrder

/** Z-order clustering delivers multi-column data skipping: on a 256×256
  * grid written as range-partitioned files, a filter on the SECOND
  * dimension reads a small fraction of the rows from the z-ordered layout
  * but everything from the x-sorted layout (whose files each span the full
  * y range). Skipping is measured through the scan's numOutputRows —
  * parquet prunes whole row groups/files by footer stats, and the
  * vectorized reader returns every row of the surviving groups. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def grid: DataFrame =
    spark.range(0, 256L * 256).select(
      (col("id") % 256).as("x"),
      (col("id") / 256).cast("long").as("y"),
      col("id").as("payload"))

  private def rowsScanned(df: DataFrame): Long = {
    df.collect() // populate metrics
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("a second-column filter skips most z-ordered files, none of the x-sorted ones") {
    val base = java.nio.file.Files.createTempDirectory("graft-z").toString
    // identical data, two layouts, 64 files each
    grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/by_x")
    ZOrder.cluster(grid, col("x"), 0, 255, col("y"), 0, 255, nChunks = 64)
      .write.parquet(s"$base/by_z")

    def q(path: String) = spark.read.parquet(path)
      .filter(col("y") >= 10 && col("y") <= 19) // x untouched
    val sortedRows = rowsScanned(q(s"$base/by_x"))
    val zRows = rowsScanned(q(s"$base/by_z"))

    // x-sorted layout: every file spans all y → nothing skipped
    assert(sortedRows == 256L * 256, s"expected full scan, got $sortedRows")
    // z-ordered layout: files are ~2-D rectangles → most y-ranges skip
    assert(zRows <= sortedRows / 2,
      s"z-order skipped too little: $zRows of $sortedRows")
    // same answer from both layouts
    assert(q(s"$base/by_x").count() == q(s"$base/by_z").count())
  }

  test("morton code interleaves bits (hand-computed values)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.interleaved(col("a"), col("b"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5) : a=0011 even bits → 0b00000101; b=0101 odd bits → 0b01000110...
    // a bits: k0→bit0 (1), k1→bit2 (1); b bits: k0→bit1 (1), k2→bit5 (1)
    assert(got == Seq(0L, 1L, 2L, 1L + 4L + 2L + 32L))
  }
}
