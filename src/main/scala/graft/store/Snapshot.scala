package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Swap-committed parquet snapshot of a driver-held standing relation
 * PLUS the stream position it covers — the shared persistence half of
 * the [[graft.streaming.StandingTable]] contract (the ST5 restart
 * story for state Spark's own streaming checkpoint does not hold: the
 * checkpoint replays source offsets, but the folded relation lives on
 * the driver).
 *
 * The `last_batch` watermark rides INSIDE the snapshot directory as an
 * underscore-prefixed sidecar (parquet directory readers skip `_*`
 * files, the `_SUCCESS` convention), so the two-rename [[Swap.commit]]
 * commits relation and position ATOMICALLY: a reader can never pair a
 * new relation with an old watermark or vice versa. Snapshots written
 * before the watermark existed load as position −1 — "unknown, never
 * skip a fold" — which is exactly the pre-watermark behavior.
 */
object Snapshot {

  private def metaFile(dir: String) =
    Paths.get(dir.stripSuffix("/"), "_graft_meta")

  /** Write `state` + `lastBatch` to `path`, swap-committed: parquet
    * lands in a `.next` sibling, then the two-rename swap (or a plain
    * move for the very first snapshot) makes it live. A crash mid-save
    * keeps the previous snapshot whole. */
  def save(state: DataFrame, path: String, lastBatch: Long): Unit =
    saveParts(Seq("" -> state), path, lastBatch)

  /** Multi-relation snapshot — for standing state held as SEVERAL
    * coupled tables (`StreamJoinSize.SideState`'s exact key counts +
    * CMS cells): all parts land under ONE `.next` sibling and commit
    * through ONE swap, so a reader can never pair a new part with an
    * old one. Part name "" writes at the snapshot root (the
    * single-table layout). */
  def saveParts(parts: Seq[(String, DataFrame)], path: String,
      lastBatch: Long): Unit = {
    val tmp = path.stripSuffix("/") + ".next"
    Swap.deleteRecursively(new java.io.File(tmp))
    parts.foreach { case (name, df) =>
      df.write.parquet(if (name.isEmpty) tmp else s"$tmp/$name")
    }
    Files.write(metaFile(tmp),
      s"last_batch=$lastBatch\n".getBytes(StandardCharsets.UTF_8))
    val live = Paths.get(path)
    if (Files.exists(live)) Swap.commit(path, tmp)
    else Files.move(Paths.get(tmp), live)
    ()
  }

  /** Read one part of a multi-relation snapshot (name "" = root). */
  def loadPart(spark: SparkSession, path: String, name: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .parquet(if (name.isEmpty) path else s"${path.stripSuffix("/")}/$name")

  /** The batch watermark of a snapshot (−1 for pre-watermark dirs). */
  def lastBatchOf(path: String): Long = {
    val mf = metaFile(path)
    if (Files.exists(mf))
      new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
        .linesIterator
        .collectFirst { case s if s.startsWith("last_batch=") =>
          s.stripPrefix("last_batch=").trim.toLong }
        .getOrElse(-1L)
    else -1L
  }

  /** Read a snapshot back: (relation, last folded batch id). The
    * explicit schema keeps an EMPTY snapshot loadable (an empty
    * relation writes no parquet footer to infer from — the
    * `EmbeddingStore` empty-corpus rationale). */
  def load(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, Long) =
    (loadPart(spark, path, "", schema), lastBatchOf(path))
}
