package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming exact deduplication — the streaming member of the dedup
 * family (batch members live in operators.Dedup). Keyed by a content
 * digest (the reference's rows carry no unique id, SURVEY §2.4 ST2, so
 * identity IS the content), with state bounded by the event-time
 * watermark: `dropDuplicatesWithinWatermark` keeps a digest in state only
 * until the watermark passes its event time, so state size tracks the
 * duplicate-arrival horizon, not the stream's history — the property that
 * makes streaming dedup viable at 100 TB/day.
 *
 * Deliberately opt-in: the reference double-counts duplicates and the
 * default pipeline preserves that (documented); this operator is for
 * deployments that want the stronger guarantee.
 */
object StreamDedup {

  /** All-column content digest (stable order). Hashes the JSON encoding of
    * the full row struct — unambiguous, unlike delimiter concatenation:
    * concat_ws silently SKIPS nulls (null vs "" collide) and a delimiter
    * can appear inside a value; JSON keeps field boundaries and
    * distinguishes null (key omitted) from every real value. */
  def contentHash(df: DataFrame): DataFrame =
    df.withColumn("content_hash",
      md5(to_json(struct(df.columns.sorted.map(col).toIndexedSeq: _*))))

  def dedup(trades: DataFrame, eventTimeCol: String = "time_placed",
      watermark: String = "1 hour"): DataFrame =
    contentHash(trades)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")
}
