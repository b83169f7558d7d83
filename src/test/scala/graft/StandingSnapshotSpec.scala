package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{StreamCms, StreamDpCounts, StreamDrift,
  StreamKmv, StreamManifest}

/** The shared StandingTable contract (snapshot/resume + per-batchId
  * fold idempotence) across ALL driver-held standing tables:
  *
  *  - Structured Streaming replays the last uncommitted batch after a
  *    crash; a fold carrying that batchId must be a no-op when the
  *    snapshot was saved AFTER the batch already folded — the
  *    double-count ADVICE r12 flagged on StreamBoilerplate, fixed for
  *    every table at the base class;
  *  - the fold watermark rides INSIDE the swap-committed snapshot, so
  *    relation and position restore atomically;
  *  - pre-watermark snapshots (no `_graft_meta` sidecar) load as
  *    position −1: never skip a fold — the old behavior, unchanged.
  */
class StandingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = java.nio.file.Files
    .createTempDirectory(prefix).resolve("state").toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("dp cells: crash-replayed batch folds once after resume") {
    val b0 = Seq((1L, "t", "en", "s1"), (2L, "t", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val b1 = Seq((3L, "t", "de", "s1"), (4L, "t", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val b2 = Seq((5L, "t", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")

    val a = new StreamDpCounts.CellTable(spark)
    a.fold(b0, 0L); a.fold(b1, 1L)
    val snap = tmp("dp_snap")
    a.save(snap) // snapshot taken AFTER batch 1 folded, BEFORE commit

    val resumed = new StreamDpCounts.CellTable(spark)
    resumed.load(snap)
    assert(resumed.lastFolded == 1L, "watermark must ride the snapshot")
    resumed.fold(b1, 1L) // the streaming replay of the uncommitted batch
    resumed.fold(b2, 2L)

    val uninterrupted = new StreamDpCounts.CellTable(spark)
    uninterrupted.fold(b0, 0L); uninterrupted.fold(b1, 1L)
    uninterrupted.fold(b2, 2L)
    assert(rows(resumed.cells) == rows(uninterrupted.cells),
      "replayed batch must not double-count after resume")
    assert(rows(resumed.release()) == rows(uninterrupted.release()))
  }

  test("fold watermark is monotone; positionless folds always apply") {
    val b = Seq((1L, "t", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val t = new StreamDpCounts.CellTable(spark)
    t.fold(b, 5L)
    t.fold(b, 3L) // late/duplicate position: skipped
    t.fold(b, 5L) // exact replay: skipped
    assert(t.cells.agg(sum(col("n"))).collect()(0).getLong(0) == 1L)
    t.fold(b) // ad-hoc fold: applies, watermark untouched
    assert(t.cells.agg(sum(col("n"))).collect()(0).getLong(0) == 2L)
    assert(t.lastFolded == 5L)
  }

  test("cms/kmv/manifest/drift: save→load→fold ≡ uninterrupted") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (w0, w1) = docs.splitAt(30)

    // CMS
    val cmsA = new StreamCms.SketchTable(spark)
    cmsA.fold(w0.toDF("doc_id", "text"), 0L)
    val cmsSnap = tmp("cms_snap"); cmsA.save(cmsSnap)
    val cmsB = new StreamCms.SketchTable(spark)
    cmsB.load(cmsSnap); cmsB.fold(w0.toDF("doc_id", "text"), 0L)
    cmsB.fold(w1.toDF("doc_id", "text"), 1L)
    val cmsU = new StreamCms.SketchTable(spark)
    cmsU.fold(w0.toDF("doc_id", "text"), 0L)
    cmsU.fold(w1.toDF("doc_id", "text"), 1L)
    assert(rows(cmsB.cells) == rows(cmsU.cells))

    // KMV
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).limit(200).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val (e0, e1) = ev.splitAt(100)
    val kmvA = new StreamKmv.KmvTable(spark, k = 16)
    kmvA.fold(e0.toDF("event_type", "user_id"), 0L)
    val kmvSnap = tmp("kmv_snap"); kmvA.save(kmvSnap)
    val kmvB = new StreamKmv.KmvTable(spark, k = 16)
    kmvB.load(kmvSnap); kmvB.fold(e0.toDF("event_type", "user_id"), 0L)
    kmvB.fold(e1.toDF("event_type", "user_id"), 1L)
    val kmvU = new StreamKmv.KmvTable(spark, k = 16)
    kmvU.fold(e0.toDF("event_type", "user_id"), 0L)
    kmvU.fold(e1.toDF("event_type", "user_id"), 1L)
    assert(rows(kmvB.hashes) == rows(kmvU.hashes))
    assert(rows(kmvB.estimate) == rows(kmvU.estimate))

    // Manifest (XOR fingerprint: replay-sensitive — exactly why the
    // watermark matters for this table)
    val docDf = Tables.documents(spark, sf0001).limit(60)
    val d0 = docDf.filter(col("doc_id") % 2 === 0)
    val d1 = docDf.filter(col("doc_id") % 2 === 1)
    val manA = new StreamManifest.ManifestTable(spark, nShards = 4)
    manA.fold(d0, 0L)
    val manSnap = tmp("man_snap"); manA.save(manSnap)
    val manB = new StreamManifest.ManifestTable(spark, nShards = 4)
    manB.load(manSnap); manB.fold(d0, 0L); manB.fold(d1, 1L)
    val manU = new StreamManifest.ManifestTable(spark, nShards = 4)
    manU.fold(d0, 0L); manU.fold(d1, 1L)
    assert(rows(manB.manifest) == rows(manU.manifest),
      "a replayed fold would cancel XOR fingerprints — must be skipped")

    // Drift
    val evDf = Tables.events(spark, sf0001)
    val ref = StreamDrift.histogram(evDf.limit(100))
    val l0 = evDf.limit(300).filter(col("event_id") % 2 === 0)
    val l1 = evDf.limit(300).filter(col("event_id") % 2 === 1)
    val drA = new StreamDrift.DriftTable(spark, ref)
    drA.fold(l0, 0L)
    val drSnap = tmp("dr_snap"); drA.save(drSnap)
    val drB = new StreamDrift.DriftTable(spark, ref)
    drB.load(drSnap); drB.fold(l0, 0L); drB.fold(l1, 1L)
    val drU = new StreamDrift.DriftTable(spark, ref)
    drU.fold(l0, 0L); drU.fold(l1, 1L)
    assert(rows(drB.liveHistogram) == rows(drU.liveHistogram))
    assert(rows(drB.stat) == rows(drU.stat))
    assert(rows(drB.psiStat) == rows(drU.psiStat))
  }

  test("migrated tables: hll/survival/groups resume + replay-guard") {
    import graft.streaming.{StreamGroups, StreamHll, StreamSurvival}
    // HLL (max-merge) and spans (min/max) absorb replays anyway; the
    // guard must still hold the watermark through save/load
    val ev = Tables.events(spark, sf0001).limit(300)
    val e0 = ev.filter(col("event_id") % 2 === 0)
    val e1 = ev.filter(col("event_id") % 2 === 1)
    val hllA = new StreamHll.HllTable(spark)
    hllA.fold(e0, 0L)
    val hSnap = tmp("hll_snap"); hllA.save(hSnap)
    val hllB = new StreamHll.HllTable(spark)
    hllB.load(hSnap)
    assert(hllB.lastFolded == 0L)
    hllB.fold(e0, 0L); hllB.fold(e1, 1L)
    val hllU = new StreamHll.HllTable(spark)
    hllU.fold(e0, 0L); hllU.fold(e1, 1L)
    assert(rows(hllB.estimate) == rows(hllU.estimate))

    val svA = new StreamSurvival.SpanTable(spark)
    svA.fold(e0, 0L)
    val sSnap = tmp("sv_snap"); svA.save(sSnap)
    val svB = new StreamSurvival.SpanTable(spark)
    svB.load(sSnap); svB.fold(e0, 0L); svB.fold(e1, 1L)
    val svU = new StreamSurvival.SpanTable(spark)
    svU.fold(e0, 0L); svU.fold(e1, 1L)
    assert(rows(svB.spans) == rows(svU.spans))

    // groups: the ITERATIVE min-label merge — a replayed pair batch is
    // not idempotent damage-free in general, so the guard has teeth
    val p0 = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val p1 = Seq((2L, 3L)).toDF("id_a", "id_b")
    val gA = new StreamGroups.GroupTable(spark)
    gA.fold(p0, 0L)
    val gSnap = tmp("grp_snap"); gA.save(gSnap)
    val gB = new StreamGroups.GroupTable(spark)
    gB.load(gSnap); gB.fold(p0, 0L); gB.fold(p1, 1L)
    val gU = new StreamGroups.GroupTable(spark)
    gU.fold(p0, 0L); gU.fold(p1, 1L)
    assert(rows(gB.groups) == rows(gU.groups))
    assert(gB.groups.collect().map(_.getLong(1)).toSet == Set(1L),
      "1-2-3-4 must merge to rep 1 after the bridging pair")
  }

  test("pre-watermark snapshot (no sidecar) loads as position -1") {
    val b = Seq((1L, "t", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val t = new StreamDpCounts.CellTable(spark)
    t.fold(b, 7L)
    val snap = tmp("legacy_snap")
    t.save(snap)
    // simulate an r12-era snapshot: delete the watermark sidecar
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(snap, "_graft_meta"))
    val u = new StreamDpCounts.CellTable(spark)
    u.load(snap)
    assert(u.lastFolded == -1L)
    u.fold(b, 0L) // must apply — legacy snapshots never skip folds
    assert(u.cells.agg(sum(col("n"))).collect()(0).getLong(0) == 2L)
  }

  test("empty-state snapshot round-trips (explicit-schema read)") {
    val t = new StreamCms.SketchTable(spark)
    val snap = tmp("empty_snap")
    t.save(snap)
    val u = new StreamCms.SketchTable(spark)
    u.load(snap)
    assert(u.cells.count() == 0L && u.lastFolded == -1L)
  }
}
