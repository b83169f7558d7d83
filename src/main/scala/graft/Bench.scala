package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one warmup pass at sf0.001 first (JIT/codegen warm — the
  * plans are identical, only the data volume differs), then THREE full
  * INTERLEAVED passes over all queries on the target scale factor with a
  * full materialization through the noop sink (all columns computed, no
  * collect/driver funnel, no sink cost) and the per-query minimum across
  * passes reported — first-execution JIT of a heavy generated class can
  * add ~10s of noise that would poison cross-round comparisons. The
  * three samples per query are scheduled as TWO back-to-back runs
  * followed by one final full interleaved pass (every query once more):
  * the back-to-back pair keeps the whole-stage-codegen cache warm
  * (Spark's generated-class cache is LRU-bounded well below our query
  * count, so a fully interleaved schedule would recompile every class
  * per sample and inflate every min), while the separated third sample
  * defends against a transient contamination window — a concurrent
  * process competing for cores for ~15s lands on the back-to-back pair
  * of ONE query but on a DIFFERENT query in the final pass, so the
  * per-query min absorbs it. With three back-to-back samples the same
  * window poisons all of them and the min is defenseless (observed: a
  * driver capture showing runs [4.7, 6.0, 5.1] on a query whose clean
  * time is 0.4s). The per-run times are ALL emitted (`runs` map) so any
  * remaining contamination is self-evident in the artifact: a clean run
  * has tight per-run spreads, contention shows as inflated samples.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // iterative queries (k-means, connected components) leave
      // localCheckpoint blocks behind; drop them so queries are hermetic
      // and no storage pressure accumulates across the run — EXCEPT the
      // cross-query memos SparkEntry pins (truncated lineage: sweeping
      // them would strand later readers, see SparkEntry.pinnedRddIds)
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!SparkEntry.pinnedRddIds.contains(id))
            rdd.unpersist(blocking = false)
        }
    }

    // optional args = subset of query names (targeted iteration)
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (args.isEmpty) all else all.filter(args.toSet)
    }
    names.foreach { n => // warmup: JIT + codegen cache, tiny data
      try materialize(n, warmDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try materialize(name, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Host-speed calibration: a fixed pure-CPU probe (xxhash64 fold over
    // spark.range across all cores — data-independent, plan-trivial, no
    // IO) timed min-of-3 AROUND the query passes. Cross-round totals can
    // only be compared after normalizing by this: the sandbox shares a
    // physical host, and sustained sibling contention has been observed
    // to inflate EVERY query ~1.5× (identical code and data, tight
    // per-run spreads — e.g. trade_ingest 0.55 s vs 0.83 s between two
    // same-day runs). calib_sec makes that factor measured, not argued.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions.{col, max, xxhash64}
      val t0 = System.nanoTime()
      spark.range(1000000000L).select(xxhash64(col("id")).as("h"))
        .agg(max(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // IO-side calibration: a full uncached-schema scan-fold of the
    // largest table, timed like calib_sec. The CPU probe cannot see
    // page-cache state or IO-bandwidth contention, and those have been
    // observed to move EVERY scan-bound query ~+0.4 s uniformly between
    // same-code runs (141.6 s vs 123.4 s totals with the CPU calib
    // BETTER on the slower run). io_calib_sec makes that axis measured
    // too, so cross-round totals normalize on (cpu, io) instead of
    // arguing from one probe.
    def ioCalibrate(): Double = {
      import org.apache.spark.sql.functions.{col, max, xxhash64}
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(xxhash64(col("l_orderkey"), col("l_extendedprice"),
          col("l_shipdate")).as("h"))
        .agg(max(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibPre = calibrate()
    val ioCalibPre = ioCalibrate()
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    names.foreach { n => samples(n) = Vector(timed(n), timed(n)) }
    names.foreach { n => samples(n) = samples(n) :+ timed(n) }
    val calib = math.min(calibPre, math.min(calibrate(), calibrate()))
    val ioCalib = math.min(ioCalibPre, math.min(ioCalibrate(), ioCalibrate()))
    // Normalized physical-plan fingerprint per query (computed AFTER the
    // timing passes; mostly plan build only, though queries whose
    // construction eagerly checkpoints or collects a prefix do run
    // those jobs again here — timings are unaffected, the passes are
    // over): a lost broadcast, a new shuffle or a codegen fallback
    // shows up as a plan_sha diff against the previous round's
    // bench_full.json instead of needing a close manual read. The
    // fingerprint hashes plan STRUCTURE (plans.PlanFingerprint: the
    // node/keyword skeleton per line, bracket and paren argument lists,
    // ids, digits, lambda identities stripped) because driver-computed
    // literals are not byte-stable across processes, while the
    // regressions this exists to catch are operator-level: join
    // strategy, exchange kind, added/removed nodes. Since round 12 the
    // fingerprint also folds in the PRE-checkpoint plans recorded by
    // plans.PlanTrace during construction — a localCheckpoint prints as
    // a bare LogicalRDD, so without the trace two queries materializing
    // DIFFERENT prefixes (rnn_pairs's bounded LSH retriever vs
    // rnn_pairs_exact's corpus² brute) fingerprinted identically and
    // the tripwire was blind exactly where it mattered.
    def planSha(name: String): String =
      try {
        graft.plans.PlanTrace.reset()
        graft.plans.PlanTrace.recording = true
        val main = try {
          graft.plans.PlanFingerprint.structSha(
            SparkEntry.queries(name)(spark, sfDir))
        } finally graft.plans.PlanTrace.recording = false
        val prefixes = graft.plans.PlanTrace.snapshot()
        if (prefixes.isEmpty) main
        else graft.plans.PlanFingerprint.sha6(
          (main +: prefixes).mkString("|"))
      } catch { case e: Throwable => "err" }
    val planShas = names.map(n => n -> planSha(n))
    // the fingerprint pass re-ran eager-checkpoint prefixes; release
    // their (non-pinned) blocks before exiting, as the timed passes do
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!SparkEntry.pinnedRddIds.contains(id))
        rdd.unpersist(blocking = false)
    }
    val results = names.map(n => n -> samples(n))
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def r2(v: Double) = math.rint(v * 100) / 100
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v.min) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val shas = planShas.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2.min).sum)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","calib_sec":${r3(calib)},"io_calib_sec":${r3(ioCalib)},"queries":$qs,"runs":$runs,"plan_sha":$shas,"sf":"$sfDir"}"""
    // Full detail (per-query min + all three per-run samples, so a
    // contaminated measurement is self-evident) goes to an EARLIER stdout
    // line and a file: the harness that records the benchmark keeps only
    // the last ~2000 characters of output, and with 90+ queries the full
    // map cannot fit there alongside sbt's trailing "[success]" line.
    println(full)
    // targeted (subset) iterations must not clobber the committed
    // full-board record
    val detailFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.isEmpty) "bench_full.json" else "bench_subset.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(detailFile),
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    // FINAL line — compact so the whole line survives a 2000-char tail:
    // total + query count + the slowest queries (2dp) that fit a fixed
    // character budget. The slowest queries are the ones any perf audit
    // needs; the full map is on the line above and in bench_full.json.
    // 1200 chars + ~200 of fixed JSON + sbt's trailing "[success]" line
    // stays well inside the harness's 2000-char tail even as nq grows
    val budget = 1200
    val slowest = results.sortBy(-_._2.min)
    val sb = new StringBuilder
    var taken = 0
    slowest.foreach { case (k, v) =>
      val frag = (if (taken == 0) "" else ",") + "\"" + k + "\":" + r2(v.min)
      if (sb.length + frag.length <= budget) { sb.append(frag); taken += 1 }
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","nq":${results.size},"calib_sec":${r3(calib)},"io_calib_sec":${r3(ioCalib)},"queries":{${sb.toString}},"detail":"$detailFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
