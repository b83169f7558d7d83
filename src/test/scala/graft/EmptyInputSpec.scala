package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Zero-row robustness: every registered query must plan and return an
  * EMPTY result on empty inputs — never throw (an ANSI divide, a
  * first()/head on nothing, a collect-based centroid seed). A fresh
  * deployment, a fully-filtered partition, and a quiet stream replay all
  * present exactly this input. */
class EmptyInputSpec extends SparkSpec {

  /** Empty frames with the real testdata schemas, served from a temp dir
    * so `SparkEntry.queries` runs unmodified against it. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val src = sf0001
    // events.parquet is TIMESTAMP(NANOS) — readable only via this legacy
    // switch (Tables.events sets it; the schema copy needs it too)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("events", "lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "documents", "embeddings").foreach { t =>
      val schema = spark.read.parquet(s"$src/$t.parquet").schema
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on empty tables; outputs match SQL semantics") {
    // Non-empty on empty input is CORRECT for three shapes: ungrouped
    // aggregates (one summary row per the SQL standard), the profiler
    // (one zero-count row per schema column), and the calendar-spine
    // gap fills (the spine is data-independent by design). Everything
    // else must be empty, and NOTHING may throw.
    val oneRowAggregates = Set("funnel_steps", "funnel_window",
      "q6_forecast", "q6_forecast_sql", "q14_promo_share",
      "q17_small_quantity", "q19_disjunctive", "conversion_rate_1h",
      "blocking_quality", "join_size_audit", "skew_audit",
      "user_gini", "source_gini", "host_gini", "ingest_novelty_kmv")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, emptyDir).count()
          val expect: Long => Boolean = name match {
            case _ if oneRowAggregates(name) => _ == 1L
            case "fk_orphans" => _ == 7L // one summary row per FK edge
            case "fk_orphans_curated" => _ == 7L // one row per FK edge
            case "key_uniqueness" => _ == 7L // one row per candidate key
            // the rung spine: per-rung ungrouped aggregates (metrics
            // NULL on an empty corpus — no query vectors to sweep)
            case "ivf_probe_sweep" => _ == 4L
            case "filter_attribution" => _ == 4L // one row per gate
            case "reshard_plan" => _ == 2L // one summary row per scheme
            case "markov_attribution" => _ == 4L // one row per channel
            case "session_gap_sweep" => _ == 5L // the ladder spine
            case "profile_lineitem" => _ == 11L // one row per column
            case "profile_lineitem_approx" => _ == 11L // one row per column
            case "profile_documents" => _ == 5L // one row per column
            case "profile_events" => _ == 6L // one row per column
            case "trends_gapfill" | "trends_gapfill_locf" => _ > 0L // spine
            case _ => _ == 0L
          }
          if (expect(n)) None else Some(s"$name returned $n rows")
        } catch {
          case e: Throwable => Some(s"$name threw ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
