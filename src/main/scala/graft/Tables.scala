package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's
  * FileSourceScanExec gives column pruning + predicate pushdown for free;
  * callers must never `.cache()` here (each query plans its own pruned scan).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The engine's time contract: NTZ wall clocks in the testdata map to
    // instants through the SESSION zone, and every oracle (DuckDB
    // epoch_* on the same values) assumes that zone is UTC. A non-UTC
    // session would silently shift every day/window bucket (47 queries
    // measured TZ-sensitive) — fail fast at the single chokepoint
    // instead. Entry points (Bench, Verify, SparkSpec) all pin UTC.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"graft requires spark.sql.session.timeZone=UTC (got $tz): " +
        "NTZ wall clocks are interpreted as UTC instants engine-wide")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.parquet` has shipped `ts` under two physical layouts across
    * driver testdata generations — parquet TIMESTAMP(NANOS) (rounds ≤5)
    * and TIMESTAMP(MICROS) (round 6 regen) — so the loader detects the
    * scan type and normalizes BOTH to one downstream contract:
    *
    * `ts_ns` is the μs-ALIGNED nano column (BIGINT): the DuckDB oracle's
    * parquet reader truncates TIMESTAMP(NANOS) to μs (and μs storage has
    * no sub-μs to begin with), so μs resolution is the portable contract —
    * every ordering, bucket division, gap threshold, and duration sum
    * downstream then agrees with the oracle bit-for-bit. Under the nanos
    * layout this is `raw DIV 1000 * 1000` (integer `DIV`, not `/` —
    * nano-epoch values exceed 2^53 so a double roundtrip would corrupt
    * them); under the micros layout it's `unix_micros(ts) * 1000` —
    * identical values by construction.
    *
    * `ts` is a proper TimestampType at μs resolution in both layouts.
    *
    * `ts_ns_raw` (nanos layout only) is the untouched scan attribute,
    * kept ONLY as the pushdown target: predicates can't cross the
    * truncation arithmetic, but a range filter on the raw column reaches
    * the parquet scan and prunes row groups (see Trends.trendsOf) — what
    * keeps a time-range query cheap at 100 TB. Under the micros layout
    * `ts` itself is the untouched scan attribute, so the tsCol range
    * filter pushes down natively and no raw alias is needed.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw
          .withColumn("ts_ns_raw", col("ts"))
          .withColumn("ts_ns", expr("ts DIV 1000 * 1000"))
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      case _ =>
        // TIMESTAMP(MICROS), NTZ (naive writer). Session tz is UTC in
        // every entry point, so the NTZ→TIMESTAMP cast is the identity
        // instant mapping DuckDB applies — and Spark still pushes range
        // predicates on the cast column down to the parquet scan
        // (verified: PushedFilters carries the ts bounds), so the raw
        // alias the nanos path needs is unnecessary here.
        raw
          .withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
  /** Spread a small-file scan across the cluster before CPU-heavy per-row
    * stages (shingling, scoring, vector math): a file smaller than one
    * split yields a single scan partition, serializing everything until
    * the first exchange. At real scale files exceed the split size and
    * this is a no-op; locally the tiny shuffle buys full parallelism.
    */
  private def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, table(s, d, "embeddings"))

  /** Deterministic synthetic `url` column over the documents table —
    * the URL/host curation family's input. The reference schema
    * carries no URL (`db/clickhouse/init.sql:3-15` is trades), so the
    * column is SEEDED from (doc_id, source) arithmetic, built
    * identically in both engines (the encoding_audit / boilerplate
    * seeding convention): mixed-case schemes and hosts, a default
    * `:443` port, tracking and real query params in fixed order,
    * fragments and trailing slashes — every mess `UrlCuration.canonUrl`
    * must normalize, each on its own doc_id modulus so the oracles pin
    * nonzero behavior for every rule. */
  def withUrl(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = col("doc_id")
    val scheme = when(d % 11 === 0, lit("HTTPS")).otherwise(lit("https"))
    val sub = when(d % 3 === 0, lit("WWW."))
      .when(d % 3 === 1, lit("www.")).otherwise(lit(""))
    val dom = when(d % 2 === 0, upper(col("source"))).otherwise(col("source"))
    val tld = when(d % 4 === 0, lit("com")).when(d % 4 === 1, lit("org"))
      .when(d % 4 === 2, lit("net")).otherwise(lit("io"))
    val port = when(d % 13 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/P"), (d % 7).cast("string"),
      lit("/doc-"), d.cast("string"),
      when(d % 9 === 0, lit("/")).otherwise(lit("")))
    val params = array(
      when(d % 2 === 0, lit("utm_source=feed")),
      when(d % 4 < 2, concat(lit("id="), (d % 50).cast("string"))),
      when(d % 5 === 0, concat(lit("gclid=g"), (d % 9).cast("string"))))
    val q = array_join(filter(params, p => p.isNotNull), "&")
    val query = when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))
    val frag = when(d % 7 === 0, concat(lit("#s"), (d % 4).cast("string")))
      .otherwise(lit(""))
    docs.withColumn("url", concat(scheme, lit("://"), sub, dom,
      lit(".example."), tld, port, path, query, frag))
  }
}
