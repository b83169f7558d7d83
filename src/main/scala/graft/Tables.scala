package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's
  * FileSourceScanExec gives column pruning + predicate pushdown for free;
  * callers must never `.cache()` here (each query plans its own pruned scan).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default. Read nanos as raw long, then integer-divide
    * to micros (`DIV`, not `/` — nano-epoch values exceed 2^53 so a double
    * roundtrip would corrupt them) and rebuild a proper TimestampType.
    *
    * `ts_ns` is the μs-ALIGNED nano column (`raw DIV 1000 * 1000`): the
    * DuckDB oracle's parquet reader truncates TIMESTAMP(NANOS) to μs, so
    * μs resolution is the portable contract — every ordering, bucket
    * division, gap threshold, and duration sum downstream then agrees
    * with the oracle bit-for-bit instead of relying on sub-μs
    * perturbations staying under each query's output granularity (the
    * corpus DOES carry sub-μs nanos; timestamps are globally unique at μs
    * resolution, so ordering is unaffected — asserted in MarketStatsSpec).
    *
    * `ts_ns_raw` is the untouched scan attribute, kept ONLY as the
    * pushdown target: predicates can't cross the truncation arithmetic,
    * but a range filter on the raw column reaches the parquet scan and
    * prunes row groups (see Trends.trendsOf) — what keeps a time-range
    * query cheap at 100 TB. Query bounds are ms-aligned, so raw and
    * truncated filters admit exactly the same rows.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_ns_raw", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts_ns", org.apache.spark.sql.functions.expr(
        "ts DIV 1000 * 1000"))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts_ns DIV 1000)"))
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
}
