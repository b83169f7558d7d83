package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text entry point — surface parity with the reference, whose query
  * interface IS parameterized SQL text dispatched to the engine
  * (`trends/listing/service.go:42-63` sends ClickHouse SQL; SURVEY §3.1
  * step 3). Here the dispatch target is Catalyst: `register` publishes
  * the store as temp views, `run` hands SQL text to `spark.sql`, and the
  * text gets the same optimizer treatment as the DataFrame plans
  * (pushdown, pruning, AQE) — SQL and DataFrame are one plan space.
  *
  * The `*_sql` driver queries make the parity check sharp: they execute
  * the ORACLE's own SQL string through Spark, so ONE piece of SQL runs on
  * both engines and must hash-match — dialect-level compatibility proven
  * per query, not claimed. (Only queries written in the common
  * Spark∩DuckDB dialect can do this; engine-specific functions like
  * `epoch_us` stay on the oracle side.) */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Publish every store table (plus normalized `events`) as temp views. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    tableNames.foreach { n =>
      Tables.table(spark, sfDir, n).createOrReplaceTempView(n)
    }
    // events goes through the nanos-normalizing loader, so SQL sees the
    // same `ts` TimestampType the DataFrame operators do
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(sql)
  }
}
