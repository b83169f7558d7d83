package graft

import org.apache.spark.sql.SparkSession

/** Dev-tooling main: the session-timezone contract check. NTZ wall
  * clocks map to instants through the session zone, so a non-UTC session
  * must FAIL FAST at the Tables chokepoint — never run and silently
  * shift every day/window bucket (47 queries measured TZ-sensitive
  * before the guard). Flags any query that still RUNS under a non-UTC
  * session; clean run prints only "AUDIT done". */
object TzAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val n = SparkEntry.queries(q)(spark, dir).collect().length
        println(s"AUDIT $q RAN under non-UTC session ($n rows) — guard missed")
      } catch {
        case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("timeZone") =>
          () // contract enforced
        case e: Throwable =>
          println(s"AUDIT $q unexpected ${e.getClass.getSimpleName}")
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    println("AUDIT done")
  }
}
