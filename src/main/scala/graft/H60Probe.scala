package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Localizes the h60 regression found by AbBench mode `h60`: times the
  * two extraction forms in ISOLATION (plain projection over synthetic
  * strings, interleaved) and dumps the physical plans of one affected
  * query under both flags, so "per-row cost" and "plan shape" explain
  * themselves separately. */
object H60Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.PortableHash.h60

    def isoOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .select(h60(concat(lit("shingle token stream "), col("id")))
          .as("h"))
        .agg(max(col("h"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms
    sys.props("graft.h60.legacy") = "false"; isoOnce()
    sys.props("graft.h60.legacy") = "true"; isoOnce()
    val nw = scala.collection.mutable.ArrayBuffer.empty[Double]
    val lg = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 5).foreach { _ =>
      sys.props("graft.h60.legacy") = "false"; nw += isoOnce()
      sys.props("graft.h60.legacy") = "true"; lg += isoOnce()
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000
    println(s"""{"metric":"h60_iso","new_min":${r3(nw.min)},"legacy_min":${r3(lg.min)},"new_runs":[${nw.map(r3).mkString(",")}],"legacy_runs":[${lg.map(r3).mkString(",")}]}""")

    // plan dumps for one affected query, both arms
    val dir = "/root/testdata/sf0.001"
    Seq(("false", "/tmp/h60_plan_new.txt"),
        ("true", "/tmp/h60_plan_legacy.txt")).foreach { case (flag, path) =>
      sys.props("graft.h60.legacy") = flag
      val df = SparkEntry.queries("winnow_pairs")(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
    }
    sys.props("graft.h60.legacy") = "false"
    println("plans dumped")
    spark.stop()
  }
}
