package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one warmup pass at sf0.001 first (JIT/codegen warm — the
  * plans are identical, only the data volume differs), then each query is
  * timed THREE times on the target scale factor with a full materialization
  * through the noop sink (all columns computed, no collect/driver funnel,
  * no sink cost) and the minimum reported — first-execution JIT of a heavy
  * generated class can add ~10s of noise that would poison cross-round
  * comparisons. The per-run times are ALL emitted (`runs` map) so a
  * contaminated measurement — e.g. a concurrent sbt/test run competing for
  * cores, which has produced 19× outliers on shuffle-heavy queries — is
  * self-evident in the artifact: a clean run has tight per-run spreads,
  * contention shows as one inflated sample.
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
      // and no storage pressure accumulates across the run
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n => // warmup: JIT + codegen cache, tiny data
      try materialize(n, warmDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }
    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try materialize(name, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v.min) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = r3(results.map(_._2.min).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
