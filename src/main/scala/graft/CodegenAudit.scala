package graft
import org.apache.spark.sql.SparkSession

/** Dev-tooling main: interpreted-vs-codegen parity. Every custom
  * Catalyst Expression ships BOTH an eval() and a doGenCode(); Spark
  * falls back to the interpreted path under codegen failures/thresholds,
  * so the two must agree bit-for-bit. Runs every query with whole-stage
  * codegen ON and OFF and flags differences. Clean run prints only
  * "AUDIT done". */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        val a = SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        val b = SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
        if (a != b) {
          val d = a.zip(b).find(p => p._1 != p._2)
          println(s"AUDIT $q CODEGEN-DIVERGENT rows=${a.size}/${b.size} first=$d")
        }
      } catch { case e: Throwable =>
        println(s"AUDIT $q ERROR ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(100)) }
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    println("AUDIT done")
  }
}
