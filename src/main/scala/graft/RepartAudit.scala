package graft
import org.apache.spark.sql.SparkSession

/** Dev-tooling main (the Verify/Bench tier): runs EVERY registered query
  * twice under different shuffle-partition counts and flags any result
  * difference — the cheap detector for combine-order-dependent float
  * aggregation (the determinism-ladder violation class that
  * customer_value_deciles' raw double spend sum slipped through before
  * the dec() fix). Clean run prints only "AUDIT done". */
object RepartAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val skip = Set("_aux")
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { q =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val a = SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
        if (a != b) {
          val firstDiff = a.zip(b).find(p => p._1 != p._2)
          println(s"AUDIT $q UNSTABLE rows=${a.size}/${b.size} diff=$firstDiff")
        }
      } catch { case e: Throwable =>
        println(s"AUDIT $q ERROR ${e.getClass.getSimpleName}") }
    }
    println("AUDIT done")
  }
}
