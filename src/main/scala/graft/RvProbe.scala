package graft
import org.apache.spark.sql.SparkSession
object RvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val n = SparkEntry.queries("range_volatility")(spark, "/root/testdata/sf0.1").collect().length
      println(s"PROBE ok rows=$n")
    } catch { case e: Throwable =>
      println("PROBE FAIL " + e.getMessage.take(200))
      e.getStackTrace.take(12).foreach(f => println("  " + f))
      var c = e.getCause
      while (c != null) { println("CAUSE " + c.getMessage.take(150)); c = c.getCause }
    }
  }
}
