package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.MarketStats
import graft.streaming.StreamDaily

class StreamDailySpec extends SparkSpec {
  import spark.implicits._

  test("streaming daily bars: reverse-time waves converge to the batch election; MACD readout ≡ batch; state is calendar-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
    val rows = ev
      .select(col("event_type"), col("ts_ns"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // adversarial arrival: reverse time order — every wave delivers
    // ticks EARLIER than already-folded ones; the day winners must not
    // regress (max-by election is merge-stable)
    val shuffled = rows.sortBy(-_._2)
    val src = MemoryStream[(String, Long, Long, Double)]
    val table = new StreamDaily.DailyTable(spark)
    val q = StreamDaily.start(
      src.toDS().toDF("event_type", "ts_ns", "event_id", "value"), table)
    shuffled.grouped(300).foreach { wave =>
      src.addData(wave: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = table.macd.collect().map(_.toSeq).toSeq
    val batch = MarketStats.macdDaily(ev).collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // state = one winner per (instrument, day) cell — calendar-bounded
    val cells = rows.map(r => (r._1, r._2 / 86400000000000L)).distinct.size
    assert(table.kept.count() == cells)
  }
}
