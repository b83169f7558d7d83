package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.Trade
import graft.operators.Trends

/** SURVEY §5.3 property-based invariants over random trade batches.
  * ScalaCheck generators driven directly with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache); 5 seeded
  * batches per property — each case runs full Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-08-12 00:00:00").getTime
  private val genTrade: Gen[Trade] = for {
    offsetSec <- Gen.choose(0L, 86399L)
    rate <- Gen.choose(0.01, 100.0)
  } yield Trade("u", "EUR", "USD", 1000000L, (rate * 1e6).toLong, rate, "US",
    new Timestamp(baseMs + offsetSec * 1000L))

  private def batches: Seq[List[Trade]] =
    (1 to 5).map(i => Gen.listOfN(60, genTrade)
      .apply(Gen.Parameters.default, Seed(42L + i)).get)

  private val from = Timestamp.valueOf("2024-08-12 06:00:00")
  private val to = Timestamp.valueOf("2024-08-12 18:00:00")

  test("trends invariants: ordering bounds, window alignment, count conservation") {
    batches.foreach { batch =>
      val df = batch.toDF()
      val stats = Trends.trends(df, from, to, "EUR", "USD").collect()
      stats.foreach { s =>
        assert(s.min <= s.median && s.median <= s.max)
        assert(s.min <= s.mean && s.mean <= s.max)
        assert(s.window.getTime % 600000L == 0L) // 600s-aligned window start
        assert(!s.window.after(to))
      }
      assert(stats.map(_.window.getTime).toSeq ==
        stats.map(_.window.getTime).sorted.toSeq)
      // union of windows covers exactly the filtered rows
      val expected = batch.count(t =>
        !t.time_placed.before(from) && !t.time_placed.after(to))
      val counts = Trends.trendsOf(df, "time_placed", "currency_from",
        "EUR", "rate", from.toString, to.toString)
        .agg(org.apache.spark.sql.functions.sum("n")).collect()(0)
      assert((if (counts.isNullAt(0)) 0L else counts.getLong(0)) == expected)
    }
  }

  test("duplicate injection doubles counts, preserves min/max/median (ST2)") {
    batches.take(3).foreach { batch =>
      val once = Trends.trendsOf(batch.toDF(), "time_placed", "currency_from",
        "EUR", "rate", from.toString, to.toString).collect()
      val twice = Trends.trendsOf((batch ++ batch).toDF(), "time_placed",
        "currency_from", "EUR", "rate", from.toString, to.toString).collect()
      assert(once.length == twice.length)
      once.zip(twice).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0))     // same windows
        assert(b.getLong(5) == 2 * a.getLong(5)) // n doubles
        assert(a.getDouble(1) == b.getDouble(1)) // min unchanged
        assert(a.getDouble(2) == b.getDouble(2)) // max unchanged
        assert(a.getDouble(4) == b.getDouble(4)) // median unchanged
      }
    }
  }

  test("micros truncation is toward zero for any double (T3)") {
    val amounts = (1 to 200).map(i =>
      Gen.choose(-9e12, 9e12).apply(Gen.Parameters.default, Seed(i.toLong)).get)
    val got = amounts.map(Tuple1(_)).toDF("a")
      .select(graft.ingest.TradeIngest.toMicros(
        org.apache.spark.sql.functions.col("a")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == amounts.map(a => (a * 1e6).toLong)) // Go int64(x*1e6)
  }
}
