package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.EventsOps

/** HLL register semantics + estimate checked against a scalar reference
  * fold of the identical algorithm (same h60, same ρ, same exact-integer
  * harmonic assembly), plus the error envelope on the real corpus. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def hllScalar(users: Seq[Long]): (Long, Long, Long, Double) = {
    val m = 64
    val regs = new Array[Long](m)
    users.distinct.foreach { u =>
      val h = PortableHash.h60String(u.toString)
      val b = (h % m).toInt
      val rem = h / m
      val rho = if (rem == 0) 55L else 55L - java.lang.Long.toBinaryString(rem).length
      if (rho > regs(b)) regs(b) = rho
    }
    val used = regs.count(_ > 0)
    val maxReg = regs.max
    val sNum = regs.map(r => 1L << (maxReg - r)).sum // empty regs enter as 2^maxM
    val est = 0.709 * m * m * math.pow(2.0, maxReg.toDouble) / sNum.toDouble
    (m.toLong - used, maxReg, sNum,
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def toEvents(users: Seq[Long]) =
    users.zipWithIndex.map { case (u, i) =>
      (i.toLong, i.toLong * 1000000000L, u, "t", 1.0, "{}")
    }.toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")

  test("registers, harmonic numerator, and estimate match the scalar fold") {
    val users = (1L to 300L) ++ (1L to 100L) // dups must not matter
    val r = EventsOps.hllDistinct(toEvents(users)).collect()
    assert(r.length == 1)
    val (vz, mr, sn, est) = hllScalar(users)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == (vz, mr, sn))
    assert(r(0).getDouble(4) == est)
  }

  test("estimate lands inside ~3σ of the m=64 error envelope on testdata") {
    val ev = Tables.events(spark, sf001)
    val est = EventsOps.hllDistinct(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // raw HLL (no small-range correction): σ ≈ 1.04/√64 = 13%; allow 3σ
    exact.foreach { case (t, n) =>
      assert(math.abs(est(t) - n) <= 0.39 * n,
        s"$t: est ${est(t)} vs exact $n")
    }
  }

  // ρ must derive from b (field width 60−b), not the b=6 constants —
  // the regression ADVICE r5 called out: any b≠6 was uniformly off by b−6
  private def hllScalarB(users: Seq[Long], b: Int): (Long, Long, Long, Double) = {
    val m = 1 << b
    val zeroRank = 61 - b
    val regs = new Array[Long](m)
    users.distinct.foreach { u =>
      val h = PortableHash.h60String(u.toString)
      val bkt = (h % m).toInt
      val rem = h / m
      val rho = if (rem == 0) zeroRank.toLong
        else zeroRank.toLong - java.lang.Long.toBinaryString(rem).length
      if (rho > regs(bkt)) regs(bkt) = rho
    }
    val used = regs.count(_ > 0)
    val maxReg = regs.max
    val sNum = regs.map(r => 1L << (maxReg - r)).sum
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val est = alpha * m * m * math.pow(2.0, maxReg.toDouble) / sNum.toDouble
    (m.toLong - used, maxReg, sNum,
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("non-default precisions match the scalar fold (b = 5, 7, 10)") {
    val users = (1L to 500L)
    for (b <- Seq(5, 7, 10)) {
      val regs = EventsOps.hllRegisters(
        toEvents(users).select(col("event_type"),
          graft.functions.PortableHash.h60(col("user_id").cast("string")).as("h")), b)
      val r = EventsOps.hllEstimate(regs, b).collect()
      assert(r.length == 1)
      val (vz, mr, sn, est) = hllScalarB(users, b)
      assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == (vz, mr, sn),
        s"b=$b register state")
      assert(r(0).getDouble(4) == est, s"b=$b estimate")
    }
  }

  test("sketch is a max-merge: union of shards equals the whole") {
    val a = (1L to 200L); val b = (150L to 400L)
    val whole = EventsOps.hllDistinct(toEvents(a ++ b)).collect()(0)
    // shard rows through different event orderings — same registers
    val shuffled = EventsOps.hllDistinct(toEvents(scala.util.Random
      .javaRandomToRandom(new java.util.Random(7)).shuffle((a ++ b).toList)))
      .collect()(0)
    assert(whole.getLong(3) == shuffled.getLong(3) &&
      whole.getDouble(4) == shuffled.getDouble(4))
  }
}
