package graft

import org.apache.spark.sql.functions._

import graft.operators.EventsOps

/** The power-iteration stationary read: exact integer recurrence
  * replicated off-Spark, the symmetric fixed point, and the dominant
  * state winning the mass ratio. */
class MarkovStationarySpec extends SparkSpec {
  import spark.implicits._

  /** One 2-event user per desired transition — counts land exactly. */
  private def chain(transitions: Seq[(String, String)]) = {
    val rows = transitions.zipWithIndex.flatMap { case ((a, b), u) =>
      Seq((u * 2L, u.toLong, a, u * 1000L),
        (u * 2L + 1L, u.toLong, b, u * 1000L + 1L))
    }
    rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"))
  }

  /** The operator's integer recurrence, replicated exactly. */
  private def replay(trans: Map[(String, String), Long],
      iters: Int): Map[String, Long] = {
    val outDeg = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var p = outDeg.keys.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      p = trans.toSeq
        .flatMap { case ((f, t), n) =>
          p.get(f).map(pf => t -> (pf * n / outDeg(f)))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    outDeg.keys.flatMap(s => p.get(s).map(s -> _)).toMap
  }

  test("deterministic 2-cycle is the fixed point: both masses stay 1e6") {
    val got = EventsOps.markovStationary(
      chain(Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "a"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> (5L, 1000000L), "b" -> (5L, 1000000L)))
  }

  test("biased chain: mass settles on the sticky state; equals the exact replica") {
    // A: 3/4 self-loop; B: 1/2 self-loop → stationary πA = 2·πB
    val trans = Map(("a", "a") -> 3L, ("a", "b") -> 1L,
      ("b", "a") -> 2L, ("b", "b") -> 2L)
    val seqs = trans.toSeq.flatMap { case (p, n) => Seq.fill(n.toInt)(p) }
    val got = EventsOps.markovStationary(chain(seqs)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = replay(trans, 8)
    assert(got == want)
    // the asymptotic ratio (within floor-loss of the exact 2:1)
    assert(math.abs(got("a").toDouble / got("b") - 2.0) < 0.1)
  }

  test("states with no observed outgoing edges drop from the chain") {
    // c only ever RECEIVES — it is not a chain state (no row), and its
    // mass sink does not wedge the iteration
    val got = EventsOps.markovStationary(
      chain(Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"))))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "b"))
  }
}
