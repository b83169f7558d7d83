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

  test("wire-JSON parser agrees with from_json on arbitrary to_json output") {
    import org.apache.spark.sql.functions._
    // random trades incl. escapes, unicode, empties, extreme numbers —
    // serialized by Spark's own to_json, so well-formed by construction
    val genStr = Gen.frequency(
      3 -> Gen.alphaNumStr.map(_.take(12)),
      1 -> Gen.const(""),
      1 -> Gen.const("""quote" back\slash / tab	end"""),
      1 -> Gen.const("héllo wörld λ ≠ 😀"),
      1 -> Gen.const("nl\nand\rcr"))
    val genNum = Gen.frequency(
      4 -> Gen.choose(-1e9, 1e9),
      1 -> Gen.const(0.0),
      1 -> Gen.const(1.5e300),
      1 -> Gen.const(-2.5e-308))
    val rows = (1 to 120).map { i =>
      val p = Gen.Parameters.default
      (genStr(p, Seed(i)).get, genStr(p, Seed(1000 + i)).get,
        genStr(p, Seed(2000 + i)).get, genNum(p, Seed(3000 + i)).get,
        genNum(p, Seed(4000 + i)).get, genNum(p, Seed(5000 + i)).get,
        genStr(p, Seed(6000 + i)).get, genStr(p, Seed(7000 + i)).get)
    }
    val json = rows.toDF("userId", "currencyFrom", "currencyTo",
      "amountSell", "amountBuy", "rate", "timePlaced", "originatingCountry")
      .select(to_json(struct(col("userId"), col("currencyFrom"),
        col("currencyTo"), col("amountSell"), col("amountBuy"), col("rate"),
        col("timePlaced"), col("originatingCountry"))).as("json"))
    val cmp = json.select(
      graft.functions.TradeWireJson.parse_trade_wire(col("json")).as("fast"),
      from_json(col("json"), model.wireSchema).as("ref"))
    assert(cmp.filter(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("proto3 round-trip is identity for arbitrary field values (S4)") {
    import org.apache.spark.sql.functions._
    import graft.functions.ProtoTrade.{proto_decode_trade, proto_encode_trade}
    val genStr = Gen.frequency(
      3 -> Gen.alphaNumStr.map(_.take(12)),
      1 -> Gen.const(""), // proto3 default: omitted on the wire
      1 -> Gen.const("ünïcode 😀"))
    val genLong = Gen.frequency(
      3 -> Gen.choose(Long.MinValue, Long.MaxValue),
      1 -> Gen.const(0L), // omitted on the wire
      1 -> Gen.oneOf(Long.MinValue, Long.MaxValue, -1L, 127L, 128L, 300L))
    val rows = (1 to 150).map { i =>
      val p = Gen.Parameters.default
      (genStr(p, Seed(i)).get, genStr(p, Seed(1000 + i)).get,
        genStr(p, Seed(2000 + i)).get, genLong(p, Seed(3000 + i)).get,
        genLong(p, Seed(4000 + i)).get, genLong(p, Seed(5000 + i)).get,
        genStr(p, Seed(6000 + i)).get)
    }
    val df = rows.toDF("u", "cf", "ct", "sell", "buy", "tp", "oc")
    val back = df
      .select(col("u"), col("cf"), col("ct"), col("sell"), col("buy"),
        col("tp"), col("oc"),
        proto_decode_trade(proto_encode_trade(col("u"), col("cf"), col("ct"),
          col("sell"), col("buy"), col("tp"), col("oc"))).as("tr"))
    val mismatches = back.filter(
      not(col("tr.user_id") <=> col("u")) ||
      not(col("tr.currency_from") <=> col("cf")) ||
      not(col("tr.currency_to") <=> col("ct")) ||
      col("tr.amount_sell_micros") =!= col("sell") ||
      col("tr.amount_buy_micros") =!= col("buy") ||
      col("tr.time_placed_ms") =!= col("tp") ||
      not(col("tr.originating_country") <=> col("oc"))).count()
    assert(mismatches == 0)
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

  test("bloom filter: every inserted hash tests positive; fresh hashes mostly negative") {
    import graft.functions.BloomBits
    val k = 4
    val inserted = (1 to 500).map(i =>
      Gen.choose(0L, (1L << 60) - 1).apply(Gen.Parameters.default,
        Seed(1000L + i)).get)
    val bits = BloomBits.build(inserted.map(Tuple1(_)).toDF("h"), 1 << 16, k)
    val params = BloomBits.flatParams(k)
    // no false negatives, by construction
    inserted.foreach(h => assert(BloomBits.test(bits, params, h, k)))
    // false-positive rate near theory: (1-e^(-kn/m))^k ≈ 0.00085 at
    // n=500, m=2^16, k=4 — allow an order of magnitude of slack
    val fresh = (1 to 2000).map(i =>
      Gen.choose(0L, (1L << 60) - 1).apply(Gen.Parameters.default,
        Seed(9000L + i)).get).filterNot(inserted.toSet)
    val fp = fresh.count(h => BloomBits.test(bits, params, h, k))
    assert(fp <= fresh.length / 100, s"FPR implausibly high: $fp/${fresh.length}")
  }

  test("q21 window decorrelation equals the literal double-EXISTS on random layouts") {
    import org.apache.spark.sql.functions.col
    // random (order, supplier, late?) layouts; the decorrelated plan must
    // equal a direct per-row evaluation of the two correlated conditions
    (1 to 5).foreach { s =>
      val rows = Gen.listOfN(120, for {
        ord <- Gen.choose(1L, 25L)
        supp <- Gen.choose(1L, 8L)
        late <- Gen.oneOf(true, false)
      } yield (ord, supp, late))
        .apply(Gen.Parameters.default, Seed(400L + s)).get
      val orders = rows.map(_._1).distinct
        .map(o => (o, Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("o_orderkey", "o_orderdate")
      val li = rows.map { case (o, sp, late) =>
        (o, sp, Timestamp.valueOf(
          if (late) "2024-06-01 00:00:00" else "2024-01-15 00:00:00"))
      }.toDF("l_orderkey", "l_suppkey", "l_shipdate")
      val suppliers = (1L to 8L).map(i => (i, s"S$i")).toDF("s_suppkey", "s_name")
      val got = graft.operators.Relational
        .q21LateSuppliers(suppliers, orders, li, lateDays = 60, k = 100)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // scalar reference: literal EXISTS / NOT EXISTS per (order, supplier)
      val byOrder = rows.groupBy(_._1)
      val expect = rows.filter(_._3).map(r => (r._1, r._2)).distinct
        .filter { case (o, sp) =>
          val others = byOrder(o).filter(_._2 != sp)
          others.nonEmpty && !others.exists(_._3)
        }
        .groupBy(_._2).map { case (sp, os) => (s"S$sp", os.size.toLong) }.toSet
      assert(got == expect, s"seed $s: $got != $expect")
    }
  }

  test("funnel equals a sequential per-user scan on random event streams") {
    import org.apache.spark.sql.functions.col
    (1 to 5).foreach { s =>
      val rows = Gen.listOfN(200, for {
        u <- Gen.choose(1L, 12L)
        t <- Gen.oneOf("view", "click", "purchase", "other")
        sec <- Gen.choose(0L, 5000L)
      } yield (u, t, sec))
        .apply(Gen.Parameters.default, Seed(800L + s)).get
      val df = rows.map { case (u, t, sec) =>
        (u, t, new Timestamp(baseMs + sec * 1000L))
      }.toDF("user_id", "event_type", "ts")
      val r = graft.operators.EventsOps.funnelSteps(df).collect()(0)
      // scalar reference: per user, first view; first click after it;
      // first purchase after that — straight sequential scan semantics
      val perUser = rows.groupBy(_._1).values.map { es =>
        val v = es.filter(_._2 == "view").map(_._3).minOption
        val c = v.flatMap(vu =>
          es.filter(e => e._2 == "click" && e._3 > vu).map(_._3).minOption)
        val p = c.flatMap(cu =>
          es.filter(e => e._2 == "purchase" && e._3 > cu).map(_._3).minOption)
        (v, c, p)
      }.toSeq
      val expect = (perUser.count(_._1.isDefined).toLong,
        perUser.count(_._2.isDefined).toLong,
        perUser.count(_._3.isDefined).toLong,
        perUser.size.toLong)
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == expect,
        s"seed $s")
    }
  }

  test("funnelWindow equals the any-opening-view scalar simulation on random streams") {
    (1 to 5).foreach { s =>
      val W = 600L // seconds
      val rows = Gen.listOfN(200, for {
        u <- Gen.choose(1L, 12L)
        t <- Gen.oneOf("view", "click", "purchase", "other")
        sec <- Gen.choose(0L, 5000L)
      } yield (u, t, sec))
        .apply(Gen.Parameters.default, Seed(900L + s)).get
      val df = rows.map { case (u, t, sec) =>
        (u, t, new Timestamp(baseMs + sec * 1000L))
      }.toDF("user_id", "event_type", "ts")
      val r = graft.operators.EventsOps.funnelWindow(df, windowSec = W)
        .collect()(0)
      // scalar reference: per user, max over EVERY view of the chain
      // depth — first click strictly after the view, first purchase
      // strictly after that click, both within W of the view
      val perUser = rows.groupBy(_._1).values.map { es =>
        val views = es.filter(_._2 == "view").map(_._3)
        val lvl = views.foldLeft(if (views.nonEmpty) 1 else 0) { (best, v) =>
          val c = es.filter(e => e._2 == "click" && e._3 > v)
            .map(_._3).minOption.filter(_ <= v + W)
          val p = c.flatMap(cu => es
            .filter(e => e._2 == "purchase" && e._3 > cu)
            .map(_._3).minOption.filter(_ <= v + W))
          math.max(best, if (p.isDefined) 3 else if (c.isDefined) 2 else 1)
        }
        lvl
      }.toSeq
      val expect = (perUser.count(_ >= 1).toLong,
        perUser.count(_ >= 2).toLong, perUser.count(_ >= 3).toLong)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == expect,
        s"seed $s")
    }
  }

  test("maxConcurrency equals the scalar sweep on random session layouts") {
    (1 to 5).foreach { s =>
      val rows = Gen.listOfN(120, for {
        u <- Gen.choose(1L, 8L)
        sec <- Gen.choose(0L, 20000L)
      } yield (u, sec))
        .apply(Gen.Parameters.default, Seed(950L + s)).get
        .zipWithIndex.map { case ((u, sec), i) => (i.toLong, u, sec) }
      val df = rows.map { case (id, u, sec) =>
        (id, u, new Timestamp(baseMs + sec * 1000L))
      }.toDF("event_id", "user_id", "ts")
      val r = graft.operators.EventsOps.maxConcurrency(df).collect()(0)
      // scalar reference: per-user 30-min-gap sessions, then count
      // overlapping inclusive intervals at every interval start
      val ivs = rows.groupBy(_._2).values.flatMap { es =>
        val ts = es.map(_._3).sorted
        ts.foldLeft(List.empty[(Long, Long)]) { (acc, t) =>
          acc match {
            case (a, b) :: rest if t - b < 1800L => (a, t) :: rest
            case _ => (t, t) :: acc
          }
        }
      }.toSeq
      val best = ivs.map(_._1).distinct.sorted.map { t =>
        (ivs.count { case (a, b) => a <= t && t <= b }, t)
      }.maxBy { case (c, t) => (c, -t) }
      val expUs = baseMs * 1000L + best._2 * 1000000L
      assert(r.getLong(0) == best._1.toLong, s"seed $s")
      assert(r.getLong(1) == expUs, s"seed $s")
    }
  }

  test("sequence spans reproduce a sequential packer over any token layout") {
    // model: docs with random token counts laid out in order; spans must
    // equal the straightforward scalar packer
    val budget = 64L
    val counts = Gen.listOfN(80, Gen.choose(0L, 150L))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val docs = counts.zipWithIndex.map { case (n, i) =>
      // build a text with exactly n single-char tokens; normalize keeps it
      (i.toLong, Seq.fill(n.toInt)("a").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.operators.Sampling
      .packSequenceSpans(docs, budgetTokens = budget, nShards = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // scalar reference packer (shard 0 ⇒ same doc order)
    var before = 0L
    val expect = docs.collect().sortBy(_.getLong(0)).flatMap { r =>
      val id = r.getLong(0)
      val n = counts(id.toInt)
      val spans = if (n == 0) Seq.empty else
        (before / budget to (before + n - 1) / budget).map { s =>
          (id, s, math.max(0L, s * budget - before),
            math.min(n, (s + 1) * budget - before))
        }
      before += n
      spans
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect.toSeq)
  }

  test("asOfInterpolated equals the scalar lerp on random tick/query sets") {
    import graft.operators.AsOfJoin
    val genRow: Gen[(Long, Long, String, Double)] = for {
      user <- Gen.choose(1L, 3L)
      us <- Gen.choose(0L, 100000L)
      isClick <- Gen.oneOf(true, false)
      cents <- Gen.choose(1L, 49000L)
    } yield (user, us, if (isClick) "click" else "purchase", cents / 100.0)
    (1 to 5).foreach { i =>
      val rows = Gen.listOfN(60, genRow)
        .apply(Gen.Parameters.default, Seed(700L + i)).get
        .distinctBy(r => (r._1, r._2)) // unique (user, μs) like the testdata
        .zipWithIndex.map { case ((u, us, t, v), id) => (id.toLong, us, u, t, v) }
      val df = rows.map { case (id, us, u, t, v) =>
        (id, us * 1000L, u, t, v, "{}") }
        .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      val got = AsOfJoin.asOfInterpolated(df).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      // scalar reference: for each purchase, straddling clicks + exact lerp
      rows.filter(_._4 == "purchase").foreach { case (id, us, u, _, _) =>
        val clicks = rows.filter(r => r._4 == "click" && r._3 == u)
        val prev = clicks.filter(_._2 <= us).sortBy(_._2).lastOption
        val next = clicks.filter(_._2 >= us).sortBy(_._2).headOption
        val expect = (prev, next) match {
          case (Some(p), Some(n)) =>
            val pc = BigInt((BigDecimal(p._5).setScale(2) * 100).toLongExact)
            val nc = BigInt((BigDecimal(n._5).setScale(2) * 100).toLongExact)
            if (n._2 == p._2) Some((pc * 10000).toLong)
            else Some(((pc * (n._2 - p._2) + (nc - pc) * (us - p._2)) * 10000
              / (n._2 - p._2)).toLong)
          case _ => None
        }
        assert(got(id) == expect, s"seed ${700 + i}, purchase $id")
      }
    }
  }

  test("intervalOverlapPairs equals the scalar overlap scan on random intervals") {
    import graft.operators.RangeJoin
    import org.apache.spark.sql.functions.lit
    val genIv: Gen[(Long, Long, Long)] = for {
      id <- Gen.choose(0L, 1000000L)
      start <- Gen.choose(0L, 5000L)
      len <- Gen.choose(0L, 700L) // spans 0..8 bins at width 100
    } yield (id, start, start + len)
    (1 to 5).foreach { i =>
      val ivs = Gen.listOfN(40, genIv)
        .apply(Gen.Parameters.default, Seed(90L + i)).get
        .distinctBy(_._1) // unique ids so pair identity is well-defined
      val a = ivs.toDF("id_a", "a_s", "a_e")
      val b = ivs.toDF("id_b", "b_s", "b_e")
      val got = RangeJoin.intervalOverlapPairs(
        a, b, "a_s", "a_e", "b_s", "b_e", binUs = 100L,
        pred = org.apache.spark.sql.functions.col("id_a") <
          org.apache.spark.sql.functions.col("id_b"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val expect = (for {
        x <- ivs; y <- ivs
        if x._1 < y._1 && x._2 <= y._3 && y._2 <= x._3
      } yield (x._1, y._1)).toSet
      assert(got == expect, s"seed ${90 + i}: ${got.size} vs ${expect.size}")
    }
  }

  test("corpusDiff statuses partition the id universe on random versions") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.sum
    val genDoc: Gen[(Long, String, String)] = for {
      id <- Gen.choose(0L, 60L) // small id space forces overlap
      text <- Gen.alphaStr.map(_.take(12))
      src <- Gen.oneOf("s1", "s2")
    } yield (id, text, src)
    (1 to 5).foreach { i =>
      val vOld = Gen.listOfN(30, genDoc)
        .apply(Gen.Parameters.default, Seed(400L + i)).get.distinctBy(_._1)
      val vNew = Gen.listOfN(30, genDoc)
        .apply(Gen.Parameters.default, Seed(500L + i)).get.distinctBy(_._1)
      val r = TextAnalysis.corpusDiff(
        vOld.toDF("doc_id", "text", "source"),
        vNew.toDF("doc_id", "text", "source")).collect()
        .groupBy(_.getString(1)).view
        .mapValues(_.map(_.getLong(2)).sum).toMap.withDefaultValue(0L)
      val oldIds = vOld.map(_._1).toSet
      val newIds = vNew.map(_._1).toSet
      val oldBy = vOld.map(d => d._1 -> d._2).toMap
      val newBy = vNew.map(d => d._1 -> d._2).toMap
      assert(r("added") == (newIds -- oldIds).size)
      assert(r("removed") == (oldIds -- newIds).size)
      val shared = oldIds & newIds
      assert(r("unchanged") == shared.count(id => oldBy(id) == newBy(id)))
      assert(r("modified") == shared.count(id => oldBy(id) != newBy(id)))
      // the four statuses tile old ∪ new exactly
      assert(r("added") + r("removed") + r("unchanged") + r("modified") ==
        (oldIds ++ newIds).size)
    }
  }

  test("embeddingDrift: identical halves give zero shift on random vectors") {
    import graft.operators.Drift
    val genVec: Gen[Seq[Float]] =
      Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
    (1 to 5).foreach { i =>
      val vecs = Gen.listOfN(12, genVec)
        .apply(Gen.Parameters.default, Seed(600L + i)).get
      // mirror each vector into both vec_id halves: ids 0..11 and 12..23
      val rows = vecs.zipWithIndex.flatMap { case (v, j) =>
        Seq((j.toLong, v, j % 3), ((j + 12).toLong, v, j % 3))
      }
      val r = Drift.embeddingDrift(
        rows.toDF("vec_id", "embedding", "label")).collect()
      r.foreach { x =>
        assert(x.getLong(3) == 0L && x.getLong(4) == 0L,
          s"seed ${600 + i}: nonzero shift for label ${x.getLong(0)}")
      }
    }
  }

  test("round-6 invariants: PSI sign, span bounds, RFM conservation, Heaps monotonicity") {
    import graft.operators.{Drift, EventsOps, TextAnalysis}
    val ev = Tables.events(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    // PSI: every Laplace-smoothed term is ≥ 0, so the floored sum is too
    Drift.psiDrift(ev).collect().foreach { r =>
      assert(r.isNullAt(4) || r.getLong(4) >= 0L)
    }
    // span coverage can never exceed the doc surface
    TextAnalysis.dupSpans(docs).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // covered ≤ n_tokens
      assert(r.getLong(4) <= 1000000L)
    }
    // RFM: the grid partitions the purchase users; scores live in 1..4
    val users = ev.filter(org.apache.spark.sql.functions.col("event_type")
      === "purchase").select("user_id").distinct().count()
    val grid = EventsOps.rfmSegments(ev).collect()
    assert(grid.map(_.getLong(3)).sum == users)
    grid.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(s =>
        assert(s >= 1 && s <= 4))
    }
    // Heaps curve: all three cumulatives nondecreasing; vocab ≤ tokens
    val curve = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    curve.zip(curve.tail).foreach { case ((d0, t0, v0), (d1, t1, v1)) =>
      assert(d0 <= d1 && t0 <= t1 && v0 <= v1)
    }
    curve.foreach { case (_, t, v) => assert(v <= t) }
  }

  test("round-6 microstructure invariants: volume conservation, ACF/purity bounds") {
    import graft.operators.{MarketStats, Similarity}
    import org.apache.spark.sql.functions.{col, get_json_object, sum => fsum}
    val ev = Tables.events(spark, sf0001)
    // VPIN buckets partition the tape: bucket volumes sum to the total
    // traded size, buy + sell ≤ volume (sign-0 ticks are neither)
    val buckets = MarketStats.vpinBuckets(ev).collect()
    val totalVol = ev.select(fsum(
      get_json_object(col("props"), "$.k").cast("long"))).head.getLong(0)
    assert(buckets.map(_.getLong(4)).sum == totalVol)
    buckets.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(4))
      assert(r.isNullAt(6) || r.getLong(6) <= 1000000L) // |imb| ≤ vol
    }
    // ACF is a correlation: |ρ| ≤ 1 at every lag; pair counts shrink
    // as the lag grows (observation lags eat the series head)
    val acf = MarketStats.retAcf(ev).collect()
    acf.foreach(r => assert(r.isNullAt(2) || math.abs(r.getDouble(2)) <= 1.0))
    acf.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byLag = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      byLag.zip(byLag.tail).foreach { case (a, b) => assert(b <= a) }
    }
    // range volatility: lhl ≥ |lco| (the range bounds the open-close
    // move), Parkinson ≥ 0
    MarketStats.rangeVolatility(ev).collect().foreach { r =>
      assert(r.getLong(3) >= math.abs(r.getLong(4)) - 1) // floor slack
      assert(r.getLong(5) >= 0L)
    }
    // IVF purity: majority count ≤ cell size, purity in (0, 1e6]
    val purity = Similarity.ivfPurity(Tables.embeddings(spark, sf0001),
      Similarity.kmeansCentroids(Tables.embeddings(spark, sf0001))).collect()
    assert(purity.nonEmpty)
    purity.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(4) > 0L && r.getLong(4) <= 1000000L)
    }
  }

  test("closed-form rank/ntile/prefix-sum == window forms on random shapes") {
    // the Ranks primitives must agree with Spark's own window functions
    // on arbitrary (n, k, value-domain, group) shapes — seeded random
    // batches exercise tie-heavy, sparse, negative and clustered domains
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.operators.Ranks
    val genCase = for {
      n <- Gen.choose(1, 400)
      k <- Gen.choose(1, 12)
      dom <- Gen.oneOf(3L, 10L, 1000L, 1000000000L)
      groups <- Gen.oneOf(1, 2, 5)
    } yield (n, k, dom, groups)
    (1 to 8).foreach { i =>
      val (n, k, dom, groups) =
        genCase(Gen.Parameters.default, Seed(1000L + i)).get
      val rows = (1 to n).map { j =>
        (j.toLong, s"g${j % groups}", (j * 2654435761L % dom) - dom / 2,
          (j * 40503L % 97).toLong)
      }
      val df = rows.toDF("id", "g", "v", "w")
      val wNt = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val expected = df
        .withColumn("b", ntile(k).over(wNt))
        .withColumn("pre", coalesce(sum(col("w")).over(
          wNt.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val got = Ranks.withPrefixSum(
        Ranks.withNtileBucket(df, k, col("v"), Seq(col("id")), "b",
          partition = Seq("g")),
        Seq("g"), col("v"), Seq(col("id")), col("w"), "pre")
      val bad = expected.alias("e").join(got.alias("x"), Seq("id"))
        .filter(col("e.b") =!= col("x.b") || col("e.pre") =!= col("x.pre"))
        .count()
      assert(bad == 0, s"case n=$n k=$k dom=$dom groups=$groups: $bad rows")
    }
  }

  test("corpusOverlapKmv is EXACT when both sketches hold their whole corpus") {
    // bottom-k over < k distinct hashes keeps everything, so the union
    // sample is the union itself and the estimate degrades to the true
    // floored-micro Jaccard of distinct shingle sets — per seeded random
    // corpus, cross-check against a driver-side exact computation
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val genDoc: Gen[String] = Gen.choose(3, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" ")))
    (1 to 5).foreach { case i =>
      val docs = Gen.listOfN(12, genDoc)
        .apply(Gen.Parameters.default, Seed(900L + i)).get
        .zipWithIndex.map { case (t, j) => (j.toLong, t, s"s${j % 3}") }
      val df = docs.toDF("doc_id", "text", "source")
      val got = graft.operators.Dedup.corpusOverlapKmv(df).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
      // driver-side exact distinct 3-gram shingle sets per source
      def shingleSet(ts: Seq[String]): Set[String] = ts.flatMap { t =>
        val w = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
          .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
        if (w.length < 3) Seq.empty
        else w.sliding(3).map(_.mkString(" ")).toSeq
      }.toSet
      val bySrc = docs.groupBy(_._3).view
        .mapValues(ds => shingleSet(ds.map(_._2))).toMap
      for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
      } {
        val (sa, sb) = (bySrc(a), bySrc(b))
        val uni = (sa ++ sb).size
        val want = if (uni == 0) None
          else Some((sa & sb).size.toLong * 1000000L / uni)
        assert(got.get((a, b)) == want,
          s"seed ${900 + i} pair ($a,$b): got ${got.get((a, b))}, want $want")
      }
    }
  }

  test("dupSubstrings equals the scalar span oracle on random small-vocab corpora") {
    import graft.operators.Dedup
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val L = 3
    val genDoc = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    (1 to 5).foreach { i =>
      val texts = Gen.listOfN(12, genDoc)
        .apply(Gen.Parameters.default, Seed(1300L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      // scalar oracle: windows, corpus-wide occurrence counts,
      // duplicated starts, gaps-and-islands — independently recomputed
      val wins = docs.flatMap { case (id, t) =>
        val w = t.split(" ").filter(_.nonEmpty).toSeq
        if (w.length < L) Seq.empty
        else w.sliding(L).zipWithIndex
          .map { case (g, p) => (id, p, g.mkString(" ")) }.toSeq
      }
      val dup = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
      val want = wins.filter(w => dup(w._3))
        .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
          val ps = ws.map(_._2).sorted
          val islands = ps.tail.foldLeft(List(List(ps.head))) {
            case (acc @ (cur :: rest), p) =>
              if (p - cur.head > L) List(p) :: acc
              else (p :: cur) :: rest
            case (Nil, p) => List(List(p))
          }.map(_.reverse).reverse
          islands.map(isl => (id, isl.head.toLong,
            (isl.last + L - isl.head).toLong, isl.size.toLong))
        }.sortBy(s => (s._1, s._2))
      val got = Dedup.dupSubstrings(docs.toDF("doc_id", "text"), L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == want, s"seed ${1300 + i}")
      // structural invariants: len ≥ L, in-bounds, strictly disjoint
      val nToks = docs.map { case (id, t) =>
        id -> t.split(" ").count(_.nonEmpty) }.toMap
      got.groupBy(_._1).foreach { case (id, spans) =>
        spans.foreach { case (_, st, len, _) =>
          assert(len >= L && st >= 0 && st + len <= nToks(id)) }
        spans.sliding(2).foreach {
          case Seq((_, s1, l1, _), (_, s2, _, _)) => assert(s2 > s1 + l1)
          case _ => ()
        }
      }
      // the apply half removes exactly the span mass, doc by doc
      val removed = Dedup
        .dupSubstringsApply(docs.toDF("doc_id", "text"), L)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val spanMass = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      docs.foreach { case (id, _) =>
        assert(removed(id) == spanMass.getOrElse(id, 0L), s"doc $id mass")
      }
    }
  }

  test("dupSubstringsAgainst equals the scalar cross-corpus oracle on random corpora") {
    import graft.operators.Dedup
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val L = 3
    val genDoc = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    (1 to 5).foreach { i =>
      val texts = Gen.listOfN(14, genDoc)
        .apply(Gen.Parameters.default, Seed(1700L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val (batch, corpus) = docs.partition(_._1 % 5 == 0)
      // scalar oracle: batch window starts whose L-gram exists ANYWHERE
      // in the corpus split (set membership, not within-batch counts),
      // then the same gaps-and-islands span fold
      def wins(ds: Seq[(Long, String)]) = ds.flatMap { case (id, t) =>
        val w = t.split(" ").filter(_.nonEmpty).toSeq
        if (w.length < L) Seq.empty
        else w.sliding(L).zipWithIndex
          .map { case (g, p) => (id, p, g.mkString(" ")) }.toSeq
      }
      val corpusSet = wins(corpus).map(_._3).toSet
      val want = wins(batch).filter(w => corpusSet(w._3))
        .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
          val ps = ws.map(_._2).sorted
          val islands = ps.tail.foldLeft(List(List(ps.head))) {
            case (acc @ (cur :: rest), p) =>
              if (p - cur.head > L) List(p) :: acc
              else (p :: cur) :: rest
            case (Nil, p) => List(List(p))
          }.map(_.reverse).reverse
          islands.map(isl => (id, isl.head.toLong,
            (isl.last + L - isl.head).toLong, isl.size.toLong))
        }.sortBy(s => (s._1, s._2))
      val got = Dedup.dupSubstringsAgainst(
        batch.toDF("doc_id", "text"),
        Dedup.windowCensus(corpus.toDF("doc_id", "text"), L)
          .select(org.apache.spark.sql.functions.col("h")), L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == want, s"seed ${1700 + i}")
    }
  }

  test("sq8 codes: scale-invariant, and the code-grid cosine tracks the raw cosine") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val dim = 64
    val gen = Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f))
    (1 to 5).foreach { i =>
      val vecs = (0 until 12).map { j =>
        (j.toLong, Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f))
          .apply(Gen.Parameters.default, Seed(2100L + i * 100 + j)).get
          .toArray)
      }
      def codesOf(rows: Seq[(Long, Array[Float])]): Map[Long, Seq[Long]] =
        rows.toDF("vec_id", "embedding")
          .select(col("vec_id"), Similarity.sq8Codes(col("embedding")))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val c = codesOf(vecs)
      // per-vector symmetric scale ⇒ codes are EXACTLY invariant under a
      // power-of-two rescale (binary-FP exact, no boundary flips)
      val c4 = codesOf(vecs.map { case (id, v) => (id, v.map(_ * 4.0f)) })
      assert(c == c4, s"seed batch $i: codes not scale-invariant")
      // the serving identity: cosine on the code grid tracks the raw
      // cosine within quantization error (|q|≤127, d=64 ⇒ loose 0.05)
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val n = math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum)
        if (n == 0) 0.0 else a.zip(b).map { case (x, y) => x * y }.sum / n
      }
      for (Seq((ia, va), (ib, vb)) <- vecs.combinations(2).take(20)) {
        val raw = cos(va.map(_.toDouble).toSeq, vb.map(_.toDouble).toSeq)
        val coded = cos(c(ia).map(_.toDouble), c(ib).map(_.toDouble))
        assert(math.abs(raw - coded) <= 0.05,
          s"seed batch $i pair ($ia,$ib): raw $raw vs coded $coded")
      }
    }
  }

  test("knPerplexity invariants: every log-prob ≤ 0; seen mass per context ≤ 1") {
    import graft.operators.TextAnalysis
    val vocab = Vector("x", "y", "z", "w", "v")
    val genDoc = for {
      n <- Gen.choose(2, 25)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    (1 to 3).foreach { i =>
      val texts = Gen.listOfN(10, genDoc)
        .apply(Gen.Parameters.default, Seed(1400L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val got = TextAnalysis.knPerplexity(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      got.foreach { case (n, lp) =>
        assert(lp <= 0L, "KN probabilities are ≤ 1, so log mass is ≤ 0")
        assert((n == 0L) == (lp == 0L) || lp < 0L)
      }
      // scalar model: per context, discounted seen mass + backoff mass
      // spent on SEEN followers never exceeds 1 (the rest is reserved
      // for unseen continuations — the point of the discount)
      val bigs = docs.flatMap { case (_, t) =>
        val w = t.split(" ").filter(_.nonEmpty)
        w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq }
      val cb = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nb = cb.size.toLong
      val byW1 = cb.keys.groupBy(_.split(" ")(0))
      val nprec = cb.keys.groupBy(_.split(" ")(1)).view
        .mapValues(_.size.toLong).toMap
      byW1.foreach { case (_, fset) =>
        // keys come off a set — materialize to a Seq BEFORE mapping to
        // counts/probabilities, or equal values silently dedupe
        val followers = fset.toSeq
        val cw = followers.map(cb).sum
        val f1 = followers.size.toLong
        val mass = followers.map { b =>
          val p2 = nprec(b.split(" ")(1))
          ((4.0 * cb(b) - 3.0) * nb + 3.0 * f1 * p2) / (4.0 * cw * nb)
        }.sum
        assert(mass <= 1.0 + 1e-9, s"seen mass $mass exceeds 1")
      }
    }
  }
}
