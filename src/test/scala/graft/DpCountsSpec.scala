package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The geometric-mechanism release: noise distribution, determinism,
  * and the exact n + noise arithmetic replicated off-Spark (the DuckDB
  * gate pins cross-engine parity; this pins the MECHANISM — that the
  * keyed noise really is discrete Laplace with α = 1/2). */
class DpCountsSpec extends SparkSpec {
  import spark.implicits._

  /** Off-Spark replica of the keyed noise: h60 = first 15 md5 hex
    * chars; two Geometric(1/2) draws as trailing-ones of the 30-bit
    * halves. */
  private def noiseOf(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    def tOnes(x: Long): Long =
      java.lang.Long.bitCount(x & ~(x + 1))
    val mask = (1L << 30) - 1
    tOnes(h & mask) - tOnes((h >> 30) & mask)
  }

  test("noise is discrete Laplace α=1/2: P(k) = 2^-|k|/3, mean ~ 0") {
    val n = 20000
    val freq = spark.range(n.toLong)
      .select(TextAnalysis.dpNoise(concat(lit("k"), col("id"))).as("z"))
      .groupBy(col("z")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def got(k: Long) = freq.getOrElse(k, 0L).toDouble / n
    // binomial sd at n=20000: ~0.0033 for p=1/3 — 5 sd tolerances
    assert(math.abs(got(0) - 1.0 / 3) < 0.017)
    assert(math.abs(got(1) - 1.0 / 6) < 0.014)
    assert(math.abs(got(-1) - 1.0 / 6) < 0.014)
    assert(math.abs(got(2) - 1.0 / 12) < 0.011)
    assert(math.abs(got(-2) - 1.0 / 12) < 0.011)
    val mean = freq.map { case (k, c) => k.toDouble * c }.sum / n
    assert(math.abs(mean) < 0.05)
    // geometric tails: nothing near the 30-bit truncation in 20k draws
    assert(freq.keys.forall(k => math.abs(k) < 25))
  }

  test("release = exact count + keyed noise; negatives are legal") {
    val docs = (0 until 7).map(i => (i.toLong, "t", "en", "sA")) ++
      (7 until 9).map(i => (i.toLong, "t", "de", "sA")) ++
      Seq((9L, "t", "en", "sB"))
    val got = TextAnalysis.dpCounts(
      docs.toDF("doc_id", "text", "lang", "source")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("sA", "en")) == 7L + noiseOf("dp1:sA:en"))
    assert(got(("sA", "de")) == 2L + noiseOf("dp1:sA:de"))
    assert(got(("sB", "en")) == 1L + noiseOf("dp1:sB:en"))
    assert(got.size == 3)
  }

  test("keyed noise is a PRF: re-running the release is bit-identical") {
    val docs = (0 until 50).map(i =>
      (i.toLong, "t", s"l${i % 3}", s"s${i % 5}"))
      .toDF("doc_id", "text", "lang", "source")
    val a = TextAnalysis.dpCounts(docs).collect().toSeq
    val b = TextAnalysis.dpCounts(docs).collect().toSeq
    assert(a == b)
    // and a different seed re-keys every cell's noise draw
    val c = TextAnalysis.dpCounts(docs, seed = "dp2").collect().toSeq
    assert(a.map(_.getString(0)) == c.map(_.getString(0)))
    assert(a != c)
  }
}
