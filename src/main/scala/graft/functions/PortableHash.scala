package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Engine-portable 60-bit hash: the first 15 hex chars of md5, read as an
 * integer. Exists so the sketch operators (MinHash, SimHash, hyperplane
 * LSH) can be verified by the DuckDB oracle EXACTLY — both engines ship
 * bit-identical md5, and 60 bits stays inside checked signed-64 arithmetic
 * everywhere (`('0x' || substr(md5(x),1,15))::BIGINT` on the DuckDB side).
 *
 * xxhash64 would be ~3× faster but is Spark-private; determinism across
 * engines is worth more here than the last nanoseconds — and md5 stays
 * codegen'd (built-in expression), so the operators remain scan-speed.
 */
object PortableHash {

  /** Column form: h60(s) ∈ [0, 2^60). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Driver-side twin — MUST stay bit-identical to [[h60]]. */
  def h60String(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-uniform hyperplane weight in [-1, 1) for
    * (plane, dim) — computed once on the driver, shipped as a literal. */
  def planeWeight(p: Int, i: Int): Double =
    ((h60String(s"$p,$i") % 2000001L) - 1000000L) / 1000000.0

  /** Modulus for the 2-universal MinHash family: largest prime < 2^30,
    * so a*h + b stays inside signed-64 under DuckDB's checked arithmetic. */
  val MinhashP: Long = 1073741789L

  /** Deterministic (a_i, b_i) pairs for h_i(x) = (a_i·h(x) + b_i) mod P —
    * ONE base hash per element, k derived hashes by arithmetic (the
    * portable, cheap alternative to k independent md5 passes). */
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      (h60String(s"a$i") % (MinhashP - 1) + 1, h60String(s"b$i") % MinhashP)
    }
}
