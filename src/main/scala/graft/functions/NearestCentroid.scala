package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * Map-side IVF assignment: argmax-cosine centroid id for an embedding,
 * as ONE codegen'd expression with the centroid table attached to the
 * plan as a reference object (broadcast with the task binary — never a
 * join). This is the shape coarse quantization must take at 100 TB:
 * the corpus streams through a projection; a crossJoin+window assignment
 * would multiply the corpus by k and shuffle it per iteration.
 *
 * Ordering matches the declarative form it replaces exactly: score is
 * dot(emb, c)/|c| (the |emb| factor is constant across centroids, so
 * cosine argmax is unchanged), ties resolved to the lowest centroid id
 * by strict comparison in ascending order.
 */
case class NearestCentroid(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  // norms precomputed once per plan, not per row
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(emb: Any): Any =
    NearestCentroid.assign(emb.asInstanceOf[ArrayData], centroids, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val normsRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.assign($c, $centsRef, $normsRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Invoked from generated code — keep signature stable. */
  def assign(emb: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double]): Int = {
    val xs = emb.toFloatArray()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val w = cents(c)
      val n = math.min(xs.length, w.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += xs(i).toDouble * w(i)
        i += 1
      }
      val score = if (norms(c) != 0.0) acc / norms(c) else Double.NegativeInfinity
      if (score > bestScore) { best = c; bestScore = score }
      c += 1
    }
    best
  }

  def nearest_centroid(emb: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(
      NearestCentroid(GraftBridge.toExpression(emb), centroids))

  // ── Exact-integer (quantized) scoring twins ──
  //
  // The audit family (`ivf_margin`) needs scores an SQL oracle can
  // replay BIT-for-bit, including every comparison — float dot sums
  // are accumulation-order-dependent, so the quantized twins work on
  // the integer micro grid instead: qx = floor(x·10⁶) and
  // qw = floor(w·10⁶) are single-op IEEE floors (deterministic on both
  // engines), dots are exact BIGINT sums, and centroid norms cross
  // through one correctly-rounded sqrt of an exactly-representable
  // (< 2^53) integer, floored. Score s_c = (Σ qx·qw) quot cn_c with
  // Java `/` ≡ SQL `div`/`//` (all truncate toward zero). Zero-norm
  // centroids take a −2^61 sentinel (never win unless all are zero).

  /** Shared scoring loop: returns (argmaxCell, marginRaw) where
    * marginRaw = s_best − s_secondBest on the integer score scale
    * (≈ cosine·|qx|). Invoked from generated code — keep stable. */
  def scoreQ(emb: ArrayData, qw: Array[Array[Long]],
      cn: Array[Long]): (Int, Long) = {
    val xs = emb.toFloatArray()
    var best = 0
    var s1 = Long.MinValue
    var s2 = Long.MinValue
    var c = 0
    while (c < qw.length) {
      val w = qw(c)
      val n = math.min(xs.length, w.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(xs(i).toDouble * 1000000.0).toLong * w(i)
        i += 1
      }
      val s = if (cn(c) != 0L) acc / cn(c) else SENTINEL
      if (s > s1) { s2 = s1; s1 = s; best = c }
      else if (s > s2) { s2 = s }
      c += 1
    }
    (best, if (s2 == Long.MinValue) 0L else s1 - s2)
  }

  val SENTINEL: Long = -(1L << 61)

  def assignQ(emb: ArrayData, qw: Array[Array[Long]],
      cn: Array[Long]): Int = scoreQ(emb, qw, cn)._1

  /** Cosine-scale micro margin: marginRaw·10⁶ quot |qx| (0 for the
    * zero vector). Bound: |marginRaw| ≤ 2·|qx| ⇒ the product stays
    * ≤ 2·10⁶·|qx| — inside Long for any |x| ≤ ~10³ per element. */
  def marginQ(emb: ArrayData, qw: Array[Array[Long]],
      cn: Array[Long]): Long = {
    val raw = scoreQ(emb, qw, cn)._2
    val xs = emb.toFloatArray()
    var ss = 0L
    var i = 0
    while (i < xs.length) {
      val q = math.floor(xs(i).toDouble * 1000000.0).toLong
      ss += q * q
      i += 1
    }
    val xn = math.floor(math.sqrt(ss.toDouble)).toLong
    if (xn == 0L) 0L else raw * 1000000L / xn
  }

  /** Winning score on the cosine micro scale: s_best·10⁶ quot |qx|.
    * 0 for the zero vector and for the all-sentinel case (every
    * centroid zero-norm) — both guards mirrored in the SQL oracle. */
  def cosQ(emb: ArrayData, qw: Array[Array[Long]],
      cn: Array[Long]): Long = {
    var s1 = Long.MinValue
    var c = 0
    val xs = emb.toFloatArray()
    while (c < qw.length) {
      val w = qw(c)
      val n = math.min(xs.length, w.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(xs(i).toDouble * 1000000.0).toLong * w(i)
        i += 1
      }
      val s = if (cn(c) != 0L) acc / cn(c) else SENTINEL
      if (s > s1) s1 = s
      c += 1
    }
    if (s1 == SENTINEL || s1 == Long.MinValue) return 0L
    var ss = 0L
    var i = 0
    while (i < xs.length) {
      val q = math.floor(xs(i).toDouble * 1000000.0).toLong
      ss += q * q
      i += 1
    }
    val xn = math.floor(math.sqrt(ss.toDouble)).toLong
    if (xn == 0L) 0L else s1 * 1000000L / xn
  }

  def centroid_cos_q(emb: Column,
      centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(
      CentroidCosQ(GraftBridge.toExpression(emb), centroids))

  def quantize(centroids: Array[Array[Double]]): Array[Array[Long]] =
    centroids.map(_.map(w => math.floor(w * 1000000.0).toLong))

  def quantNorms(qw: Array[Array[Long]]): Array[Long] =
    qw.map { w =>
      var ss = 0L; var i = 0
      while (i < w.length) { ss += w(i) * w(i); i += 1 }
      math.floor(math.sqrt(ss.toDouble)).toLong
    }

  def nearest_centroid_q(emb: Column,
      centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(
      NearestCentroidQ(GraftBridge.toExpression(emb), centroids))

  def centroid_margin_q(emb: Column,
      centroids: Array[Array[Double]]): Column =
    GraftBridge.toColumn(
      CentroidMarginQ(GraftBridge.toExpression(emb), centroids))
}

/** Quantized-argmax cell id — see [[NearestCentroid.scoreQ]]. */
case class NearestCentroidQ(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val qw = NearestCentroid.quantize(centroids)
  @transient private lazy val cn = NearestCentroid.quantNorms(qw)

  override def nullSafeEval(emb: Any): Any =
    NearestCentroid.assignQ(emb.asInstanceOf[ArrayData], qw, cn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qwRef = ctx.addReferenceObj("qw", qw, "long[][]")
    val cnRef = ctx.addReferenceObj("cn", cn, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.assignQ($c, $qwRef, $cnRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidQ = copy(child = newChild)

  override def prettyName: String = "nearest_centroid_q"
}

/** Quantized winning-score cosine micros — see [[NearestCentroid.cosQ]]. */
case class CentroidCosQ(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val qw = NearestCentroid.quantize(centroids)
  @transient private lazy val cn = NearestCentroid.quantNorms(qw)

  override def nullSafeEval(emb: Any): Any =
    NearestCentroid.cosQ(emb.asInstanceOf[ArrayData], qw, cn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qwRef = ctx.addReferenceObj("qw", qw, "long[][]")
    val cnRef = ctx.addReferenceObj("cn", cn, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.cosQ($c, $qwRef, $cnRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidCosQ = copy(child = newChild)

  override def prettyName: String = "centroid_cos_q"
}

/** Quantized assignment margin in cosine micros — see
  * [[NearestCentroid.marginQ]]. */
case class CentroidMarginQ(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val qw = NearestCentroid.quantize(centroids)
  @transient private lazy val cn = NearestCentroid.quantNorms(qw)

  override def nullSafeEval(emb: Any): Any =
    NearestCentroid.marginQ(emb.asInstanceOf[ArrayData], qw, cn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qwRef = ctx.addReferenceObj("qw", qw, "long[][]")
    val cnRef = ctx.addReferenceObj("cn", cn, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroid.marginQ($c, $qwRef, $cnRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidMarginQ = copy(child = newChild)

  override def prettyName: String = "centroid_margin_q"
}
