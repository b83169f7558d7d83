package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

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
}
