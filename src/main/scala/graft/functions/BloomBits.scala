package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/**
 * Engine-portable Bloom filter over h60 hashes — the membership sketch
 * for set-probe operators whose probe set is too large to broadcast as
 * rows (e.g. decontamination against a 10⁸-n-gram benchmark suite:
 * ~3 GB as a broadcast set, 2 MB as a 2²⁴-bit bloom).
 *
 * Positions come from the same 2-universal family as MinHash
 * (pos_i = ((a_i·(h mod P) + b_i) mod P) mod m, [[PortableHash]]), all
 * inside checked signed-64 arithmetic — so the DuckDB oracle rebuilds
 * the EXACT bitmap and the false-positive behavior is bit-identical
 * across engines: even the approximate operator hash-matches its
 * oracle.
 *
 * The membership test is a codegen'd expression; the bitmap rides the
 * generated plan as a referenced object (the [[NearestCentroid]]
 * pattern) — nothing is shipped per row, no UDF boundary.
 */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {
  require(bits.nonEmpty && k > 0)

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val params = BloomBits.flatParams(k)

  override def nullSafeEval(h: Any): Any =
    BloomBits.test(bits, params, h.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val paramsRef = ctx.addReferenceObj("bloomParams", params, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomBits.test($bitsRef, $paramsRef, $c, $k)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomBits {

  /** (a_i, b_i) pairs flattened for the generated loop. */
  def flatParams(k: Int): Array[Long] =
    PortableHash.minhashParams(k).flatMap(p => Seq(p._1, p._2)).toArray

  /** Invoked from generated code — keep signature stable. */
  def test(bits: Array[Long], params: Array[Long], h: Long, k: Int): Boolean = {
    val p = PortableHash.MinhashP
    val m = bits.length.toLong * 64
    val h1 = h % p // h60 ≥ 0
    var i = 0
    while (i < k) {
      val pos = (params(2 * i) * h1 + params(2 * i + 1)) % p % m
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Set the k positions of one hash into a bitmap. */
  private def set(bits: Array[Long], params: Array[Long], h: Long,
      k: Int): Unit = {
    val p = PortableHash.MinhashP
    val m = bits.length.toLong * 64
    val h1 = h % p
    var i = 0
    while (i < k) {
      val pos = (params(2 * i) * h1 + params(2 * i + 1)) % p % m
      bits((pos >>> 6).toInt) |= (1L << (pos & 63).toInt)
      i += 1
    }
  }

  /** Build the bitmap over a single LongType column of h60 hashes: one
    * distributed pass — per-partition bitmaps OR-merged treewise, only
    * bitmaps (mBits/8 bytes each) cross the wire, never the elements.
    * The genuinely imperative per-partition fold is the documented RDD
    * escape hatch. */
  def build(hashes: DataFrame, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0 &&
      mBits <= PortableHash.MinhashP, "mBits must be a positive multiple of 64 below P")
    val params = flatParams(k)
    hashes.select(hashes.columns.head).rdd
      .map(_.getLong(0))
      .treeAggregate(new Array[Long](mBits / 64))(
        (arr, h) => { set(arr, params, h, k); arr },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
  }

  def bloom_might_contain(h: Column, bits: Array[Long], k: Int): Column =
    GraftBridge.toColumn(
      BloomMightContain(GraftBridge.toExpression(h), bits, k))
}
