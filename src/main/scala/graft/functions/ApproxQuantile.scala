package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Approximate quantile as a custom `TypedImperativeAggregate` — the
 * ClickHouse-`median` analogue (`trends/listing/service.go:53`; CH `median`
 * = sampling-based `quantile(0.5)`, SURVEY.md §2.3 A3). The engine's
 * default trends median is exact; this sketch is the bounded-memory
 * variant for when the per-group value count makes exact infeasible.
 *
 * Sampling scheme: bottom-k by hash — keep the k values whose
 * (splitmix64 of the IEEE bits) hashes are smallest. Unlike ClickHouse's
 * reservoir this is DETERMINISTIC and order/partitioning-independent:
 * min-k of a pure hash is commutative and associative, so partial
 * buffers merge to the same sketch regardless of split or arrival order
 * (asserted in spec by comparing 1-partition vs 32-partition runs).
 * Known bias: duplicate values share a hash, so heavy duplication
 * under-weights repeats; rates are continuous doubles, where ties are
 * measure-zero. ≤ k inputs ⇒ exact quantile.
 *
 * Memory: O(k) per group; serialized partial = 4 + 16k bytes.
 */
case class ApproxQuantileSketch(
    child: Expression,
    k: Int = 1024,
    q: Double = 0.5,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSketch] {

  override def createAggregationBuffer(): BottomKSketch = new BottomKSketch(k)

  override def update(b: BottomKSketch, input: InternalRow): BottomKSketch = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: BottomKSketch, o: BottomKSketch): BottomKSketch = {
    b.mergeWith(o); b
  }

  override def eval(b: BottomKSketch): Any = b.quantile(q) match {
    case Some(x) => x
    case None => null
  }

  override def serialize(b: BottomKSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKSketch =
    BottomKSketch.fromBytes(bytes, k)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxQuantileSketch =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): ApproxQuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxQuantileSketch =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "approx_quantile_sketch"
}

/**
 * Oracle-reproducible variant: the selection hash is supplied as a second
 * child instead of being derived from the IEEE bits, so callers can pass
 * the engine-portable [[PortableHash.h60]] of a canonical (integer) form
 * of the value. DuckDB can then rebuild the IDENTICAL bottom-k sample —
 * `('0x' || substr(md5(x),1,15))::BIGINT`, rank, keep rn ≤ k — and the
 * oracle matches the sketch's error, not just its target (the same
 * technique that gates `vocab_cms`/`kmv_distinct`).
 *
 * Determinism requires the hash to be injective on the kept value (equal
 * hash ⇒ equal value): boundary ties at the kth hash are then resolution-
 * independent as a value multiset. h60 of the value's canonical integer
 * string satisfies this up to 60-bit md5-prefix collisions.
 */
case class KeyedQuantileSketch(
    hash: Expression,
    value: Expression,
    k: Int = 1024,
    q: Double = 0.5,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSketch] {

  override def createAggregationBuffer(): BottomKSketch = new BottomKSketch(k)

  override def update(b: BottomKSketch, input: InternalRow): BottomKSketch = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      b.addRaw(h.asInstanceOf[Long], v.asInstanceOf[Double])
    b
  }

  override def merge(b: BottomKSketch, o: BottomKSketch): BottomKSketch = {
    b.mergeWith(o); b
  }

  override def eval(b: BottomKSketch): Any = b.quantile(q) match {
    case Some(x) => x
    case None => null
  }

  override def serialize(b: BottomKSketch): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKSketch =
    BottomKSketch.fromBytes(bytes, k)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(hash, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyedQuantileSketch =
    copy(hash = newChildren(0), value = newChildren(1))
  override def withNewMutableAggBufferOffset(o: Int): KeyedQuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KeyedQuantileSketch =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "keyed_quantile_sketch"
}

/** Max-heap of (hash, value) keeping the k smallest hashes. */
final class BottomKSketch(val k: Int) {
  // parallel arrays as a binary max-heap on hash
  private val hashes = new Array[Long](k)
  private val values = new Array[Double](k)
  private var n = 0

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && hashes((i - 1) / 2) < hashes(i)) {
      val p = (i - 1) / 2
      val h = hashes(i); hashes(i) = hashes(p); hashes(p) = h
      val v = values(i); values(i) = values(p); values(p) = v
      i = p
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && hashes(l) > hashes(m)) m = l
      if (r < n && hashes(r) > hashes(m)) m = r
      if (m == i) return
      val h = hashes(i); hashes(i) = hashes(m); hashes(m) = h
      val v = values(i); values(i) = values(m); values(m) = v
      i = m
    }
  }

  private[functions] def addRaw(h: Long, v: Double): Unit = {
    if (n < k) { hashes(n) = h; values(n) = v; n += 1; siftUp(n - 1) }
    else if (h < hashes(0)) { hashes(0) = h; values(0) = v; siftDown() }
  }

  def add(value: Double): Unit =
    addRaw(BottomKSketch.mix(java.lang.Double.doubleToLongBits(value)), value)

  def mergeWith(o: BottomKSketch): Unit = {
    var i = 0
    while (i < o.n) { addRaw(o.hashes(i), o.values(i)); i += 1 }
  }

  /** Linear-interpolated quantile of the sampled values (exact if the
    * sketch never overflowed). */
  def quantile(q: Double): Option[Double] = {
    if (n == 0) return None
    val sorted = values.take(n).sorted
    val pos = q * (sorted.length - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    Some(sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo)))
  }

  def size: Int = n

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(hashes(i)); bb.putDouble(values(i)); i += 1 }
    bb.array()
  }
}

object BottomKSketch {
  /** splitmix64 finalizer — well-mixed pure hash of the IEEE bits. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def fromBytes(bytes: Array[Byte], k: Int): BottomKSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new BottomKSketch(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { s.addRaw(bb.getLong, bb.getDouble); i += 1 }
    s
  }
}

/** Column-level API. */
object ApproxQuantile {
  def approx_median_sketch(c: Column, k: Int = 1024): Column =
    GraftBridge.toColumn(
      ApproxQuantileSketch(GraftBridge.toExpression(c), k, 0.5)
        .toAggregateExpression())

  def approx_quantile_sketch(c: Column, q: Double, k: Int = 1024): Column =
    GraftBridge.toColumn(
      ApproxQuantileSketch(GraftBridge.toExpression(c), k, q)
        .toAggregateExpression())

  /** Bottom-k median where the selection hash is caller-supplied (use
    * [[PortableHash.h60]] of a canonical integer form of the value so the
    * DuckDB oracle can rebuild the identical sample). */
  def keyed_median_sketch(h: Column, v: Column, k: Int = 1024): Column =
    GraftBridge.toColumn(
      KeyedQuantileSketch(
        GraftBridge.toExpression(h), GraftBridge.toExpression(v), k, 0.5)
        .toAggregateExpression())
}
