package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Per-group top-k as a bounded-heap `TypedImperativeAggregate` — the
 * scale-path alternative to the `row_number() OVER (PARTITION BY g ORDER
 * BY s DESC) <= k` idiom. The window form shuffles and SORTS every row of
 * every group; this aggregate keeps at most k (score, id) entries per
 * group in each map-side partial, so the shuffle carries ≤ k rows per
 * (group × partition) and nothing is ever globally sorted. At 100 TB,
 * "top 3 documents per source" over a window is a full-corpus sort;
 * over this aggregate it is a scan plus a result-cardinality merge.
 *
 * Determinism: total order on (score DESC, id ASC) — ties broken by id —
 * so partials merge to the same top-k regardless of partitioning or
 * arrival order (spec-asserted 1-partition vs 32-partition). Exact, not
 * a sketch: gated by a DuckDB row_number oracle (`group_topk`).
 *
 * Memory: O(k) per group; serialized partial = 4 + 16k bytes.
 */
case class TopKRowsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Number].longValue(),
        i.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = {
    b.mergeWith(o); b
  }

  /** Array of struct(score, id), best-first (score DESC, id ASC).
    * Explicit comparator, not sortBy(-s): negating Long.MinValue
    * overflows back to itself and would sort the worst score first. */
  override def eval(b: TopKHeap): Any = {
    val sorted = b.entries.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 != s2) s1 > s2 else i1 < i2
    }
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(b: TopKHeap): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes, k)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_rows"
}

/** Bounded heap keeping the k best (score, id) under (score DESC, id ASC);
  * the root is the WORST kept entry so a better arrival replaces it in
  * O(log k). */
final class TopKHeap(val k: Int) {
  private val scores = new Array[Long](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // a is worse than b ⇒ a sits closer to the root
  private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 &&
        worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def add(s: Long, i: Long): Unit = {
    if (n < k) { scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1) }
    else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i; siftDown()
    }
  }

  def mergeWith(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  def entries: Array[(Long, Long)] =
    Array.tabulate(n)(i => (scores(i), ids(i)))

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte], k: Int): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { h.add(bb.getLong, bb.getLong); i += 1 }
    h
  }
}

/** Column-level API. */
object TopKRows {
  /** Top-k (score DESC, id ASC) per group as array<struct<score,id>>. */
  def topk_rows(score: Column, id: Column, k: Int): Column =
    GraftBridge.toColumn(
      TopKRowsAgg(GraftBridge.toExpression(score),
        GraftBridge.toExpression(id), k).toAggregateExpression())
}
