package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A NATIVE as-of join operator — the whole-operator Catalyst tier
 * (custom `LogicalPlan` + `Strategy` + `SparkPlan`) for the semantics
 * `operators.AsOfJoin` expresses with the union + ordered-window trick:
 * for each left row, the latest right payload with `right.ts <= left.ts`
 * on the same key (inclusive, DuckDB-ASOF semantics).
 *
 * Why a physical operator when the declarative form already scales: the
 * window formulation materializes the UNION of both sides through one
 * sort and carries a running `last(ignoreNulls)` column per row — the
 * physical operator instead merges the two sorted streams per partition
 * with O(1) state (current right row + held payload), touching each
 * input row exactly once and never widening the left rows with tag
 * columns. Same single hash shuffle per side, same in-partition sort
 * (both REQUESTED declaratively via requiredChildDistribution/Ordering,
 * so EnsureRequirements plans them and AQE still re-plans the
 * exchanges); the merge itself replaces the window operator.
 *
 * Scope (deliberate): one equi-key, long-backed timestamps (LongType /
 * TimestampType — both microsecond longs internally), one payload
 * column. That is the shape every as-of consumer in this repo uses; the
 * declarative form stays the general fallback.
 */
object AsOfJoinPhysical {

  /** Logical marker node: left columns plus one as-of payload column.
    * Key/ts/payload are carried BY NAME and resolved at planning time —
    * a self-join (both sides derived from one relation) makes the
    * analyzer's relation-dedup regenerate the right child's exprIds,
    * and attribute fields captured at construction would dangle (found
    * empirically; Spark's own AsOfJoin node predates per-node dedup
    * handling for externals). `references` conservatively claims both
    * children's outputs so column pruning never drops the named
    * columns; callers project their sides first, so nothing is lost. */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      keyName: String, leftTsName: String, rightTsName: String,
      payloadName: String, outAttr: AttributeReference)
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output :+ outAttr
    // the payload column is PRODUCED here, not derived from a child —
    // declare it so the analyzer's missing-attribute check passes
    override def producedAttributes
        : org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
    override def references
        : org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(
        left.output ++ right.output)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: the marker node becomes the merge exec, its
    * names resolved against the (possibly dedup-rewritten) children. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, key, lts, rts, pay, out) =>
        def a(side: LogicalPlan, name: String): Attribute =
          side.output.find(_.name == name).getOrElse(
            throw new IllegalStateException(s"as-of column $name lost"))
        AsOfJoinExec(planLater(l), planLater(r),
          a(l, key), a(r, key), a(l, lts), a(r, rts), a(r, pay),
          out) :: Nil
      case _ => Nil
    }
  }

  /** Sort-merge as-of: children hash-clustered on the key and sorted by
    * (key, ts) — declared, not hand-built, so EnsureRequirements owns
    * the exchanges. Per partition, one forward pass over both sorted
    * iterators with O(1) carried state. */
  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTs: Attribute, rightTs: Attribute,
      payload: Attribute, outAttr: AttributeReference)
      extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output :+ outAttr

    override def producedAttributes
        : org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyExpr = BindReferences.bindReference(
        leftKey: Expression, left.output)
      val lTsExpr = BindReferences.bindReference(
        leftTs: Expression, left.output)
      val rKeyExpr = BindReferences.bindReference(
        rightKey: Expression, right.output)
      val rTsExpr = BindReferences.bindReference(
        rightTs: Expression, right.output)
      val pExpr = BindReferences.bindReference(
        payload: Expression, right.output)
      val keyType = leftKey.dataType
      val payloadType = payload.dataType
      val leftOut = left.output
      val outAttrs = leftOut :+ outAttr
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
        val resultProj = UnsafeProjection.create(
          outAttrs.map(a => a: Expression), outAttrs)
        val joined = new JoinedRow
        val payloadRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        // lookahead right row state (values extracted eagerly — the
        // iterator's row buffer is reused by the upstream sort)
        var rKey: Any = null
        var rTs: Long = 0L
        var rPayload: Any = null
        var rHas = false
        def advanceRight(): Unit =
          if (rIter.hasNext) {
            val row = rIter.next()
            rKey = InternalRow.copyValue(rKeyExpr.eval(row))
            rTs = rTsExpr.eval(row).asInstanceOf[Long]
            rPayload = InternalRow.copyValue(pExpr.eval(row))
            rHas = true
          } else rHas = false
        advanceRight()
        // held as-of state for the key currently being merged
        var heldKey: Any = null
        var heldPayload: Any = null
        var heldSet = false
        lIter.map { lRow =>
          val lk = lKeyExpr.eval(lRow)
          val lts = lTsExpr.eval(lRow).asInstanceOf[Long]
          while (rHas && (keyOrd.compare(rKey, lk) < 0 ||
            (keyOrd.compare(rKey, lk) == 0 && rTs <= lts))) {
            if (keyOrd.compare(rKey, lk) == 0) {
              heldKey = rKey; heldPayload = rPayload; heldSet = true
            }
            advanceRight()
          }
          val v =
            if (heldSet && keyOrd.compare(heldKey, lk) == 0) heldPayload
            else null
          payloadRow.update(0, v)
          resultProj(joined(lRow, payloadRow))
        }
      }
    }
  }

  /** DataFrame API over the native operator — resolves the named
    * columns, installs the strategy once per session (idempotent, the
    * [[BinnedRangeJoinRule]] pattern), and returns left ++ the as-of
    * payload column. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCol: String,
      as: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    // synchronized: the install is a read-modify-write on a plain Seq,
    // and Bench's warmup pass constructs queries concurrently
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val p = attr(rPlan, payloadCol)
    // key dtype must match across sides — a mismatch would otherwise
    // surface later as a ClassCastException in the interpreted ordering
    require(attr(lPlan, keyCol).dataType == attr(rPlan, keyCol).dataType,
      s"key types must match across sides: " +
        s"${attr(lPlan, keyCol).dataType} vs ${attr(rPlan, keyCol).dataType}")
    val node = AsOfJoinNode(lPlan, rPlan, keyCol, leftTs, rightTs,
      payloadCol, AttributeReference(as, p.dataType, nullable = true)())
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }
}
