package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word n-gram shingles as a native codegen'd Catalyst expression.
 *
 * The composable form (`transform(sequence(...), i -> concat_ws(slice(...)))`)
 * is semantically right but ~40× slower at scale: Spark evaluates lambda
 * higher-order functions interpretively (per element, with array copies per
 * `slice`). Shingling sits on the hot path of every dedup operator, so it
 * gets the custom-Expression treatment (SURVEY.md §7 preference order (b)):
 * one tight loop per row, no shuffle, fused into whole-stage codegen.
 *
 * Input must already be normalized (see TextOps.normalize); tokens are
 * space-separated.
 */
case class WordShingles(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingle($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Invoked from generated code — keep signature stable. `distinct`
    * gates the set semantics: dedup/novelty want the distinct shingle
    * SET, the BPE pair census wants every adjacent occurrence. */
  def shingle(s: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val words = s.toString.split(' ').filter(_.nonEmpty)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet: distinct with deterministic first-occurrence order;
    // plain list in occurrence mode
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](words.length - n + 1)
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  def word_shingles(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordShingles(GraftBridge.toExpression(c), n))

  /** Every adjacent word n-gram occurrence (non-distinct). */
  def word_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(
      WordShingles(GraftBridge.toExpression(c), n, distinct = false))
}
