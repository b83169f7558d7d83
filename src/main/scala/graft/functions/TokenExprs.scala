package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass token statistics over normalized (space-separated) text as
 * codegen'd expressions — the text-quality/language-ID hot path. The
 * composable `size(filter(split(...), lambda))` forms are interpreted per
 * token per lambda (measured ~1 ms/doc); these run one scan per row.
 */

/** struct(n_tok INT, sum_len LONG): token count and total token length. */
case class TokenProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenProfile.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenProfile.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenProfile.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)

  override def prettyName: String = "token_profile"
}

object TokenProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false)))

  /** Invoked from generated code — keep signature stable. */
  def profile(u: UTF8String): InternalRow = {
    val s = u.toString
    var nTok = 0
    var sumLen = 0L
    var runLen = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') {
        if (runLen > 0) { nTok += 1; sumLen += runLen; runLen = 0 }
      } else runLen += 1
      i += 1
    }
    if (runLen > 0) { nTok += 1; sumLen += runLen }
    new GenericInternalRow(Array[Any](nTok, sumLen))
  }

  def token_profile(c: Column): Column =
    GraftBridge.toColumn(TokenProfile(GraftBridge.toExpression(c)))
}

/** Count of tokens that belong to a fixed set (stopwords, language
  * markers). The set travels as a codegen reference object. */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    tokens.foreach(s.add)
    s
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetCount.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)

  override def prettyName: String = "token_set_count"
}

object TokenSetCount {

  /** Invoked from generated code — keep signature stable. */
  def count(u: UTF8String, set: java.util.HashSet[String]): Int = {
    val s = u.toString
    var n = 0
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start && set.contains(s.substring(start, i))) n += 1
        start = i + 1
      }
      i += 1
    }
    n
  }

  def token_set_count(c: Column, tokens: Seq[String]): Column =
    GraftBridge.toColumn(TokenSetCount(GraftBridge.toExpression(c), tokens))
}
