package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns as pure Catalyst
  * higher-order functions (`zip_with`/`aggregate`) — codegen-friendly, no
  * UDFs, deterministic left-to-right summation (stable across engines and
  * runs, unlike a shuffled float reduce).
  */
object VectorOps {

  /** Dot product in double precision (float inputs upcast per element). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null rather than
    * ±Inf/NaN under ANSI). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn =!= 0.0, d / nn)
  }
}
