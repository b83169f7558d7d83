package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns. Deterministic
  * left-to-right double accumulation (stable across engines and runs,
  * unlike a shuffled float reduce); the inner product is the codegen'd
  * VectorDot expression — the equivalent `aggregate(zip_with(...))`
  * composition is interpreted per element and ~50× slower on the
  * similarity hot path.
  */
object VectorOps {

  /** Dot product in double precision (float inputs upcast per element). */
  def dot(a: Column, b: Column): Column = VectorDot.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null rather than
    * ±Inf/NaN under ANSI). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn =!= 0.0, d / nn)
  }
}
