package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for dedup / text-analysis operators. All pure
  * column expressions (codegen'd); normalization is ASCII-conservative so
  * downstream hashing is engine-portable (SQL oracles reproduce it 1:1).
  */
object TextOps {

  /** Lowercase, strip everything but [a-z0-9 ], squeeze whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column =
    filter(split(normalize(text), " "), t => length(t) > 0)

  /** Distinct word n-gram shingles (default 3) of the normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    array_distinct(
      when(count > 0,
        transform(sequence(lit(0), count - 1),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array()))
  }
}
