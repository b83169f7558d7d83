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

  /** Distinct word n-gram shingles (default 3) of the normalized text.
    * Backed by the codegen'd WordShingles expression — the equivalent
    * `transform(sequence, i -> concat_ws(slice(...)))` composition is ~40×
    * slower (interpreted lambdas + per-slice array copies) on the dedup hot
    * path. */
  def shingles(text: Column, n: Int = 3): Column =
    WordShingles.word_shingles(normalize(text), n)
}
