package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RollingHash.rolling_hash
import graft.functions.TextOps._

/**
 * Text-analysis operators for the training-data pipeline: token counting,
 * quality scoring, marker-based language ID, and content fingerprinting.
 * Everything is a per-row column expression (no aggregation, no shuffle) —
 * at 100 TB these run map-side at scan speed, bounded by parquet decode.
 */
object TextAnalysis {

  /** Whitespace tokens + BPE-ish subword count (word chunks and isolated
    * punctuation as separate tokens, the common pre-tokenizer shape). */
  def tokenStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).as("n_bpe_ish"),
      regexp_count(col("text"), lit("[^\\w\\s]")).as("n_punct"))
      .orderBy(col("doc_id"))

  private val stopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Heuristic quality score in [0,1]: length band, stopword presence,
    * punctuation restraint, mean word length band. Deterministic per-row
    * double math, 6-dp rounded. Token stats via the single-pass codegen'd
    * TokenProfile/TokenSetCount expressions (the size(filter(...)) HOF
    * forms are interpreted per token — ~20× slower measured). */
  def qualityScore(documents: DataFrame): DataFrame = {
    import graft.functions.{TokenProfile, TokenSetCount}
    val prof = TokenProfile.token_profile(normalize(col("text")))
    val nTok = prof.getField("n_tok").cast("double")
    val nStop = TokenSetCount.token_set_count(normalize(col("text")), stopwords)
      .cast("double")
    val nPunct = regexp_count(col("text"), lit("[^\\w\\s]")).cast("double")
    val nChars = length(col("text")).cast("double")
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(0.0)
    val punctRatio = when(nChars > 0, nPunct / nChars).otherwise(0.0)
    val meanWordLen = when(nTok > 0,
      prof.getField("sum_len").cast("double") / nTok)
      .otherwise(0.0)
    val lenScore = least(nChars / 200.0, lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 10.0)
    val wordLenScore = when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 1.0)
      .otherwise(0.5)
    documents.select(
      col("doc_id"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(meanWordLen, 6).as("mean_word_len"),
      round((lenScore + stopScore + punctScore + wordLenScore) / 4.0, 6)
        .as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Marker words per language for the rule-based classifier. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "et", "les", "des", "est"),
    "es" -> Seq("el", "y", "los", "de", "es"))

  /** Rule-based language ID: argmax of marker-word hits, ties broken by the
    * declared language order, "und" when nothing matches. (An n-gram model
    * would train on labeled text; the operator shape — per-row scoring at
    * scan speed — is what matters at 100 TB.) */
  def langId(documents: DataFrame): DataFrame = {
    import graft.functions.TokenSetCount
    def score(markers: Seq[String]): Column =
      TokenSetCount.token_set_count(normalize(col("text")), markers)
    val scored = langMarkers.map { case (lang, m) => lang -> score(m) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first-match-wins in declaration order (en > de > fr > es)
    val pred = scored.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
    documents.select(col("doc_id"),
      scored.head._2.as("hits_en"), pred.as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint via the custom RollingHash Catalyst expression
    * (codegen'd, SURVEY.md §7 custom-Expression track) over normalized text. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      rolling_hash(normalize(col("text"))).as("fingerprint"))
      .orderBy(col("doc_id"))
}
