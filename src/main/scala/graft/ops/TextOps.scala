package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * expressed with codegen'd built-in functions wherever possible (no
  * UDFs in the hot path → whole-stage codegen keeps these in one stage).
  * All operate on the `documents(doc_id, text, lang, source, n_chars)`
  * table.
  */
object TextOps {

  /** Whitespace token count — pure Column expression (codegen'd). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count approximation: words + punctuation runs.
    * (Lookahead-based split — Java-regex only; prefer [[bpeTokenCount]],
    * whose pattern is RE2-compatible and therefore oracle-checkable.) */
  def subwordCount(text: Column): Column =
    size(split(text, "(?=[\\p{Punct}])|\\s+"))

  /** GPT-2-style pretokenizer pattern, restricted to constructs shared by
    * Java regex and RE2 (no lookahead, no \p classes — the corpus is
    * ASCII): contraction suffixes, space-prefixed letter/digit runs,
    * space-prefixed punctuation runs, whitespace runs. Every character is
    * covered by exactly one leftmost-first alternative, so token counts
    * are engine-independent. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"

  /** BPE-ish token count via the pretokenizer regex — the standard
    * pre-merge token budget estimate for training-data curation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Quality score in [0,1]: length band + punctuation ratio + stopword
    * hit rate + uppercase ratio. Deterministic arithmetic reproducible in
    * ANSI SQL for the DuckDB oracle. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val punctRatio = punct / greatest(len, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))
    val spaces = length(regexp_replace(text, "[^ ]", "")).cast("double")
    val wordScore = least(spaces / lit(50.0), lit(1.0))
    round((lenScore + punctScore + wordScore) / lit(3.0), 6)
  }

  /** n-gram-heuristic language ID over the `documents` table: scores a
    * handful of high-frequency function words per language. Pure SQL
    * expression (CASE over regexp counts) — reproducible in DuckDB. */
  def langId(text: Column): Column = {
    def hits(words: Seq[String]): Column = {
      val pattern = "(?i)\\b(" + words.mkString("|") + ")\\b"
      size(split(text, pattern)) - 1
    }
    val en = hits(Seq("the", "and", "of", "to", "is"))
    val de = hits(Seq("der", "die", "und", "ist", "nicht"))
    val fr = hits(Seq("le", "la", "et", "est", "les"))
    val es = hits(Seq("el", "los", "es", "una", "que"))
    when(de >= greatest(en, fr, es) && de > 0, "de")
      .when(fr >= greatest(en, es) && fr > 0, "fr")
      .when(es >= en && es > 0, "es")
      .when(en > 0, "en")
      .otherwise("unknown")
  }

  /** 64-bit document fingerprint (xxhash64 of normalized text) — the
    * rolling-hash document signature used for exact-dup detection at
    * scale; shuffle key is an 8-byte long, not the document body. */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "\\s+", " ")))

  /** documents enriched with all per-row text metrics — single narrow
    * projection over the scan (verify with .explain: one WholeStageCodegen). */
  def enrich(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fp"))
}
