package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization counts, quality scoring, language identification and
  * document fingerprinting.
  *
  * All functions are pure `Column` expressions built from Spark built-ins
  * (codegen'd, no UDFs) so they whole-stage-compile and push down —
  * the design constraint is "runs unchanged over 100 TB of `documents`".
  *
  * Mirrors the reference's per-document scalar surface (SURVEY.md §2.7:
  * tokenization rules text_preparation/utils/tokenization.py:10-60,
  * language normalization olive/helpers.py:690-701) generalized to the
  * LLM-pipeline operators the reference lacks.
  */
object TextAnalysis {

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — a cheap, deterministic proxy for subword
    * tokenizer cost. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Count of punctuation/symbol characters. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))

  /** Occurrences of `word` as a standalone word (word-boundary match). */
  def wordOccurrences(text: Column, word: String): Column =
    size(regexp_extract_all(lower(text), lit("\\b" + word + "\\b"), lit(0)))

  /** Tiny per-language stopword table for the n-gram language heuristic.
    * Order matters: ties resolve to the earlier entry. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "la", "et"),
  )

  /** Stopword-hit score for one language. */
  def langScore(text: Column, lang: String): Column =
    LangStopwords.toMap.apply(lang)
      .map(w => wordOccurrences(text, w))
      .reduce(_ + _)

  /** Heuristic language ID: arg-max of per-language stopword hits, ties
    * broken by `LangStopwords` order, "und" (undetermined) when no
    * stopword hits at all. */
  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (l, _) => l -> langScore(text, l) }
    val mx = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(mx > 0 && s === mx, lit(l)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·stopword-ratio + 0.3·(1 − punct-ratio).
    * The exact formula matters less than that it is deterministic, cheap
    * and monotone in "looks like prose". */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stop = LangStopwords.flatMap(_._2)
      .map(w => wordOccurrences(text, w)).reduce(_ + _).cast("double")
    val punct = punctCount(text).cast("double")
    val chars = length(text).cast("double")
    least(lit(1.0), nTok / 100.0) * 0.4 +
      (stop / nTok) * 0.3 +
      (lit(1.0) - punct / chars) * 0.3
  }

  /** Normalization-key fingerprint (OpenRefine-style): lowercase, strip
    * non-alphanumerics, sorted distinct tokens, md5. Two documents with
    * the same fingerprint are permutation/punctuation duplicates. */
  def fingerprint(text: Column): Column =
    md5(array_join(
      array_sort(array_distinct(
        split(trim(regexp_replace(lower(text), "[^a-z0-9 ]", "")), " +"))),
      " "))
}
