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
    * tokenizer cost. Native one-pass byte scan equal to
    * `size(regexp_extract_all(lower(text), "[a-z]+|[0-9]+|[^a-z0-9\\s]"))`
    * — the t1 oracle keeps that regex form; see [[AsciiScanImpl]] for
    * why the regex is 5× slower on executor JVMs. */
  def regexTokenCount(text: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      BpeTokenCount(org.apache.spark.sql.GraftColumns.expression(text)))

  /** Every character the punctuation count treats as NON-punctuation:
    * ASCII letters, digits, and Java regex `\s` = `[ \t\n\x0B\f\r]` —
    * the exact complement of the oracle's `[^a-zA-Z0-9\s]` class. */
  private val NonPunctChars: String =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString +
      " \t\n\u000B\f\r"

  /** Count of punctuation/symbol characters — all chars outside
    * `[a-zA-Z0-9\s]`, counted per code point.
    *
    * Deliberately NOT a regex: `translate` deletes the allowed
    * alphabet in one codegen'd per-char dictionary pass and `length`
    * counts the survivors. The obvious
    * `regexp_extract_all(text, "[^a-zA-Z0-9\\s]")` is 30-50× slower
    * on JDK 17 under a real workload: negated char classes compile to
    * nested `Pattern$BmpCharPredicate` lambda-union chains whose call
    * sites go megamorphic once a JVM has compiled many patterns
    * (thread dumps show all executor CPU inside
    * `BmpCharPredicate.lambda$union$2`), turning a ~70 ns/char scan
    * into ~3.5 µs/char. The DuckDB oracle keeps the regex form; both
    * count the same per-character class. */
  def punctCount(text: Column): Column =
    length(translate(text, NonPunctChars, ""))

  /** Occurrences of `word` as a standalone word (word-boundary match). */
  def wordOccurrences(text: Column, word: String): Column =
    size(regexp_extract_all(lower(text), lit("\\b" + word + "\\b"), lit(0)))

  /** Total occurrences of any of `words` as standalone words, in ONE
    * regex pass (alternation). Equal to the sum of per-word
    * [[wordOccurrences]] — standalone-word matches of distinct words
    * can never overlap — but one scan of the text instead of
    * `words.size`: the t2/t3/x7 hot path dropped ~5× in regex passes
    * when this replaced the per-word sum (sf10 sweep, round 11). */
  def wordSetOccurrences(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit(words.mkString("\\b(", "|", ")\\b")), lit(0)))

  /** Tiny per-language stopword table for the n-gram language heuristic.
    * Order matters: ties resolve to the earlier entry. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "la", "et"),
  )

  /** Stopword-hit score for one language (one alternation pass). */
  def langScore(text: Column, lang: String): Column =
    wordSetOccurrences(text, LangStopwords.toMap.apply(lang))

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
    val stop = wordSetOccurrences(text, LangStopwords.flatMap(_._2))
      .cast("double")
    val punct = punctCount(text).cast("double")
    val chars = length(text).cast("double")
    least(lit(1.0), nTok / 100.0) * 0.4 +
      (stop / nTok) * 0.3 +
      (lit(1.0) - punct / chars) * 0.3
  }

  /** Syllable estimate: count of maximal ASCII-vowel runs (`[aeiouy]+`
    * over `lower(text)`) — the standard cheap proxy ("every vowel group
    * is one syllable"). Native one-pass byte scan ([[VowelRunCount]]);
    * the t11 oracle keeps the regex form. */
  def syllableCount(text: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      VowelRunCount(org.apache.spark.sql.GraftColumns.expression(text)))

  /** Sentence estimate: count of maximal terminator runs (`[.!?]+`),
    * so ellipses and "?!" count once. Native scan
    * ([[SentenceRunCount]]); the t11 oracle keeps the regex form. */
  def sentenceCount(text: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      SentenceRunCount(org.apache.spark.sql.GraftColumns.expression(text)))

  /** Flesch reading-ease over the whitespace/vowel-run/terminator-run
    * estimates: `206.835 − 1.015·words/sentences − 84.6·syllables/words`.
    * Zero denominators clamp to 1 (empty or unpunctuated documents get
    * a defined score instead of NULL/∞) — the oracle applies the same
    * `greatest(_, 1)` clamps. The absolute value matters less than
    * that it is deterministic, cheap, and monotone in sentence and
    * word complexity — it is a FILTER SIGNAL (cut long-sentence,
    * high-syllable boilerplate), not a certified readability grade. */
  def fleschScore(text: Column): Column = {
    val words = greatest(tokenCount(text), lit(1)).cast("double")
    val sents = greatest(sentenceCount(text), lit(1)).cast("double")
    val sylls = syllableCount(text).cast("double")
    lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (sylls / words)
  }

  /** Normalization-key fingerprint (OpenRefine-style): lowercase, strip
    * non-alphanumerics, sorted distinct tokens, md5. Two documents with
    * the same fingerprint are permutation/punctuation duplicates.
    * The normalizer is the native [[AsciiKeepLower]] byte scan, equal
    * to `regexp_replace(lower(text), "[^a-z0-9 ]", "")` (the t4 oracle
    * keeps the regex form) — see [[AsciiScanImpl]] for the JDK-17
    * negated-class pathology it avoids (25 s → sub-second at sf10). */
  def fingerprint(text: Column): Column =
    md5(array_join(
      array_sort(array_distinct(
        split(trim(org.apache.spark.sql.GraftColumns.column(
          AsciiKeepLower(org.apache.spark.sql.GraftColumns.expression(text)))),
          " +"))),
      " "))
}
