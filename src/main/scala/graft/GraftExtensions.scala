package graft

import org.apache.spark.sql.{Column, GraftColumns, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** The engine's SQL surface: one `SparkSessionExtensions` hook that
  * registers every graft primitive with the session's function
  * registry, so the whole library is reachable from `spark.sql` (and
  * thus JDBC/BI clients) with zero Scala code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT simhash60(text), graft_lang_id(text) FROM documents
  * }}}
  *
  * Two kinds of entries, both analysis-time (never UDFs):
  *
  *   - the native codegen'd expressions ([[SimHash60]],
  *     [[WordShingles]], [[MinHashSignature]], [[FloatDotProduct]]) —
  *     same names as their session-local `ShinglesImpl.register`-style
  *     helpers, so SQL text is portable between the two routes;
  *   - the composite text-analysis functions (`graft_token_count`,
  *     `graft_quality_score`, `graft_lang_id`, `graft_fingerprint`) —
  *     these inline the [[TextAnalysis]] Column trees into the plan at
  *     resolution, so they fold into whole-stage codegen exactly like
  *     the Column API and Catalyst can prune/push through them.
  *
  * Parameter-heavy expressions whose arguments are matrices (IVF
  * centroids, RHP planes) stay Column-API-only by design — see the
  * rationale in [[org.apache.spark.sql.GraftColumns]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private def litInt(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got $other")
  }

  private def checkArity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n argument(s), got ${args.length}")

  /** A registry entry: `name(args...)` built by `b` with fixed arity. */
  private def entry(name: String, arity: Int, usage: String)(b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "built-in"),
      args => { checkArity(name, arity, args); b(args) })

  /** Wrap a Column→Column composite as an analysis-time expression
    * builder: the function's whole expression tree replaces the call
    * site, identical to writing the Column API form by hand. */
  private def composite(f: Column => Column): Builder =
    args => GraftColumns.resolvedExpression(f(GraftColumns.column(args.head)))

  /** Everything [[GraftExtensions]] injects. Exposed so tests can
    * assert the inventory. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    entry("simhash60", 1,
      "simhash60(text) - 60-bit SimHash fingerprint of a document") {
      args => SimHash60(args.head) },
    entry("word_shingles", 2,
      "word_shingles(text, k) - array of word k-shingles") { args =>
      WordShingles(args.head, litInt("word_shingles", args(1))) },
    entry("minhash_sig", 2,
      "minhash_sig(shingles, n) - n-element MinHash signature") { args =>
      MinHashSignature(args.head, litInt("minhash_sig", args(1))) },
    entry("dotf", 2,
      "dotf(a, b) - dot product of two float/double arrays") { args =>
      FloatDotProduct(args.head, args(1)) },
    entry("graft_token_count", 1,
      "graft_token_count(text) - whitespace token count") {
      composite(TextAnalysis.tokenCount) },
    entry("graft_quality_score", 1,
      "graft_quality_score(text) - [0,1] heuristic quality score") {
      composite(TextAnalysis.qualityScore) },
    entry("graft_lang_id", 1,
      "graft_lang_id(text) - stopword-profile language guess") {
      composite(TextAnalysis.langId) },
    entry("graft_fingerprint", 1,
      "graft_fingerprint(text) - normalized-vocabulary md5 fingerprint") {
      composite(TextAnalysis.fingerprint) },
    entry("ascii_keep_lower", 1,
      "ascii_keep_lower(text) - lower(text) restricted to [a-z0-9 ]") {
      args => AsciiKeepLower(args.head) },
    entry("bpe_token_count", 1,
      "bpe_token_count(text) - letter runs + digit runs + symbols") {
      args => BpeTokenCount(args.head) })
}
