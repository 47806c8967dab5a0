package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass byte scans replacing the negated-char-class
  * regexes of the text-analysis surface.
  *
  * Why not regex: on JDK 17, `java.util.regex` compiles char classes
  * like `[^a-z0-9 ]` into nested `Pattern$BmpCharPredicate` lambda
  * unions. Each `.is(ch)` call site is a lambda invocation that goes
  * MEGAMORPHIC once the JVM has compiled many distinct patterns (every
  * Spark executor JVM has), and the JIT stops inlining it — thread
  * dumps of the sf10 sweep showed all executor CPU inside
  * `BmpCharPredicate.lambda$union$2`, ~3.5 µs/char where a clean-JVM
  * microbench of the same pattern runs 70 ns/char. A hand-rolled byte
  * loop over the UTF8String is immune and ~100× faster; the DuckDB
  * oracles keep the regex forms (RE2 has no such pathology), so a
  * green t1/t4 row proves the scan is character-for-character
  * equivalent to the regex.
  *
  * Both scans are ASCII-exact and treat any non-ASCII CODE POINT
  * (lead byte ≥ 0xC0; continuation bytes skipped) as a single
  * non-matching character, which is what the per-char regex classes
  * do. One-to-many exotic lowercasings (e.g. İ → i̇) can diverge from
  * the lower()-then-regex form; ASCII corpora are exact.
  */
object AsciiScanImpl {

  /** Java regex `\s`: space, \t, \n, \x0B, \f, \r. */
  private def isSpace(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** `lower(text)` with everything outside `[a-z0-9 ]` deleted, in one
    * byte pass — the fingerprint normalizer
    * (`regexp_replace(lower(text), "[^a-z0-9 ]", "")`). */
  def keepLowerAlnumSpace(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' ') {
        out(n) = b.toByte; n += 1
      } else if (b >= 'A' && b <= 'Z') {
        out(n) = (b + 32).toByte; n += 1
      }
      // digits/letters handled; everything else (incl. non-ASCII) drops
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  /** Count of `[a-z]+|[0-9]+|[^a-z0-9\s]` matches over `lower(text)`,
    * in one byte pass: a letter run and a digit run count once at
    * their first char; every other non-space code point counts
    * individually (exactly the regex's leftmost-greedy alternation). */
  def bpeTokenCount(text: UTF8String): Int = {
    val bytes = text.getBytes
    var i = 0
    var count = 0
    // 0 = space/none, 1 = letter run, 2 = digit run
    var prev = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b >= 0x80) {
        if (b >= 0xC0) { count += 1; prev = 0 } // non-ASCII lead byte
        // continuation bytes: skip
      } else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        if (prev != 1) count += 1
        prev = 1
      } else if (b >= '0' && b <= '9') {
        if (prev != 2) count += 1
        prev = 2
      } else if (isSpace(b)) {
        prev = 0
      } else {
        count += 1
        prev = 0
      }
      i += 1
    }
    count
  }

  /** Count of maximal runs of ASCII vowels (`[aeiouy]`, either case) —
    * the classic one-pass syllable estimate (`[aeiouy]+` match count
    * over `lower(text)`; the t11 oracle keeps that regex form).
    * Non-ASCII code points and every other character break a run. */
  def vowelRunCount(text: UTF8String): Int = {
    val bytes = text.getBytes
    var i = 0
    var count = 0
    var inRun = false
    while (i < bytes.length) {
      val b = (bytes(i) & 0xFF) | 0x20 // ASCII lowercase; >=0x80 unaffected
      val v = b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u' ||
        b == 'y'
      if (v) { if (!inRun) count += 1; inRun = true }
      else if ((bytes(i) & 0xFF) < 0x80 || (bytes(i) & 0xFF) >= 0xC0) {
        inRun = false // any full code point that is not a vowel
      } // UTF-8 continuation bytes: skip, keep run state
      i += 1
    }
    count
  }

  /** Count of maximal runs of sentence terminators (`[.!?]+` match
    * count — the t11 oracle keeps the regex form). "One sentence" per
    * terminator run, so "end... Next!" counts 2, not 5. */
  def sentenceRunCount(text: UTF8String): Int = {
    val bytes = text.getBytes
    var i = 0
    var count = 0
    var inRun = false
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      val t = b == '.' || b == '!' || b == '?'
      if (t) { if (!inRun) count += 1; inRun = true }
      else if (b < 0x80 || b >= 0xC0) inRun = false
      i += 1
    }
    count
  }

  /** Register all scans as SQL functions (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_keep_lower", exprs => AsciiKeepLower(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count", exprs => BpeTokenCount(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vowel_run_count", exprs => VowelRunCount(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sentence_run_count", exprs => SentenceRunCount(exprs.head),
      "built-in")
  }
}

/** `lower(text)` restricted to `[a-z0-9 ]` — see
  * [[AsciiScanImpl.keepLowerAlnumSpace]]. */
case class AsciiKeepLower(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ascii_keep_lower needs a string column, got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_keep_lower"

  override def nullSafeEval(input: Any): Any =
    AsciiScanImpl.keepLowerAlnumSpace(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiScanImpl.keepLowerAlnumSpace($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Syllable-estimate vowel-run count — see
  * [[AsciiScanImpl.vowelRunCount]]. */
case class VowelRunCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vowel_run_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vowel_run_count"

  override def nullSafeEval(input: Any): Any =
    AsciiScanImpl.vowelRunCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiScanImpl.vowelRunCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sentence-terminator run count — see
  * [[AsciiScanImpl.sentenceRunCount]]. */
case class SentenceRunCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sentence_run_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sentence_run_count"

  override def nullSafeEval(input: Any): Any =
    AsciiScanImpl.sentenceRunCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiScanImpl.sentenceRunCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-ish token count — see [[AsciiScanImpl.bpeTokenCount]]. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count needs a string column, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    AsciiScanImpl.bpeTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AsciiScanImpl.bpeTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
