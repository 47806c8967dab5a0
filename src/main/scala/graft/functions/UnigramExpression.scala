package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram piece LM (Kudo
  * 2018, arXiv:1804.10959 — the SentencePiece unigram model): the
  * piece sequence maximizing Σ log P(piece), computed by the classic
  * left-to-right DP.
  *
  * DETERMINISM CONTRACT (the trainer's E-step and the spec's by-hand
  * model replay it exactly):
  *  - candidate split points are scanned j = i−maxLen … i−1 and a
  *    candidate replaces the incumbent only when STRICTLY better, so
  *    likelihood ties resolve to the SMALLEST j — the longest piece
  *    ending at i;
  *  - a character not covered by any piece falls back to a synthetic
  *    single-char piece at log P = −100 (unknown-character penalty),
  *    so every word segments totally.
  *
  * The vocabulary ships as expression literals (vocabSize-bounded —
  * the BpeEncodeTokens convention): a per-instance transient hash map
  * makes each lookup O(1), and the whole evaluation is one codegen'd
  * static call. */
object UnigramImpl {
  /** DP over [0, n] CODE POINTS (not Java chars: an astral character
    * must fall back as one unknown piece, never two lone surrogates,
    * and `maxLen` must mean the same unit as the Spark-side seed's
    * `length(w)`): best log-prob and backpointer per position. */
  def viterbi(word: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    // code-point start offsets (chars), offs(n) = word.length
    val offs = new Array[Int](word.length + 1)
    var n = 0
    var ci = 0
    while (ci < word.length) {
      offs(n) = ci
      n += 1
      ci += Character.charCount(word.codePointAt(ci))
    }
    offs(n) = word.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(offs(j), offs(i))
          val lp = vocab.get(piece)
          val plp: Double =
            if (lp != null) lp.doubleValue()
            else if (i - j == 1) -100.0 // unknown single code point
            else Double.NegativeInfinity
          if (plp > Double.NegativeInfinity && best(j) + plp > best(i)) {
            best(i) = best(j) + plp
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      out += word.substring(offs(back(k)), offs(k))
      k = back(k)
    }
    out.reverseIterator.toArray
  }

  def viterbiUtf(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData = {
    val segs = viterbi(word.toString, vocab, maxLen)
    val arr = new Array[Any](segs.length)
    var i = 0
    while (i < segs.length) {
      arr(i) = UTF8String.fromString(segs(i)); i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Whole-text encode: whitespace-split (the [[BpeEncodeTokens]]
  * tokenization contract) then per-word Viterbi concatenated in word
  * order — one codegen'd call per document, zero shuffles. */
object UnigramEncodeImpl {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def encodeText(text: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData = {
    val words = ws.split(text.toString.trim, -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val segs = UnigramImpl.viterbi(words(i), vocab, maxLen)
        var j = 0
        while (j < segs.length) {
          out += UTF8String.fromString(segs(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Document-level unigram encode — see [[UnigramEncodeImpl]]. */
case class UnigramEncodeTokens(child: Expression,
    vocab: Seq[(String, Double)], maxLen: Int)
    extends UnaryExpression {

  require(maxLen >= 1, "maxLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_encode needs a string column, got $other")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val map: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeImpl.encodeText(input.asInstanceOf[UTF8String], map,
      maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramVocab", map,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncodeImpl.encodeText($c, $mapRef, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-word Viterbi segmentation under the given (piece, logP)
  * vocabulary — see [[UnigramImpl]]. */
case class UnigramSegment(child: Expression,
    vocab: Seq[(String, Double)], maxLen: Int)
    extends UnaryExpression {

  require(maxLen >= 1, "maxLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_segment needs a string column, got $other")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val map: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    UnigramImpl.viterbiUtf(input.asInstanceOf[UTF8String], map, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramVocab", map,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramImpl.viterbiUtf($c, $mapRef, $maxLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
