package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Soft-EM machinery for the unigram tokenizer (Kudo 2018 §3.2 — the
  * full SentencePiece recipe beside [[UnigramImpl]]'s deterministic
  * hard-EM):
  *
  *  - [[expect]] runs forward–backward over one word's segmentation
  *    LATTICE and returns the EXPECTED count of every vocabulary
  *    piece under the current model — the soft E-step's per-word
  *    sufficient statistics, computed row-locally so the E-step stays
  *    one narrow pass over the (word, count) table.
  *  - [[pruneLoss]] returns, for each piece on the word's Viterbi
  *    path, the likelihood LOSS if that piece were removed from the
  *    vocabulary (best path vs best path without it) — Kudo's prune
  *    score, so pruning keeps the pieces whose removal hurts most
  *    rather than merely the most-used ones.
  *
  * Both share [[UnigramImpl]]'s lattice conventions exactly: code-
  * point positions, `maxLen` cap, unknown single code points at
  * log P = −100, unknown multi-char pieces excluded. Per-word
  * invariant (spec-pinned): Σ over pieces of expectedCount·pieceLen
  * = word length — every path covers each character exactly once, so
  * the expected char coverage is exact regardless of the model. */
object UnigramSoftImpl {

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Code-point start offsets; offs(n) = word.length. */
  private def offsets(word: String): Array[Int] = {
    val offs = new Array[Int](word.length + 1)
    var n = 0
    var ci = 0
    while (ci < word.length) {
      offs(n) = ci
      n += 1
      ci += Character.charCount(word.codePointAt(ci))
    }
    offs(n) = word.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  private def pieceLp(piece: String, nCp: Int,
      vocab: java.util.HashMap[String, java.lang.Double]): Double = {
    val lp = vocab.get(piece)
    if (lp != null) lp.doubleValue()
    else if (nCp == 1) -100.0
    else Double.NegativeInfinity
  }

  /** Expected piece counts for one word under the current model —
    * (piece, e) pairs sorted by piece, e = Σ over lattice edges
    * spelling the piece of exp(α(j) + lp + β(i) − α(n)). */
  def expect(word: String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[(String, Double)] = {
    if (word.isEmpty) return Array.empty
    val offs = offsets(word)
    val n = offs.length - 1
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (alpha(j) > Double.NegativeInfinity) {
          val lp = pieceLp(word.substring(offs(j), offs(i)), i - j, vocab)
          if (lp > Double.NegativeInfinity)
            alpha(i) = logSumExp(alpha(i), alpha(j) + lp)
        }
        j += 1
      }
      i += 1
    }
    beta(n) = 0.0
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      val hi = math.min(n, j2 + maxLen)
      while (i2 <= hi) {
        if (beta(i2) > Double.NegativeInfinity) {
          val lp = pieceLp(word.substring(offs(j2), offs(i2)), i2 - j2,
            vocab)
          if (lp > Double.NegativeInfinity)
            beta(j2) = logSumExp(beta(j2), lp + beta(i2))
        }
        i2 += 1
      }
      j2 -= 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Array.empty
    val acc = new java.util.TreeMap[String, java.lang.Double]()
    var j3 = 0
    while (j3 < n) {
      if (alpha(j3) > Double.NegativeInfinity) {
        var i3 = j3 + 1
        val hi = math.min(n, j3 + maxLen)
        while (i3 <= hi) {
          if (beta(i3) > Double.NegativeInfinity) {
            val piece = word.substring(offs(j3), offs(i3))
            val lp = pieceLp(piece, i3 - j3, vocab)
            if (lp > Double.NegativeInfinity) {
              val e = math.exp(alpha(j3) + lp + beta(i3) - z)
              val prev = acc.get(piece)
              acc.put(piece,
                if (prev == null) e else prev.doubleValue() + e)
            }
          }
          i3 += 1
        }
      }
      j3 += 1
    }
    val out = new Array[(String, Double)](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val en = it.next()
      out(k) = (en.getKey, en.getValue.doubleValue()); k += 1
    }
    out
  }

  /** Best-path log-likelihood, optionally excluding one piece —
    * [[UnigramImpl.viterbi]]'s DP with the score kept (and the same
    * smallest-j tie behavior, irrelevant here since only the value is
    * used). Returns (bestLl, path pieces) when `excluded` is null;
    * bestLl only otherwise. */
  private def viterbiLl(word: String, offs: Array[Int],
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int,
      excluded: String): (Double, Array[String]) = {
    val n = offs.length - 1
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
          if (excluded == null || piece != excluded) {
            val lp = pieceLp(piece, i - j, vocab)
            if (lp > Double.NegativeInfinity && best(j) + lp > best(i)) {
              best(i) = best(j) + lp
              back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    if (excluded != null || best(n) == Double.NegativeInfinity)
      return (best(n), null)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      out += word.substring(offs(back(k)), offs(k))
      k = back(k)
    }
    (best(n), out.reverseIterator.toArray)
  }

  /** (piece, loss) for each DISTINCT multi-char piece on the word's
    * Viterbi path: loss = bestLl − bestLl-without-that-piece ≥ 0
    * (single chars are never prune candidates — they pin coverage).
    * Sorted by piece. */
  def pruneLoss(word: String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[(String, Double)] = {
    if (word.isEmpty) return Array.empty
    val offs = offsets(word)
    val (ll, path) = viterbiLl(word, offs, vocab, maxLen, null)
    if (path == null) return Array.empty
    val distinct = new java.util.TreeSet[String]()
    var i = 0
    while (i < path.length) {
      // multi-char = more than one CODE POINT (surrogate-safe)
      if (path(i).codePointCount(0, path(i).length) > 1)
        distinct.add(path(i))
      i += 1
    }
    val out = new Array[(String, Double)](distinct.size)
    val it = distinct.iterator()
    var k = 0
    while (it.hasNext) {
      val p = it.next()
      val (alt, _) = viterbiLl(word, offs, vocab, maxLen, p)
      out(k) = (p, ll - alt); k += 1
    }
    out
  }

  private def toArrayData(pairs: Array[(String, Double)]): GenericArrayData = {
    val arr = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      arr(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(pairs(i)._1), pairs(i)._2))
      i += 1
    }
    new GenericArrayData(arr)
  }

  def expectUtf(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData =
    toArrayData(expect(word.toString, vocab, maxLen))

  def pruneLossUtf(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData =
    toArrayData(pruneLoss(word.toString, vocab, maxLen))
}

private[functions] trait UnigramSoftBase extends UnaryExpression {
  def vocab: Seq[(String, Double)]
  def maxLen: Int

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string column, got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false))),
    containsNull = false)

  @transient protected lazy val map: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) =>
      m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }
}

/** Per-word expected piece counts under the current unigram model —
  * the soft E-step ([[UnigramSoftImpl.expect]]). */
case class UnigramExpect(child: Expression,
    vocab: Seq[(String, Double)], maxLen: Int) extends UnigramSoftBase {
  require(maxLen >= 1, "maxLen must be >= 1")
  override def prettyName: String = "unigram_expect"

  override def nullSafeEval(input: Any): Any =
    UnigramSoftImpl.expectUtf(input.asInstanceOf[UTF8String], map, maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramVocab", map,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSoftImpl.expectUtf($c, $mapRef, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-word Viterbi-path prune losses — Kudo's prune score
  * ([[UnigramSoftImpl.pruneLoss]]). */
case class UnigramPruneLoss(child: Expression,
    vocab: Seq[(String, Double)], maxLen: Int) extends UnigramSoftBase {
  require(maxLen >= 1, "maxLen must be >= 1")
  override def prettyName: String = "unigram_prune_loss"

  override def nullSafeEval(input: Any): Any =
    UnigramSoftImpl.pruneLossUtf(input.asInstanceOf[UTF8String], map,
      maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramVocab", map,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSoftImpl.pruneLossUtf($c, $mapRef, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
