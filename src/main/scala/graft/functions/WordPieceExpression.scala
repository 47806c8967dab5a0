package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece encode — BERT's greedy longest-match-first word
  * segmenter (Schuster & Nakajima 2012; the WordPieceTokenizer shape
  * published with BERT) under a trained "##"-continuation vocabulary.
  *
  * Per word: at the word start, the LONGEST vocabulary piece matching
  * a prefix wins; at every later position, the longest
  * "##"-continuation piece; a position with no match collapses the
  * whole word to ["[UNK]"]. Matching is code-point-aware (the unit
  * Spark's length/substr and the DuckDB oracle index by), longest
  * lengths are probed first (one hash-set probe per candidate length,
  * capped at the vocabulary's own longest piece), and the bounded
  * per-task word→tokens memo collapses Zipfian repeat cost exactly as
  * [[BpeEncoder]] does. The vocabulary rides as an expression literal
  * — bounded driver/model state, never a join side — keeping the
  * corpus pass occurrence-local and shuffle-free.
  *
  * Piece classification (shared verbatim with the oracle replay): a
  * piece is a continuation iff it starts with "##" AND has content
  * after the marker; corpora whose words contain literal '#' can
  * alias the marker — the standard WordPiece ambiguity.
  */
class WordPieceEncoder(vocab: Array[String]) extends Serializable {

  @transient private lazy val initSet = {
    val s = new java.util.HashSet[String]()
    vocab.foreach { p => if (!isCont(p)) s.add(p) }
    s
  }
  @transient private lazy val contSet = {
    val s = new java.util.HashSet[String]()
    vocab.foreach { p => if (isCont(p)) s.add(p.substring(2)) }
    s
  }
  // longest candidate worth probing, in code points, per position kind
  @transient private lazy val maxInit =
    vocab.iterator.filter(!isCont(_)).map(cpLen).foldLeft(0)(math.max)
  @transient private lazy val maxCont =
    vocab.iterator.filter(isCont).map(p => cpLen(p.substring(2)))
      .foldLeft(0)(math.max)

  private def isCont(p: String): Boolean =
    p.startsWith("##") && p.length > 2
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  // per-task after deserialization (tasks are single-threaded); bounded
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()
  private val maxCacheEntries = 1 << 16

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  private val Unk = "[UNK]"

  /** All tokens of one document, word by word in order. */
  def encodeText(text: UTF8String): GenericArrayData = {
    val words = ws.split(text.toString, -1)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var toks = cache.get(w)
        if (toks == null) {
          toks = encodeWord(w)
          if (cache.size() < maxCacheEntries) cache.put(w, toks)
        }
        var j = 0
        while (j < toks.length) { out.add(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  private def encodeWord(w: String): Array[UTF8String] = {
    // char offset of each code point; offs(ncp) = w.length
    val offs = new Array[Int](w.codePointCount(0, w.length) + 1)
    var ci = 0; var cp = 0
    while (ci < w.length) {
      offs(cp) = ci
      ci += Character.charCount(w.codePointAt(ci))
      cp += 1
    }
    offs(cp) = w.length
    val ncp = cp
    val toks = new java.util.ArrayList[String]()
    var pos = 0
    while (pos < ncp) {
      val init = pos == 0
      var len = math.min(if (init) maxInit else maxCont, ncp - pos)
      var hit: String = null
      while (len >= 1 && hit == null) {
        val sub = w.substring(offs(pos), offs(pos + len))
        if (if (init) initSet.contains(sub) else contSet.contains(sub))
          hit = sub
        else len -= 1
      }
      if (hit == null)
        return Array(UTF8String.fromString(Unk))
      toks.add(if (init) hit else "##" + hit)
      pos += len
    }
    val out = new Array[UTF8String](toks.size())
    var j = 0
    while (j < toks.size()) {
      out(j) = UTF8String.fromString(toks.get(j)); j += 1
    }
    out
  }
}

/** `wordpiece_encode_tokens(text): array<string>` — see
  * [[WordPieceEncoder]]. */
case class WordPieceEncodeTokens(child: Expression,
    vocab: Seq[String]) extends UnaryExpression {

  private val encoder = new WordPieceEncoder(vocab.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode_tokens needs a string column, got $other")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode_tokens"

  override def nullSafeEval(input: Any): Any =
    encoder.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncoder", encoder,
      classOf[WordPieceEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
