package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Document cross-entropy under a bounded Kneser–Ney bigram model —
  * the native form of the streaming perplexity gate's scoring
  * ([[graft.streaming.IngestGate.knScoreCols]]): whitespace-tokenize,
  * count the document's distinct token bigrams, and sum n·lnp in
  * SORTED bigram order (the same products, in the same order, as the
  * Column-level sorted run-length fold and — up to addition order the
  * e6 floor absorbs — the batch t13 (doc,w1,w2)-grouped aggregation).
  *
  * The bounded model ships as expression literals (topN-bounded — the
  * BpeEncodeTokens convention) and becomes a per-instance transient
  * HashMap, so each transition lookup is O(1); a `typedLit` map would
  * be scanned LINEARLY per lookup (Spark's literal MapData has no
  * hash index — measured 21 s for a 100k-doc gate pass at topN 2000
  * vs 1.8 s with this expression). Transitions outside the model
  * floor to `lnUnseen` (the model-wide min lnp — the gate's ⊆
  * contract).
  */
object KnScoreImpl {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** (n_bigrams, xent_e6) for one document. */
  def score(text: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      lnUnseen: Double): InternalRow = {
    val words0 = ws.split(text.toString.trim, -1)
    var nTok = 0
    var i = 0
    while (i < words0.length) {
      if (words0(i).nonEmpty) {
        words0(nTok) = words0(i); nTok += 1
      }
      i += 1
    }
    if (nTok < 2)
      return new GenericInternalRow(Array[Any](0L, 0L))
    val m = nTok - 1
    val counts = new java.util.HashMap[String, Array[Double]](m * 2)
    i = 0
    while (i < m) {
      val key = words0(i) + " " + words0(i + 1)
      val c = counts.get(key)
      if (c == null) counts.put(key, Array(1.0)) else c(0) += 1.0
      i += 1
    }
    val keys = new Array[String](counts.size)
    counts.keySet.toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    var s = 0.0
    i = 0
    while (i < keys.length) {
      val lp = vocab.get(keys(i))
      val lnp = if (lp == null) lnUnseen else lp.doubleValue()
      s += counts.get(keys(i))(0) * lnp
      i += 1
    }
    val xentE6 = math.floor(-s / m.toDouble * 1000000.0).toLong
    new GenericInternalRow(Array[Any](m.toLong, xentE6))
  }
}

/** Per-document (n_bigrams, xent_e6) under a bounded KN model — see
  * [[KnScoreImpl]]. */
case class KnScore(child: Expression, bigrams: Seq[(String, Double)],
    lnUnseen: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kn_score needs a string column, got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("xent_e6", LongType, nullable = false)))
  override def prettyName: String = "kn_score"

  @transient private lazy val map: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      bigrams.size * 2)
    bigrams.foreach { case (g, lp) =>
      m.put(g, java.lang.Double.valueOf(lp)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    KnScoreImpl.score(input.asInstanceOf[UTF8String], map, lnUnseen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("knVocab", map,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KnScoreImpl.score($c, $mapRef, $lnUnseen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
