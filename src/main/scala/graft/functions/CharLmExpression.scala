package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native packed character-bigram counts — the t12 explode collapser.
  *
  * The char-LM pipeline ([[graft.operators.Curation.charLmScore]])
  * previously exploded one row per bigram OCCURRENCE — 2× corpus
  * characters through two Generate stages, and the round-11 sf10
  * profile showed the whole query bound by pushing those ~300 M rows
  * through partial aggregation and the broadcast-join scoring tail
  * (model 6.1 s / full 19.9 s at sf10; scan is 0.6 s). This
  * expression emits each document's DISTINCT grams with their counts
  * in ONE native pass (the WordShingles lesson: a HOF `transform`
  * under a Generate is also re-evaluated per output row), so both
  * downstream passes process per-document distinct rows — already
  * partially aggregated — instead of raw occurrences.
  *
  * Bigram semantics are EXACTLY
  * [[graft.operators.Curation.charBigrams]] (`substr(text, i, 2)` for
  * i in 1..max(len−1, 1), code-point based): a 0/1-char document
  * contributes its whole text as one gram. Counts sum to that m.
  * Map iteration order is first-appearance; downstream float sums
  * absorb ordering in the e6 decimal cut exactly as the cross-engine
  * oracle convention already does.
  */
object CharLmImpl {

  /** (gram → occurrence count) for one document, first-appearance
    * order. */
  def bigramCounts(text: UTF8String): ArrayBasedMapData = {
    val n = text.numChars()
    val m = math.max(n - 1, 1)
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 1
    while (i <= m) {
      val g = text.substringSQL(i, 2)
      counts.put(g, counts.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  /** Register `char_bigram_counts(text)` (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_bigram_counts", exprs => CharBigramCounts(exprs.head),
      "built-in")
}

/** `char_bigram_counts(text): map<string, bigint>` — see
  * [[CharLmImpl.bigramCounts]]. */
case class CharBigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_bigram_counts needs a string column, got $other")
    }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_bigram_counts"

  override def nullSafeEval(input: Any): Any =
    CharLmImpl.bigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharLmImpl.bigramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
