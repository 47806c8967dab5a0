package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Diacritic removal — NFD decomposition, drop combining marks,
  * recompose (é→e, ü→u, Č→C; characters without a decomposition pass
  * through). The standard first step of CCNet-style text
  * normalization before fingerprinting/dedup, matching DuckDB's
  * `strip_accents` on Latin-script text (the oracle domain). Kept
  * native (not a UDF) so it fuses into whole-stage codegen with the
  * rest of [[graft.operators.Curation.normalizedText]]'s pipeline. */
object StripAccentsImpl {
  private val Marks = "\\p{Mn}+".r

  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: pure ASCII needs no decomposition scan
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      // NFC at the end recomposes what NFD pulled apart beyond the
      // dropped marks (Hangul syllables decompose to conjoining Jamo,
      // category Lo, which mark-stripping alone would leave
      // decomposed — changing text that carries no accents at all)
      java.text.Normalizer.normalize(
        Marks.replaceAllIn(
          java.text.Normalizer.normalize(str,
            java.text.Normalizer.Form.NFD), ""),
        java.text.Normalizer.Form.NFC))
  }
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"strip_accents needs a string column, got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    StripAccentsImpl.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StripAccentsImpl.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
