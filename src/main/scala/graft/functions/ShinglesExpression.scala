package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word k-gram shingles — semantically
  * identical to the HOF formulation in [[graft.operators.Dedup.shingles]]
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i, k)))`
  * over `split(trim(text), "\s+")`), verified equal in
  * MinHashExpressionSpec and by the d2/d3 DuckDB oracles.
  *
  * Why it exists (scale note): interpreted higher-order functions are
  * not just slower per row — when an HOF-bearing projection feeds a
  * `Generate` (explode), Catalyst collapses the projection into the
  * generator's child and the whole interpreted tree is re-evaluated per
  * OUTPUT row. For the LSH pipeline (bands × docs output rows) that
  * multiplied the shingling cost ~7× and dominated the d3 benchmark
  * (~3.5 s of a 3.8 s query at sf0.1). A native expression makes each
  * (re-)evaluation one tight JVM loop and participates in whole-stage
  * codegen via a static call.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs a string column, got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesImpl.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShinglesImpl.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesImpl {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Word k-gram shingles of a text: tokens are `split(trim(text),
    * "\s+")` (Spark semantics: trim removes ASCII spaces, split keeps a
    * single empty token for empty input); shingle i joins tokens
    * [i, i+k) with single spaces; a document shorter than k tokens
    * contributes its whole token sequence as one shingle. */
  def shingles(text: UTF8String, k: Int): GenericArrayData = {
    val toks = Ws.split(text.trim.toString, -1)
    val n = toks.length
    val m = math.max(n - k + 1, 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `word_shingles(text, k)` on the session's function
    * registry (idempotent), mirroring [[MinHashImpl.register]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      { exprs =>
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles k must be an int literal, got $other")
        }
        WordShingles(exprs.head, k)
      },
      "built-in")
}
