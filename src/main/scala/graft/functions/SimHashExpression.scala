package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash of a text column — semantically identical to
  * `Dedup.simhashFromHashes(Dedup.tokenHashes60(text), 60)` (verified
  * by the d11 DuckDB oracle and the CurationSpec brute-force check),
  * but ONE tight JVM loop per document instead of 60 interpreted
  * `aggregate` HOFs over the token-hash array (~5× the whole d11
  * pipeline at sf0.1).
  *
  * 60 bits = first 15 md5 hex digits per token: exactly representable
  * as a signed 64-bit integer in every engine (16 hex digits could
  * overflow), see [[graft.operators.Dedup.tokenHash60]].
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash60 needs a string column, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashImpl.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashImpl {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Tokens are `split(trim(text), \s+)` (Spark semantics — identical
    * to [[ShinglesImpl.shingles]]'s tokenization); per token the hash
    * is the first 15 md5 hex digits (= 7.5 digest bytes) as a long;
    * bit b of the fingerprint is set iff the ±1 balance of token-hash
    * bit b is positive. */
  def simhash60(text: UTF8String): Long = {
    val toks = Ws.split(text.trim.toString, -1)
    val counts = new Array[Int](60)
    val md = digests.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      val h = (((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) |
        ((d(2) & 0xFFL) << 36) | ((d(3) & 0xFFL) << 28) |
        ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
        ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >> 4))
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  /** Register `simhash60(text)` on the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
}
