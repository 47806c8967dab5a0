package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Banded-Hamming near-duplicate membership test against a broadcast
  * fingerprint index — the native form of
  * [[graft.streaming.IngestGate.phashGateExact]]'s per-image check:
  * derive the image's band keys (the [[graft.operators.Dedup.bandKeys64]]
  * derivation — `(b << width) | ((fp >> b·width) & mask)`), look each
  * up in a REAL hash index of the lake's banded fingerprints, and
  * confirm any collision with an exact `bitCount(xor) ≤ maxDist`
  * check.
  *
  * Exists for the same reason as [[KnScore]]: the index used to ride
  * the plan as a `typedLit` map, and Spark's literal MapData has no
  * hash index — `element_at` scans ALL entries per lookup, so a
  * 10⁶-image lake made every arriving image scan ~4·10⁶ keys × 4
  * bands. Here the literal pairs build one per-instance transient
  * HashMap (the BpeEncodeTokens convention): per-image work is
  * `bands` O(1) lookups plus the colliding buckets' exact checks —
  * the cost the gate's docstring promises. */
object PhashLookupImpl {
  def nearDup(fp: Long,
      index: java.util.HashMap[java.lang.Long, Array[Long]],
      bands: Int, maxDist: Int): Boolean = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    var b = 0
    while (b < bands) {
      val key = (b.toLong << width) | ((fp >> (b * width)) & mask)
      val fps = index.get(key)
      if (fps != null) {
        var i = 0
        while (i < fps.length) {
          if (java.lang.Long.bitCount(fp ^ fps(i)) <= maxDist)
            return true
          i += 1
        }
      }
      b += 1
    }
    false
  }
}

/** TRUE iff the input 64-bit fingerprint sits within `maxDist`
  * Hamming bits of any indexed lake fingerprint sharing a band —
  * see [[PhashLookupImpl]]. */
case class PhashNearDup(child: Expression,
    index: Seq[(Long, Seq[Long])], bands: Int, maxDist: Int)
    extends UnaryExpression {

  require(bands >= 1 && 64 % bands == 0,
    s"bands must divide 64, got $bands")
  require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"phash_near_dup needs a long column, got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "phash_near_dup"

  @transient private lazy val map: java.util.HashMap[java.lang.Long, Array[Long]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Long]](
      index.size * 2)
    index.foreach { case (k, fps) =>
      m.put(java.lang.Long.valueOf(k), fps.toArray) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    PhashLookupImpl.nearDup(input.asInstanceOf[Long], map, bands,
      maxDist)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("phashIndex", map,
      "java.util.HashMap<Long, long[]>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PhashLookupImpl.nearDup($c, $mapRef, $bands, $maxDist)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
