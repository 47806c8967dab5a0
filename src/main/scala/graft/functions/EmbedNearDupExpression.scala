package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, FloatType}

/** Banded-cosine near-duplicate membership test against a broadcast
  * vector index — the embedding sibling of [[PhashNearDup]] and the
  * row-local form of
  * [[graft.operators.Similarity.incrementalEmbedNewIndexed]]'s match
  * rule: project the arriving vector onto the SAME seeded
  * hyperplanes the lake was banded with ([[RhpImpl.keys]]), look each
  * band key up in a real hash index of the lake's banded vectors, and
  * confirm any collision with the exact cosine the batch path
  * computes ([[IvfImpl.dot]]'s index-order double accumulation).
  *
  * Index layout: `entryKeys(i)` is the band-QUALIFIED key
  * `(band << bits) | key` and `entryVec(i)` the position of that
  * entry's vector in `vecs` — vectors stored once, referenced per
  * band, so a 16-band index costs 16 ints (not 16 vector copies) per
  * lake vector beyond the vectors themselves.
  *
  * NULL semantics mirror the batch probe, not [[RhpBandKeys]]'
  * poisoning: a vector whose length mismatches the planes (or with a
  * null element) produces NO band rows in the batch path and therefore
  * SURVIVES — here it evaluates to false (not a near-dup). */
object EmbedLookupImpl {
  def nearDup(v: ArrayData, planes: Array[Array[Float]], bits: Int,
      index: java.util.HashMap[java.lang.Long, Array[Int]],
      vecs: Array[Array[Float]], threshold: Double): Boolean = {
    val keys = RhpImpl.keys(v, planes, bits)
    if (keys == null) return false // no bands => not a candidate
    val n = v.numElements()
    val q = new Array[Double](n)
    var i = 0
    var qq = 0.0
    while (i < n) {
      q(i) = v.getFloat(i).toDouble
      qq += q(i) * q(i)
      i += 1
    }
    val qNorm = math.sqrt(qq)
    val bands = keys.numElements()
    var b = 0
    while (b < bands) {
      val qual = (b.toLong << bits) | keys.getLong(b)
      val cand = index.get(qual)
      if (cand != null) {
        var c = 0
        while (c < cand.length) {
          val w = vecs(cand(c))
          if (w.length == n) {
            var dot = 0.0
            var ww = 0.0
            var k = 0
            while (k < n) {
              val wk = w(k).toDouble
              dot += q(k) * wk
              ww += wk * wk
              k += 1
            }
            if (dot / (qNorm * math.sqrt(ww)) >= threshold) return true
          }
          c += 1
        }
      }
      b += 1
    }
    false
  }
}

/** TRUE iff the input vector shares a band with some indexed lake
  * vector whose exact cosine reaches `threshold` — see
  * [[EmbedLookupImpl]]. */
case class EmbedNearDup(child: Expression, planes: Array[Array[Float]],
    bits: Int, entryKeys: Array[Long], entryVec: Array[Int],
    vecs: Array[Array[Float]], threshold: Double)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
  // the band-QUALIFIED key is (band << bits) | key: the highest band
  // index (bands−1) must fit above the key's `bits` without touching
  // the sign bit, or keys ALIAS across bands — an aliased collision
  // plus a genuine ≥-threshold cosine would drop a stream vector the
  // batch path keeps, breaking the gate ≡ batch contract (the
  // PhashNearDup bands-divides-64 constraint, generalized)
  require(bits + 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(planes.length - 1, 1).toLong) <= 63,
    s"band-qualified keys overflow a long: ${planes.length} bands x " +
      s"$bits bits alias across bands")
  require(entryKeys.length == entryVec.length,
    "entryKeys and entryVec must be parallel")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"embed_near_dup needs array<float>, got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "embed_near_dup"

  @transient private lazy val map: java.util.HashMap[java.lang.Long, Array[Int]] = {
    val grouped = new java.util.HashMap[java.lang.Long,
      scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < entryKeys.length) {
      val k = java.lang.Long.valueOf(entryKeys(i))
      var buf = grouped.get(k)
      if (buf == null) {
        buf = scala.collection.mutable.ArrayBuffer.empty[Int]
        grouped.put(k, buf)
      }
      buf += entryVec(i)
      i += 1
    }
    val out = new java.util.HashMap[java.lang.Long, Array[Int]](
      grouped.size * 2)
    val it = grouped.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      out.put(en.getKey, en.getValue.toArray)
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    EmbedLookupImpl.nearDup(input.asInstanceOf[ArrayData], planes,
      bits, map, vecs, threshold)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("embedIndex", map,
      "java.util.HashMap<Long, int[]>")
    val planesRef = ctx.addReferenceObj("embedPlanes", planes,
      "float[][]")
    val vecsRef = ctx.addReferenceObj("embedVecs", vecs, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EmbedLookupImpl.nearDup($c, $planesRef, " +
        s"$bits, $mapRef, $vecsRef, $threshold)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
