package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane sign-LSH band keys of a float-vector
  * column against a fixed ±1 projection matrix — the keying loop of
  * [[graft.operators.Similarity.lshNearDupPairs]].
  *
  * `planes(b*bits + j)` is the hyperplane of band `b`, bit `j`
  * (length = vector dim); the key of band `b` packs the projection
  * signs into a long: bit `j` is set iff `planes(b*bits+j) · v >= 0`,
  * each projection accumulated in index order over doubles (the exact
  * arithmetic of [[FloatDotProduct]], mirrored by the d6 DuckDB
  * oracle's `list_sum(list_transform(...))`). Emitting ALL band keys
  * from one expression keeps the per-row cost a single
  * O(bands·bits·dim) fused loop (bands separate dot expressions would
  * defeat whole-stage codegen at production band counts — the
  * recall-sized geometry runs hundreds of bands).
  *
  * Unlike the previous coordinate-slice keying (sign of dims
  * `[b*bits, (b+1)*bits)`), the projection count is NOT capped by the
  * vector dimension, so band count can grow to hold recall as
  * per-band bits grow with log n.
  *
  * Null semantics match [[FloatDotProduct]]: a null element or a
  * vector whose length differs from the plane length poisons the whole
  * key array to null (the row drops out of banding rather than keying
  * on a silently-partial projection).
  */
case class RhpBandKeys(child: Expression, planes: Array[Array[Float]],
    bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rhp_band_keys needs array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rhp_band_keys"

  override def nullSafeEval(input: Any): Any =
    RhpImpl.keys(input.asInstanceOf[ArrayData], planes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("rhpKeys")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $tmp =
         |  graft.functions.RhpImpl.keys($c, $ref, $bits);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpImpl {

  /** Packed sign keys of `v` against each band's hyperplanes;
    * null on length mismatch or null element (see [[RhpBandKeys]]). */
  def keys(v: ArrayData, planes: Array[Array[Float]],
      bits: Int): GenericArrayData = {
    val n = v.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vec(i) = v.getFloat(i).toDouble
      i += 1
    }
    val bands = planes.length / bits
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val plane = planes(b * bits + j)
        if (plane.length != n) return null
        var acc = 0.0
        var k = 0
        while (k < n) {
          acc += vec(k) * plane(k).toDouble
          k += 1
        }
        if (acc >= 0) key |= 1L << j
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}
