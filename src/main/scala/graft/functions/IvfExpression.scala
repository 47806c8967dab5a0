package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine scores of a float-vector column against a fixed
  * centroid matrix — the hot inner loop of the IVF coarse quantizer
  * ([[graft.operators.Similarity.ivfTopK]]).
  *
  * Semantics match the HOF formulation exactly (dot folds left-to-right
  * in index order over doubles, cosine = dot / (|v|·|c|)) — verified by
  * the s3_ann_ivf DuckDB oracle. The HOF form costs `nlist` interpreted
  * `aggregate(zip_with(...))` folds per row; this is one tight JVM loop
  * with the matrix shipped via a codegen reference object.
  */
case class CosinesAgainst(child: Expression,
    centroids: Array[Array[Float]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosines_against needs array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cosines_against"

  override def nullSafeEval(input: Any): Any =
    IvfImpl.cosines(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfImpl.cosines($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native dot product of two numeric-array columns — index-order double
  * accumulation, the exact arithmetic of the HOF form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (verified by the
  * s1/s2/d6 oracles). One fused loop instead of an interpreted
  * zip+fold per pair; pairs dominate the similarity operators. */
case class FloatDotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotf needs array<float|double>, got ${left.dataType}/${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotf"

  // lazy: children resolve after construction
  private lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IvfImpl.dot(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IvfImpl.dot($a, $leftIsFloat, $b, $rightIsFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object IvfImpl {

  /** Index-order double-accumulated dot product; length = min(|a|,|b|)
    * (zip_with would null-pad, but callers only pair equal-dim
    * vectors). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
  /** Cosine of `v` against each centroid, index-order double folds —
    * identical arithmetic to `aggregate(zip_with(...))` + sqrt norms. */
  def cosines(v: ArrayData, centroids: Array[Array[Float]]): GenericArrayData = {
    val n = v.numElements()
    var vNorm = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      vNorm += x * x
      i += 1
    }
    vNorm = math.sqrt(vNorm)
    val out = new Array[Any](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var dot = 0.0
      var cNorm = 0.0
      var j = 0
      while (j < m) {
        val x = v.getFloat(j).toDouble
        val y = cent(j).toDouble
        dot += x * y
        cNorm += y * y
        j += 1
      }
      out(c) = dot / (vNorm * math.sqrt(cNorm))
      c += 1
    }
    new GenericArrayData(out)
  }
}
