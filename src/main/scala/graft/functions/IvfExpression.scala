package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native centroid scores of a float-vector column against a fixed
  * centroid matrix — the hot inner loop of the IVF coarse quantizer
  * ([[graft.operators.Similarity.ivfTopK]]). Emits the FINISHED
  * `array<struct<cos: double, negid: int>>` the quantizer sorts/maxes
  * over, so the expression appears exactly once per consumer tree and
  * the per-row cost is one O(nlist·dim) loop. (An earlier formulation
  * returned a bare cosine array that callers re-assembled with a
  * `transform` lambda — interpreted lambdas re-evaluate their body per
  * element, which silently made the quantizer O(nlist²·dim) per row.)
  *
  * Cosine arithmetic matches the HOF formulation exactly (dot folds
  * left-to-right in index order over doubles) — verified by the
  * s3_ann_ivf DuckDB oracle. negid = -centroidIndex, so max/sort by
  * struct order give (cos desc, cell asc) tie-breaking.
  */
case class CentroidScores(child: Expression,
    centroids: Array[Array[Float]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"centroid_scores needs array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("negid", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "centroid_scores"

  override def nullSafeEval(input: Any): Any =
    IvfImpl.scores(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfImpl.scores($c, $ref)")
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

  // mismatched lengths / null elements produce null (HOF parity)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    IvfImpl.dot(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (a, b) =>
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.IvfImpl.dot(
         |  $a, $leftIsFloat, $b, $rightIsFloat);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object IvfImpl {

  /** Index-order double-accumulated dot product, with the NULL
    * semantics of the HOF form it replaced (`aggregate(zip_with(a, b,
    * _*_), 0.0, _+_)`): a length mismatch or a null element poisons the
    * whole result to null (zip_with null-pads the shorter side and the
    * fold propagates), so malformed vectors sort last under `cos DESC`
    * instead of scoring a silently-partial dot. Returns a boxed Double
    * (null-able). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
  /** (cosine, -centroidIndex) structs of `v` against each centroid,
    * index-order double folds — identical arithmetic to
    * `aggregate(zip_with(...))` + sqrt norms. */
  def scores(v: ArrayData, centroids: Array[Array[Float]]): GenericArrayData = {
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
      // length mismatch = malformed vector: poison with -Inf so it can
      // never win a cell, matching FloatDotProduct's null-poisoning
      if (cent.length != n) {
        out(c) = org.apache.spark.sql.catalyst.InternalRow(
          Double.NegativeInfinity, -c)
      } else {
        var dot = 0.0
        var cNorm = 0.0
        var j = 0
        while (j < n) {
          val x = v.getFloat(j).toDouble
          val y = cent(j).toDouble
          dot += x * y
          cNorm += y * y
          j += 1
        }
        out(c) = org.apache.spark.sql.catalyst.InternalRow(
          dot / (vNorm * math.sqrt(cNorm)), -c)
      }
      c += 1
    }
    new GenericArrayData(out)
  }
}
