package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType}

/** Native product-quantization encoder: assigns each subspace slice of
  * a float vector to its nearest sub-codebook centroid (squared-L2,
  * ties to the lowest centroid index) and emits the `m` codes as
  * `array<tinyint>` shifted by −128 (FAISS uint8 convention, same
  * shift as [[graft.operators.Similarity.sq8Encode]]) — the hot loop
  * of a 100 TB corpus encode pass, one fused O(m·ksub·subdim) loop
  * per row with zero per-element allocation. A `transform`-lambda
  * formulation would allocate a ksub-struct array per subspace per
  * row and re-enter the interpreter per element — the same trap
  * [[CentroidScores]]' scaladoc records for IVF.
  *
  * Distance arithmetic is index-order double accumulation of
  * `(v_i − c_i)²`, which the DuckDB oracle reproduces with
  * `list_sum` over per-element squared diffs — argmin parity then
  * follows because equal distances only arise bit-identically and
  * both sides break ties on the lower centroid index.
  *
  * Null semantics follow [[FloatDotProduct]]: a vector whose length
  * differs from the codebook's total dimension, or containing a null
  * element, poisons the whole result to null rather than encoding a
  * silently-partial code word.
  */
case class PqCodes(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  // the code word is one byte per subspace — more than 256 centroids
  // cannot be addressed and would wrap silently ((best − 128).toByte)
  require(codebooks.nonEmpty && codebooks.forall(_.length <= 256),
    s"pq_codes: each sub-codebook must have <= 256 centroids, " +
      s"got ${codebooks.map(_.length).mkString(",")}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes needs array<float>, got $other")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(input: Any): Any =
    PqImpl.codes(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("pqRes")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $tmp =
         |  graft.functions.PqImpl.codes($c, $ref);
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

object PqImpl {

  /** PQ code word of `v` against `codebooks` (m × ksub × subdim), or
    * null when `v`'s length ≠ Σ subdim or any element is null. */
  def codes(v: ArrayData,
      codebooks: Array[Array[Array[Float]]]): GenericArrayData = {
    val m = codebooks.length
    var total = 0
    var j = 0
    while (j < m) { total += codebooks(j)(0).length; j += 1 }
    if (v.numElements() != total) return null
    var i = 0
    while (i < total) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Any](m)
    var off = 0
    j = 0
    while (j < m) {
      val cb = codebooks(j)
      val subdim = cb(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dist = 0.0
        var d = 0
        while (d < subdim) {
          val diff = v.getFloat(off + d).toDouble - cent(d).toDouble
          dist += diff * diff
          d += 1
        }
        // strict < keeps the FIRST minimum: ties go to the lowest index
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(j) = (best - 128).toByte
      off += subdim
      j += 1
    }
    new GenericArrayData(out)
  }
}
