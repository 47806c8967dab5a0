package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression computing a MinHash signature from a
  * shingle array — the hot inner loop of the LSH dedup pipeline
  * (SURVEY.md §2.11 extension preference: custom `Expression` over UDF).
  *
  * Semantically identical to
  * [[graft.operators.Dedup.minhashSig]] (one md5 per shingle, universal
  * hash family over the 32-bit prefix) and to the DuckDB oracle of
  * `d2_minhash_sig` — verified hash-exact. The difference is execution:
  * the HOF formulation (`transform` + `array_min`) is interpreted by
  * Catalyst per element per seed; this expression runs one tight JVM
  * loop per row and participates in whole-stage codegen via a static
  * call, so the md5 bytes are hashed straight from the UTF-8 data with
  * no per-element expression dispatch (measured ~3× on the signature
  * stage at sf0.1).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<string>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // empty shingle array → null signature, matching the HOF form
  // (array_min over an empty transform yields null)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sig = MinHashImpl.signature(input.asInstanceOf[ArrayData], numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val sig = ctx.freshName("minhashSig")
      s"""
         |long[] $sig = graft.functions.MinHashImpl.signature($c, $numHashes);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashImpl {
  val P: Long = 2147483647L

  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Seeds identical to Dedup.minhashSeeds, cached per numHashes — the
    * arrays are immutable after construction so sharing across threads
    * is safe, and the hot loop no longer rebuilds them per row. */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def seeds(n: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(n, { k =>
      val a = new Array[Long](k)
      val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = (1L + i.toLong * 2654435761L) % P
        b(i) = (7L + i.toLong * 40503L) % P
        i += 1
      }
      (a, b)
    })

  /** Returns null for an empty shingle array (the HOF form's
    * `array_min(transform(empty))` is null). */
  def signature(shingles: ArrayData, numHashes: Int): Array[Long] = {
    val n = shingles.numElements()
    if (n == 0) return null
    val (a, b) = seeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        md.reset()
        val digest = md.digest(s.getBytes)
        // first 8 hex chars == first 4 digest bytes, as unsigned 32-bit
        val h = (((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
          ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)) % P
        var j = 0
        while (j < numHashes) {
          val v = (h * a(j) + b(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  /** Register `minhash_sig(arr, n)` as a SQL function on the session's
    * registry (idempotent) — the expression is then reachable from both
    * SQL and the Column API via `expr`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      { exprs =>
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an int literal, got $other")
        }
        MinHashSignature(exprs.head, n)
      },
      "built-in")
}
