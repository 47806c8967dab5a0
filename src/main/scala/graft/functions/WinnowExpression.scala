package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram,
  * slide a window of `w` consecutive hashes, keep each window's
  * minimum. The selected set has density ~2/(w+1) of positions and
  * carries the winnowing GUARANTEE: any substring match of length
  * ≥ w + k − 1 characters between two documents yields at least one
  * shared fingerprint. This is the principled scale path for exact
  * substring-level duplicate detection (the "deduplicating training
  * data makes language models better" family — suffix arrays find the
  * spans exactly, winnowing finds the documents that share them at
  * scan bandwidth with row-local state only).
  *
  * The hash is the first 60 bits (15 hex chars) of `md5(gram)` — a
  * cross-engine-reproducible value the DuckDB oracle recomputes as
  * `('0x' || substr(md5(substr(text,i,k)),1,15))::BIGINT`; minima are
  * numeric, so no string-collation subtleties enter the window
  * comparison. Grams step per CODE POINT (both engines' `substr` is
  * character-based); a document shorter than k characters contributes
  * its whole text as one truncated gram, mirroring
  * [[ShinglesImpl.shingles]]' short-document rule.
  *
  * Native one-pass implementation (monotonic-deque sliding minimum,
  * O(positions) comparisons) instead of the equivalent
  * `transform(sequence(...), j -> array_min(slice(hs, j, w)))` HOF
  * chain: the interpreted-HOF-per-element cost that bit d11 (see
  * [[WordShingles]]) applies doubly here — one md5 per position TIMES
  * an O(w) interpreted array_min per window.
  */
object WinnowImpl {

  /** All per-position 60-bit k-gram hashes of `text`, in position
    * order — the pre-winnow hash vector (positions 1..max(len−k+1, 1);
    * a document shorter than k contributes its whole text as one
    * truncated gram). Shared by [[winnow]] and the exact-substring
    * operators ([[GramHashes]]), and recomputed verbatim by the
    * oracles as `('0x' || substr(md5(substr(text,i,k)),1,15))::BIGINT`. */
  def gramHashLongs(text: UTF8String, k: Int): Array[Long] = {
    // work on the raw UTF-8 bytes: a gram's UTF-8 encoding is exactly
    // the byte slice between two code-point start offsets, so hashing
    // slices directly skips the String round-trip and the per-gram
    // substring+getBytes allocations (1.4M of them per 5k docs before)
    val bytes = text.getBytes
    val offs = new Array[Int](bytes.length + 1)
    var nCp = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(nCp) = bi
      nCp += 1
      val b = bytes(bi) & 0xFF
      bi += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3
             else 4)
    }
    offs(nCp) = bytes.length
    val npos = math.max(nCp - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16)
    val hs = new Array[Long](npos)
    var i = 0
    while (i < npos) {
      val start = offs(i)
      md.update(bytes, start, offs(math.min(i + k, nCp)) - start)
      md.digest(d, 0, 16)
      var acc = 0L
      var j = 0
      while (j < 7) { acc = (acc << 8) | (d(j) & 0xFFL); j += 1 }
      hs(i) = (acc << 4) | ((d(7) & 0xFF) >>> 4)
      i += 1
    }
    hs
  }

  /** [[gramHashLongs]] boxed for the [[GramHashes]] expression. */
  def gramHashes(text: UTF8String, k: Int): GenericArrayData = {
    val hs = gramHashLongs(text, k)
    val arr = new Array[Any](hs.length)
    var i = 0
    while (i < hs.length) { arr(i) = hs(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct winnowed 60-bit fingerprints of `text`, as described
    * above. Window j covers hash positions [j, j+w) truncated at the
    * end of the document; only the max(npos − w + 1, 1) full windows
    * are evaluated (the oracle applies the same position filter). */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hs = gramHashLongs(text, k)
    val npos = hs.length
    // sliding minimum over windows [j, j+w) via monotonic index deque
    val nWin = math.max(npos - w + 1, 1)
    val out = new java.util.LinkedHashSet[Long]()
    val deque = new Array[Int](npos)
    var head = 0
    var tail = 0 // deque holds indices of increasing hash values
    var i = 0
    while (i < npos) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      val j = i - w + 1 // window starting at j ends at i
      if (j >= 0) {
        while (deque(head) < j) head += 1
        if (j < nWin) out.add(hs(deque(head)))
      }
      i += 1
    }
    if (npos < w) {
      // single truncated window over everything
      var mn = Long.MaxValue
      i = 0
      while (i < npos) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** Register `winnow_fingerprints(text, k, w)` (idempotent),
    * mirroring [[ShinglesImpl.register]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      { exprs =>
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"winnow_fingerprints $name must be an int literal, got $other")
        }
        WinnowFingerprints(exprs.head, intLit(exprs(1), "k"),
          intLit(exprs(2), "w"))
      },
      "built-in")
}

/** ALL per-position 60-bit k-gram hashes, in position order — the
  * exact-substring sibling of [[WinnowFingerprints]]: no window
  * selection, one hash per character position (see
  * [[WinnowImpl.gramHashLongs]]). Feeds
  * [[graft.operators.Dedup.exactDupSpans]]. */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2, s"gram_hashes needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes needs a string column, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowImpl.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct winnowed fingerprints — see [[WinnowImpl.winnow]]. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 2, s"winnow_fingerprints needs k,w >= 2, got ($k,$w)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints needs a string column, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowImpl.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
