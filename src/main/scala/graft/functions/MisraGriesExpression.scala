package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982; mergeable
  * form Agarwal et al. 2013, PODS — "Mergeable Summaries", public):
  * at most `k` counters over a key stream, O(k) state per task.
  *
  * Guarantees (hold under ANY partitioning / merge order):
  *   - one-sided: est(x) ≤ true(x) for every key;
  *   - bounded undercount: true(x) − est(x) ≤ ⌊N/(k+1)⌋ (N = total
  *     rows folded in);
  *   - presence: every key with true(x) > ⌊N/(k+1)⌋ survives in the
  *     summary.
  * The surviving counter VALUES depend on fold order (partitioning),
  * so oracle rows compare only the guarantee verdicts — the sk1/sk2
  * envelope convention — never raw estimates.
  *
  * Scale shape: the planner runs this as partial aggregates — each
  * task folds its rows into one ≤k-entry map, the shuffle carries one
  * such map per task (vs a full (key, count) shuffle for the exact
  * groupBy), and merges add counts then re-prune to k by subtracting
  * the (k+1)-th largest count from all (the mergeable-summaries rule,
  * which is what preserves the N/(k+1) bound across merges).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"misra_gries needs k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a string key, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buffer.get(t) match {
        case Some(c) => buffer.update(t, c + 1)
        case None if buffer.size < k => buffer.update(t, 1L)
        case None =>
          // classic MG step: a full table and a new key decrement
          // every counter; zeros drop out
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.keysIterator.foreach { key =>
            val c = buffer(key) - 1
            if (c == 0) dead += key else buffer.update(key, c)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c) }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count from everything; at most
      // k survive (everything at or below that pivot hits ≤ 0)
      val pivot = buffer.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { key =>
        val c = buffer(key) - pivot
        if (c <= 0) dead += key else buffer.update(key, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    // deterministic ORDER of the emitted summary (est desc, tok asc);
    // the contents themselves are fold-order-dependent by design
    val rows = buffer.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long])
      : Array[Byte] = {
    val entries = buffer.toArray
    val bytes = entries.map { case (t, _) =>
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
    val size = 4 + entries.indices.map(i => 4 + bytes(i).length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    (1 to n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        bb.getLong)
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
