package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** Bounded top-k aggregate for similarity search: keeps at most `k`
  * `struct<score: double, ...tiebreak cols>` entries per group, ordered
  * by (score DESC NULLS LAST, remaining fields ASC) — the exact sort of
  * the `row_number` window it replaces in
  * [[graft.operators.Similarity]].
  *
  * Scale rationale (the reason this exists): a
  * `row_number().over(Window.partitionBy(q_id))` funnels EVERY scored
  * candidate of a query into one reducer partition — a corpus-sized
  * sort per query at 10⁹ rows. As a [[TypedImperativeAggregate]] the
  * planner runs it inside ObjectHashAggregate with a partial pass:
  * every input partition reduces its candidates to a k-entry heap
  * map-side, and the shuffle moves only k·P candidate structs per
  * query, merged reduce-side into the final k. State is O(k) per group
  * at every stage.
  *
  * Determinism: ordering is total (score, then the tie-break fields,
  * which callers make unique per group), so partial/merge order cannot
  * change the result — verified value-identical to the window form by
  * the s1/s2/s3 DuckDB oracles.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, s"topk needs k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.nonEmpty && st.head.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk needs struct with a leading double score, got $other")
  }

  private lazy val elemType: StructType = child.dataType.asInstanceOf[StructType]

  /** score DESC (nulls last), tie-break fields ASC — the window's sort. */
  private[functions] lazy val ordering: InterpretedOrdering = {
    val sorts = elemType.fields.zipWithIndex.map { case (f, i) =>
      val ref = BoundReference(i, f.dataType, f.nullable)
      if (i == 0) SortOrder(ref, Descending) else SortOrder(ref, Ascending)
    }
    new InterpretedOrdering(sorts.toIndexedSeq)
  }

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ordering)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[InternalRow])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.absorb(other); buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedBestFirst.asInstanceOf[Array[Any]])

  private lazy val ser = UnsafeProjection.create(Array[DataType](elemType))

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val rows = buffer.sortedBestFirst
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(rows.length)
    rows.foreach { r =>
      val ur = ser(InternalRow(r))
      out.writeInt(ur.getSizeInBytes)
      ur.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val rowBytes = new Array[Byte](len)
      buf.get(rowBytes)
      val ur = new UnsafeRow(1)
      ur.pointTo(rowBytes, len)
      heap.add(ur.getStruct(0, elemType.length))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

/** k-bounded heap of struct rows, worst entry at the head so admission
  * is O(log k) and state never exceeds k rows. `ord` ranks best-first;
  * the heap inverts it. Rows are defensively copied on admission
  * (Spark reuses input row objects). */
final class TopKHeap(k: Int, ord: InterpretedOrdering) {
  private val worstFirst = new java.util.PriorityQueue[InternalRow](
    math.max(k, 1),
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    })

  def add(row: InternalRow): Unit = {
    if (worstFirst.size < k) {
      worstFirst.offer(row.copy())
    } else if (ord.compare(row, worstFirst.peek()) < 0) {
      worstFirst.poll()
      worstFirst.offer(row.copy())
    }
  }

  def absorb(other: TopKHeap): Unit = {
    val it = other.worstFirst.iterator()
    while (it.hasNext) add(it.next())
  }

  def sortedBestFirst: Array[InternalRow] = {
    val arr = worstFirst.toArray(new Array[InternalRow](worstFirst.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
    })
    arr
  }
}
