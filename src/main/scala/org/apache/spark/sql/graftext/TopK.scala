package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap top-k aggregate: `topk(expr, k)` keeps the k largest
  * values of any orderable expression (typically a struct whose leading
  * fields are the sort key and trailing fields the payload) and returns
  * them sorted descending.
  *
  * This is the scale-correct top-k-per-group: the aggregation buffer is
  * a k-element min-heap, so map-side partial aggregation reduces every
  * partition to at most k values per group BEFORE the shuffle, and the
  * reduce side merges heaps. The window-function form
  * (`row_number().over(partitionBy(g).orderBy(v))` + filter) must
  * shuffle and fully sort EVERY row of every group; this shuffles
  * k·partitions per group. Same results when the ordering is total
  * (add a unique tie-break field to the struct).
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(k > 0, "topk requires k > 0")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  // min-heap (reverse ordering): head is the smallest survivor
  @transient private lazy val heapOrd: Ordering[Any] = ordering.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(heapOrd)

  private def insert(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.enqueue(v)
    else if (ordering.gt(v, buf.head)) { buf.dequeue(); buf.enqueue(v) }
  }

  override def update(buf: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, deepCopy(v))
    buf
  }

  /** Evaluated values may point into Spark's reused input row buffer, and
    * GenericInternalRow.copy()/GenericArrayData.copy() are shallow (string
    * fields inside still alias the buffer). Round-tripping container values
    * through an UnsafeProjection materializes them into self-owned bytes.
    */
  private def deepCopy(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case _: InternalRow | _: ArrayData | _: MapData =>
      proj(InternalRow(v)).copy().get(0, child.dataType)
    case other => other
  }

  override def merge(buf: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val row = proj(InternalRow(v))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopK {
  import org.apache.spark.sql.Column

  /** Column-API entry: `TopK.topk(struct(score, tieBreak, payload...), k)`. */
  def topk(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
