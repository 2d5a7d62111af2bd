package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch: `heavy_hitters(term, capacity)`
  * tracks at most `capacity` (term, cnt, err) counters and returns the
  * summary sorted by (cnt desc, term asc) — the mergeable approximate
  * top-k that makes a one-pass frequency cut feasible at corpus scale,
  * where the exact form (full groupBy + [[TopK]]) must first shuffle
  * one row per DISTINCT term. The aggregation buffer is capacity-
  * bounded, so map-side partial aggregation reduces every partition to
  * `capacity` counters before the shuffle — the same
  * pre-shuffle-bounded shape as [[TopK]], but over an unbounded key
  * domain.
  *
  * Estimates carry their own error bar: `cnt` overestimates the true
  * count by at most `err` (`cnt - err` is a lower bound, `cnt` an
  * upper bound), and any term whose true count exceeds the evicted
  * mass / capacity survives eviction — the classic SpaceSaving
  * guarantees, preserved through merge by charging a key absent from
  * one side that side's minimum tracked count (the largest count it
  * could have had there unseen) to BOTH cnt and err, then trimming to
  * the largest `capacity` counters. SketchesSpec verifies the bounds
  * against the exact twin and repartition-invariance of the top ranks
  * on skewed data. Eviction and trim tie-break on the term string, so
  * the summary is deterministic for a fixed update order; like every
  * order-sensitive sketch (q61's HLL precedent) the registered query
  * is rows-only + envelope-pinned, not hash-oracled.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(capacity > 0, "heavy_hitters requires capacity > 0")

  // the input type check must wait for analysis — at construction the
  // child may still be an unresolved attribute without a dataType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "heavy_hitters takes a string column")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  /** The victim: smallest count, largest term as tie-break — a total
    * order, so eviction is deterministic for a fixed update sequence.
    */
  private def minEntry(buf: mutable.HashMap[String, (Long, Long)]): (String, (Long, Long)) =
    buf.minBy { case (t, (c, _)) => (c, t) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some((c, e)) => buf(term) = (c + 1, e)
        case None if buf.size < capacity => buf(term) = (1L, 0L)
        case None =>
          val (vict, (vc, _)) = minEntry(buf)
          buf.remove(vict)
          buf(term) = (vc + 1, vc)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
                     other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // a key absent from a FULL summary may have been seen up to that
    // summary's min-count times there — charge that possibility to cnt
    // (keeps cnt an upper bound) and to err (keeps cnt-err a lower
    // bound). An under-capacity summary has seen every key it was fed,
    // so absence there means count 0.
    val minBuf = if (buf.size >= capacity) minEntry(buf)._2._1 else 0L
    val minOther = if (other.size >= capacity) minEntry(other)._2._1 else 0L
    val keys = buf.keySet ++ other.keySet
    val merged = keys.map { t =>
      val (c1, e1) = buf.getOrElse(t, (minBuf, minBuf))
      val (c2, e2) = other.getOrElse(t, (minOther, minOther))
      t -> (c1 + c2, e1 + e2)
    }.toSeq
    val kept = merged.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity)
    buf.clear()
    buf ++= kept
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.map {
      case (t, (c, e)) => InternalRow(UTF8String.fromString(t), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      out.writeUTF(t); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val t = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf(t) = (c, e)
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  import org.apache.spark.sql.Column

  /** Column-API entry: `HeavyHitters.heavyHitters(col, capacity)`. */
  def heavyHitters(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
