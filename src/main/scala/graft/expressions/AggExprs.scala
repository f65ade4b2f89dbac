package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a HARD per-group memory bound: accumulation stops
  * at `cap + 1` elements. Groups meant to be discarded by a downstream
  * `size(list) <= cap` filter (hot keys — e.g. corpus-boilerplate
  * shingles present in 10⁸ documents) therefore hold AT MOST `cap + 1`
  * entries in any aggregation buffer, map-side or final, instead of
  * materializing the full unbounded id list before the filter runs. The
  * `cap + 1`-th element is kept (not `cap`) so `size <= cap` still
  * distinguishes "exactly cap" from "overflowed" — truncated lists are
  * sentinel-length, never mistaken for survivors.
  *
  * Buffer state is a primitive-packed Long array (8 bytes/element, no
  * boxing in serialize/spill); partial aggregation applies the same cap,
  * so a skewed key costs `cap + 1` longs per map-side buffer — a
  * configuration bound, not a data bound. Element ORDER is partition-
  * dependent, exactly like `collect_list`; callers must not rely on it.
  */
case class CappedLongList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(cap >= 1, "cap must be positive")
  private val keep = cap + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(keep, 16))

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < keep) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val room = keep - buf.length
    if (room >= other.length) buf ++= other
    else if (room > 0) buf ++= other.view.slice(0, room)
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "capped_long_list"
}
