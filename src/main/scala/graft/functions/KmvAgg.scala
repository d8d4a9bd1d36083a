package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.ColumnShim.{toColumn, toExpression}

/** Bottom-k distinct hash values (the KMV sketch of Beyer et al., SIGMOD
  * 2007) as a partial-aggregating `TypedImperativeAggregate`: each map
  * task keeps the k smallest DISTINCT values seen (unsigned long order),
  * partial buffers merge by set union re-capped at k, and the final value
  * is the ascending array — k longs of driver state per corpus however
  * large the corpus.
  *
  * Unsigned ordering: hashes are compared as unsigned 64-bit (flip the
  * sign bit) so the sketch is the true bottom of the hash ring; the
  * emitted array is in that same order.
  */
case class KmvAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, s"k must be positive, got $k")

  // TreeSet in FLIPPED (sign-bit-xored) value space: natural signed order
  // there IS unsigned order of the original hashes; `last` = the largest
  // kept = the eviction candidate
  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit = {
    val f = h ^ Long.MinValue
    if (buf.size < k) buf += f
    else if (f < buf.last && !buf.contains(f)) { buf += f; buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach { f =>
      if (a.size < k) a += f
      else if (f < a.last && !a.contains(f)) { a += f; a -= a.last }
    }
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray.map(_ ^ Long.MinValue))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    (0 until n).foreach(_ => s += bb.getLong)
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
}

object KmvAgg {
  /** `kmv(hash, k)` aggregate Column over a long hash column. */
  def kmv(hash: Column, k: Int): Column =
    toColumn(KmvAgg(toExpression(hash.cast("long")), k).toAggregateExpression())
}
