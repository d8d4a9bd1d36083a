package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.ColumnShim.{toColumn, toExpression}

/** Exact per-key top-k as a custom `TypedImperativeAggregate` — the scalable
  * replacement for the `row_number().over(Window.partitionBy(key)) <= k`
  * pattern.
  *
  * Why it matters at 100 TB: the window formulation shuffles EVERY scored
  * row to its key's partition and sorts there; this aggregate is partial —
  * each map task keeps a bounded heap (size k) per key and ships only ≤ k
  * rows per (task, key) into the shuffle, then heaps merge on the reduce
  * side. Selection is identical: largest `score`, ties broken by smaller
  * `id` (deterministic).
  *
  * Output: `array<struct<score: double, id: long>>`, sorted score desc,
  * id asc — `posexplode` it for (rank-1, row) pairs.
  */
case class TopKAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  // head of the queue = the WORST kept element (lowest score, then largest
  // id), so exceeding size k evicts it in O(log k)
  private val evictionOrder: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { t => a.enqueue(t); if (a.size > k) a.dequeue() }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.enqueue((bb.getDouble, bb.getLong)))
    q
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
}

object TopKAgg {
  /** `topk(score, id, k)` aggregate Column. */
  def topk(score: Column, id: Column, k: Int): Column =
    toColumn(TopKAgg(toExpression(score.cast("double")),
      toExpression(id.cast("long")), k).toAggregateExpression())
}
