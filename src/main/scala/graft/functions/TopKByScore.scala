package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken toward the smaller id) and returns the ids in
  * rank order as `array<long>`.
  *
  * This is the scale path for similarity search (SURVEY §7.4): with
  * `groupBy(query).agg(top_k_by_score(...))` Spark runs it as a partial
  * aggregate — each map task reduces its slice of the corpus to ≤ k
  * candidates per query BEFORE the shuffle, so the exchange carries
  * O(queries × k) rows instead of O(queries × corpus). A
  * `Window.partitionBy(query).orderBy(score)` formulation would shuffle and
  * sort every scored pair — the canonical scale-killer this class avoids.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"top-k size must be positive, got $k")

  // Dequeue order = worst first: lowest score, then largest id.
  private val evictionOrdering: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictionOrdering)

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buffer.enqueue(e)
      if (buffer.size > k) buffer.dequeue()
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val ranked = buffer.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(ranked.map(_._2))
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column-API entry point: `df.groupBy(q).agg(topKByScore(score, id, 5))`. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(
        ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")),
        k).toAggregateExpression())
}
