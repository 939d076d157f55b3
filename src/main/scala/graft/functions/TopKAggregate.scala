package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate over (score: double, id: long) pairs,
  * best-first by (score desc, id asc) — ties identical to
  * `row_number() OVER (ORDER BY score DESC, id)`.
  *
  * Why not a ranking window: `row_number` fully sorts every partition of the
  * scored set and shuffles ALL of it. This aggregate keeps a k-element heap
  * per group, so the map-side partial pass reduces each input partition to
  * ≤ k rows per key before the exchange — for ANN top-k over a 100 TB
  * corpus the shuffle shrinks from |corpus| rows to k × partitions rows.
  * (Preference order per SURVEY §2c: custom aggregate before custom
  * physical operator — this needs no planner surgery.)
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // max of this ordering = WORST element (lowest score; ties: highest id),
  // so the queue head is the eviction candidate
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by((p: (Double, Long)) => (-p._1, p._2))

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.compare(p, buf.head) < 0) { buf.dequeue(); buf.enqueue(p) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(p => (-p._1, p._2)) // best first
    new GenericArrayData(sorted.map(p => InternalRow(p._1, p._2)): Array[Any])
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
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}
