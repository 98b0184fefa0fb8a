package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k highest (score, id) pairs per
  * group with a size-k min-heap — the custom TypedImperativeAggregate
  * SURVEY §7.3 reserves for exact similarity search at scale.
  *
  * Why it matters at 100 TB: the window form
  * (`row_number() over (partition by g order by score desc)` then
  * `rn <= k`) shuffles EVERY candidate row to the group's reducer and
  * sorts them. This aggregate is partial+final like any HashAggregate:
  * each map task keeps only its local top-k (k * n_partitions rows cross
  * the wire), and merge is O(k log k). Shuffle volume drops from
  * |candidates| to k per partition.
  *
  * Determinism: ordering is (score DESC, id ASC) — ties broken by the
  * smaller id, matching the ROW_NUMBER tiebreak so results stay
  * oracle-comparable. Output: array<struct<score double, id bigint>> in
  * rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_score expects (double, bigint) and k > 0, got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString}), k=$k")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

/** Size-bounded min-heap on (score ASC, id DESC) so the ROOT is the
  * weakest element under the (score DESC, id ASC) ranking — evicted first. */
final class TopKBuffer(val k: Int) {
  // worse(a, b): a ranks strictly below b under (score DESC, id ASC)
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private val ord = new Ordering[(Double, Long)] {
    // min-heap: "greatest" = weakest element, so PQ's head is evictable
    def compare(a: (Double, Long), b: (Double, Long)): Int =
      if (worse(a._1, a._2, b._1, b._2)) 1
      else if (worse(b._1, b._2, a._1, a._2)) -1
      else 0
  }
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

  def add(s: Double, i: Long): Unit =
    if (heap.size < k) heap.enqueue((s, i))
    else {
      val (ws, wi) = heap.head
      if (worse(ws, wi, s, i)) { heap.dequeue(); heap.enqueue((s, i)) }
    }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => add(s, i) }

  def sortedDesc: Array[(Double, Long)] =
    heap.toArray.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(heap.size)
    heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add(in.readDouble(), in.readLong()); j += 1 }
    buf
  }
}
