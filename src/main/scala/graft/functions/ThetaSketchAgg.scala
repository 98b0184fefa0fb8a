package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta-sketch distinct aggregate over a BIGINT key: emits the compact
  * sketch bytes so SET OPERATIONS (union / intersection / difference)
  * compose downstream — the capability Spark's built-in
  * `hll_sketch_agg` cannot provide (HLL unions but cannot intersect).
  * This is the "audience overlap" operator: distinct-key cardinality of
  * A ∩ B across sub-corpora, shards, or days, without ever co-shuffling
  * the raw keys.
  *
  * Why it matters at 100 TB: the exact form (`INTERSECT` then
  * `COUNT(DISTINCT)`) shuffles both full key sets; this aggregate is
  * partial+final like any HashAggregate — each map task keeps a
  * bounded ≤2^lgK-entry sketch, merge is sketch-union, and the
  * intersection runs on two compact byte arrays wherever they land.
  * Bytes per group are bounded (~16 KiB at lgK=11) regardless of data
  * size.
  *
  * Determinism note: the RETAINED-ENTRY set of a theta sketch is exact
  * under the default seed for a given input SET (hashes below theta),
  * but theta itself can vary slightly with merge order once the sketch
  * saturates — estimates are therefore REQUIRE-bounded against the
  * oracle-paired exact counts (the count_min_twin discipline), never
  * hash-compared.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && lgK >= 4 && lgK <= 26)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch expects a BIGINT key and 4 <= lgK <= 26, got " +
        s"${child.dataType.catalogString}, lgK=$lgK")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "theta_sketch"
}

/** Driver/executor-side helpers over compact theta sketch bytes. */
object ThetaOps {
  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    i.getResult.getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u.getResult.getEstimate
  }

  /** |A \ B| — churn/new-vs-returning cardinality. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(
      Sketches.wrapCompactSketch(Memory.wrap(a)),
      Sketches.wrapCompactSketch(Memory.wrap(b))).getEstimate
}
