package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of an `array<float|double>` column as a typed
  * imperative aggregate: `Σ vec` per group with a primitive
  * `Array[Double]` buffer.
  *
  * Rationale (scale): the declarative alternative — `posexplode(vec)` →
  * `groupBy(key, pos)` → re-`collect_list` — shuffles rows × dim
  * exploded tuples, a dim-amplified exchange (dim=1024 ⇒ 1024× the
  * corpus). This aggregate participates in standard partial aggregation
  * (ObjectHashAggregate): each map task folds its rows locally and the
  * exchange carries ONE array per (group, partition). Used by the IVF
  * k-means refinement (Similarity.kmeansRefine).
  *
  * The buffer grows to the widest input seen, so ragged inputs are
  * tolerated (shorter vectors contribute zeros to the tail); accumulation
  * is double-precision regardless of input element width.
  */
case class VectorSumAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def prettyName: String = "vec_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf
    else java.util.Arrays.copyOf(buf, n)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = grow(buffer, n)
      val isFloat = elementType == FloatType
      var i = 0
      while (i < n) {
        out(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      out
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    val out = grow(buffer, other.length)
    var i = 0
    while (i < other.length) { out(i) += other(i); i += 1 }
    out
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAggregate =
    copy(child = newChild)
}
