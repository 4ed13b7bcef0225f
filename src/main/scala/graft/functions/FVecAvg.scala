package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise mean of an `array<float>` column as a proper partial
  * aggregate: each task folds its vectors into one fixed-size double
  * buffer, buffers merge associatively, and only C×(dim+1) doubles ever
  * shuffle (C = group count). This replaces both the collect_list +
  * interpreted-HOF mean (materializes every vector per group, folds with
  * per-element expression eval) and the 64x posexplode formulation
  * (multiplies shuffle rows by the dimension).
  *
  * Mean-pool is the reference's document vector (qdrant.py:123).
  */
case class FVecAvg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fvec_avg expects (array<float>, dim>=1), got $t")
  }

  /** buffer = dim running sums + count in the last slot. */
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var i = 0
      while (i < n) { buf(i) += a.getFloat(i).toDouble; i += 1 }
      buf(dim) += 1.0
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf(dim) == 0.0) return null
    val out = new Array[Double](dim)
    val c = buf(dim)
    var i = 0
    while (i < dim) { out(i) = buf(i) / c; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (dim + 1))
    var i = 0
    while (i <= dim) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](dim + 1)
    var i = 0
    while (i <= dim) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FVecAvg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FVecAvg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FVecAvg =
    copy(child = newChildren.head)

  override def prettyName: String = "fvec_avg"
}
