package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of an `array<float|double>` column as ONE aggregate:
  * buffer = (count, running sums). The k-means centroid update this powers
  * would otherwise posexplode every vector (×dim row blowup) and shuffle
  * the exploded rows through two groupBys; here the shuffle carries one
  * partially-aggregated buffer per group — at 100 TB that is the
  * difference between shuffling dim×|vectors| rows and |cells| buffers.
  *
  * Deterministic given a deterministic partitioning of the input up to
  * float-addition order; k-means centroid updates tolerate low-bit
  * variance (declared ANN queries are verified by recall/agreement tests,
  * not value hashes).
  *
  * Buffer serialization is a flat big-endian (long count, double sums…)
  * block — no Kryo, no boxing.
  */
case class VectorAverage(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAverage.Buf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_average"

  // lazy: child.dataType is only known after analysis resolves the column
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vector_average needs array<float|double>, got $t")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"vector_average needs array<float|double>, got $t")
    }

  override def createAggregationBuffer(): VectorAverage.Buf =
    VectorAverage.Buf(0L, new Array[Double](dim))

  override def update(buf: VectorAverage.Buf, input: InternalRow): VectorAverage.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector_average: expected dim $dim, got ${arr.numElements()}")
      // a vector with any null element has no well-defined contribution to
      // an element-wise mean — skip the whole row, like avg skips nulls
      var i = 0
      while (i < dim) { if (arr.isNullAt(i)) return buf; i += 1 }
      i = 0
      if (elemIsFloat)
        while (i < dim) { buf.sums(i) += arr.getFloat(i); i += 1 }
      else
        while (i < dim) { buf.sums(i) += arr.getDouble(i); i += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(a: VectorAverage.Buf, b: VectorAverage.Buf): VectorAverage.Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  override def eval(buf: VectorAverage.Buf): Any =
    if (buf.n == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.n))

  override def serialize(buf: VectorAverage.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + dim * 8)
    bb.putLong(buf.n)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAverage.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    VectorAverage.Buf(n, Array.fill(dim)(bb.getDouble))
  }

  override def withNewMutableAggBufferOffset(n: Int): VectorAverage =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorAverage =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAverage {
  final case class Buf(var n: Long, sums: Array[Double])
}
