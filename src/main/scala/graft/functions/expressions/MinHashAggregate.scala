package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single typed-imperative aggregate: one pass over
  * the exploded shingles updating a primitive long[numHashes] buffer, one
  * array column out — instead of `numHashes` separate `min(xxhash64(...))`
  * aggregate columns (which each re-hash the input). The hash family is
  * Murmur3 seeded by the hash index — NOT the same family as the
  * xxhash64-salted `DedupOps.minhashSignatures`; signatures from the two
  * paths are not comparable and must not be mixed in one LSH banding join.
  *
  * Buffer serialization (for partial-aggregate shuffle) is a flat
  * big-endian long array — no Kryo, no boxing.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      MinHashFamily.updateWith(buf, v.asInstanceOf[UTF8String], numHashes)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSignature =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSignature =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The shared MinHash hash family: Murmur3 seeded by the hash index —
  * deterministic across JVMs and partitionings. Both the aggregate
  * ([[MinHashSignature]], one shingle per row) and the scalar
  * ([[MinHashArray]], whole shingle array per row) use EXACTLY this
  * function, so their signatures are interchangeable in one LSH join. */
object MinHashFamily {
  def updateWith(buf: Array[Long], s: UTF8String, numHashes: Int): Unit = {
    val base = s.getBytes
    var i = 0
    while (i < numHashes) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes2(base, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          base.length, i).toLong ^ (i.toLong << 32)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
  }
}

/** Scalar MinHash over a per-document shingle array: when the shingles are
  * already collected in an `array<string>` column (the [[WordShingles]]
  * output), the signature is a pure narrow map — NO explode (×|shingles|
  * row blowup) and NO aggregation shuffle at all. At 100 TB this turns the
  * signature stage from a shuffle into a scan. Same hash family as
  * [[MinHashSignature]] ([[MinHashFamily]]). Empty shingle arrays yield
  * NULL — the aggregate path produces no row for a shingle-less doc, and a
  * sentinel signature would make every short doc collide on every LSH
  * band. */
case class MinHashArray(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_array"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"minhash_array needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sz = arr.numElements()
    if (sz == 0) return null
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < sz) {
      MinHashFamily.updateWith(buf, arr.getUTF8String(j), numHashes)
      j += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
