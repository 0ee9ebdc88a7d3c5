package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single typed-imperative aggregate: one pass over
  * the exploded shingles updating a primitive long[numHashes] buffer, one
  * array column out — instead of `numHashes` separate `min(md5_60(...))`
  * aggregate columns (which each re-hash the input). The hash family is
  * the salted md5-60 family of [[MinHashFamily]] — the SAME family as
  * `DedupOps.minhashSignatures` and `TextFunctions.md5Salted60`, so every
  * signature path (aggregate, scalar, column-expression, DuckDB oracle
  * SQL) is interchangeable in one LSH banding join.
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

  @transient private lazy val prefixes = MinHashFamily.saltPrefixes(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      MinHashFamily.updateWith(buf, v.asInstanceOf[UTF8String], prefixes)
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

/** The shared MinHash hash family — salted md5-60: member `i` of the
  * family hashes a shingle `s` to the unsigned 60-bit integer formed by
  * the first 15 hex chars of `md5("<i>:" ++ s)`. Deterministic across
  * JVMs and partitionings, and — the point of the md5 choice —
  * reproducible in plain SQL (`CAST(('0x' || substr(md5(i || ':' || s),
  * 1, 15)) AS BIGINT)`), so the whole MinHash pipeline has a DuckDB
  * oracle twin. All signature paths use EXACTLY this function: the
  * aggregate ([[MinHashSignature]], one shingle per row), the scalar
  * ([[MinHashArray]], whole shingle array per row) and the column form
  * (`TextFunctions.md5Salted60`) — signatures are interchangeable in one
  * LSH join (asserted in MinHashAggSpec). */
object MinHashFamily {
  /** Thread-local digest: Catalyst may evaluate one expression instance
    * from several task threads; MessageDigest is stateful. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Decimal-salt prefix bytes "i:" — precompute once per operator. */
  def saltPrefixes(numHashes: Int): Array[Array[Byte]] =
    Array.tabulate(numHashes)(i =>
      (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First 15 hex chars of md5(prefix ++ bytes) as an unsigned long:
    * big-endian first 8 digest bytes, dropped low nibble. */
  def hash60(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    if (prefix != null) d.update(prefix)
    d.update(bytes)
    val dg = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dg(i) & 0xFFL); i += 1 }
    h >>> 4
  }

  def updateWith(buf: Array[Long], s: UTF8String,
      prefixes: Array[Array[Byte]]): Unit = {
    val base = s.getBytes
    var i = 0
    while (i < prefixes.length) {
      val h = hash60(prefixes(i), base)
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

  @transient private lazy val prefixes = MinHashFamily.saltPrefixes(numHashes)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sz = arr.numElements()
    if (sz == 0) return null
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < sz) {
      MinHashFamily.updateWith(buf, arr.getUTF8String(j), prefixes)
      j += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
