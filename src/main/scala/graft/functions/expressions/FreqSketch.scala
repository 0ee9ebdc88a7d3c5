package graft.functions.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) aggregate over a string column, backed by
  * the Apache DataSketches frequencies ItemsSketch — the Misra-Gries-family
  * summary whose memory is FIXED at `maxMapSize` entries no matter how many
  * distinct items stream through. This is the 100 TB answer to "top tokens
  * by count" when the vocabulary itself doesn't fit anywhere: per-partition
  * sketches ride the partial-aggregate shuffle as compact binaries and
  * merge associatively, exactly like the HLL rollup in SketchOps.
  *
  * Output: array of (item, est, lb, ub) structs for every item the sketch
  * can prove frequent (NO_FALSE_NEGATIVES — no true heavy hitter is ever
  * missed; some non-heavy items may appear with wide bounds), sorted by
  * (est desc, item). When the distinct-item count stays under maxMapSize
  * the sketch never purges, every bound collapses (lb = est = ub = exact
  * count) and the output is the exact frequency table — the property the
  * unit spec pins; the purge regime is exercised by a crafted heavy-tail
  * stream asserting the bounds contain the true counts.
  */
case class FreqItems(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  private val itemStruct = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(itemStruct, containsNull = false)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow)
      : ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String])
      : ItemsSketch[String] = a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (item, est, _, _) => (-est, item) }
      .map { case (item, est, lb, ub) =>
        InternalRow(UTF8String.fromString(item), est, lb, ub)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](
      Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqItems =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItems =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
