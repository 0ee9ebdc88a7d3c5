package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta-sketch distinct-set aggregate over a LONG key column (Apache
  * DataSketches theta family). Where HLL answers only |A| and |A∪B|, theta
  * sketches close the set algebra: compact per-group sketches support
  * INTERSECTION and DIFFERENCE (A-not-B) estimates after aggregation — the
  * 100 TB pattern for audience-overlap / cross-partition set analysis:
  * sketch each group once on the partial-aggregate path (fixed 2^lgK
  * memory, binaries merge associatively through the shuffle), then answer
  * any pairwise overlap question on the tiny sketch table without
  * re-scanning the facts.
  *
  * Determinism/exactness contract: with the default update seed the key
  * hashing is fixed, and while every group's distinct count stays under
  * the nominal capacity 2^lgK the sketch never enters estimation mode —
  * retained set == exact hash set, so every derived estimate is the EXACT
  * distinct count regardless of partition order (the property the declared
  * query's DuckDB oracle checks; ThetaSketchSpec additionally pins the
  * estimation regime's behavior). In estimation mode the retained set
  * depends on rebuild order across partitions, so outputs are approximate
  * and only statistically stable — callers owning a hash-match contract
  * must size lgK to their group cardinality.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Pairwise set algebra over two serialized compact theta sketches: one
  * eval wraps both binaries and returns the full overlap profile as a
  * struct (n_inter, only_a, only_b, n_union) of rounded LONG estimates.
  * Evaluated on the |groups|² pair grid of an already-aggregated sketch
  * table (25 rows for 5 event types) — never on the fact stream — so
  * interpreted eval (CodegenFallback) is fine; the hot path was the
  * sketch aggregate above. */
case class ThetaPairStats(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_inter", LongType, nullable = false),
    StructField("only_a", LongType, nullable = false),
    StructField("only_b", LongType, nullable = false),
    StructField("n_union", LongType, nullable = false)))
  override def prettyName: String = "theta_pair_stats"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val skA = CompactSketch.wrap(
      Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val skB = CompactSketch.wrap(
      Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val inter = SetOperation.builder().buildIntersection()
      .intersect(skA, skB).getEstimate
    val onlyA = SetOperation.builder().buildANotB()
      .aNotB(skA, skB).getEstimate
    val onlyB = SetOperation.builder().buildANotB()
      .aNotB(skB, skA).getEstimate
    val union = SetOperation.builder().buildUnion()
      .union(skA, skB).getEstimate
    InternalRow(math.round(inter), math.round(onlyA),
      math.round(onlyB), math.round(union))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
