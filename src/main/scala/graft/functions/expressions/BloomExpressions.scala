package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` against a pre-built Bloom filter — the probe side of
  * semi-join reduction: filter a huge fact table down to rows whose key
  * MIGHT be in a mid-size dimension key set before the exact join runs.
  * False positives only (they are removed by the exact join that follows);
  * never false negatives, so the composed operator stays exact.
  *
  * The filter crosses into generated code as a REFERENCE OBJECT holding the
  * serialized bits; deserialization happens once per executor via a
  * transient lazy, not per row (and never into the generated source, which
  * stays model-independent — one janino compile regardless of the filter's
  * contents or size, same pattern as [[NearestCentroid]]).
  */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Public for the generated code, which probes through the reference
    * object rather than inlining the bit array. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs an integral key, got $other")
    }

  override def nullSafeEval(a: Any): Any = a match {
    case l: java.lang.Long    => mightContain(l)
    case i: java.lang.Integer => mightContain(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bloomExpr", this,
        classOf[BloomContains].getName)
      s"${ev.value} = $ref.mightContain((long)($a));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
