package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** A double pulled from a driver-built array that rides into generated
  * code as a REFERENCE OBJECT, never into the generated source — the
  * plan-stable "literal" for driver-side training loops (round 16).
  *
  * A gradient-descent step whose weights enter as `lit(w)` embeds the
  * primitive doubles into the generated Java source, so every step is a
  * DIFFERENT source string and whole-stage codegen recompiles per step
  * (~the whole per-iteration cost for a tiny aggregate over a
  * checkpointed feature table). With the value behind a reference object
  * the source is identical across steps and Janino's cache hits; only
  * the references array changes. Same pattern as [[BloomContains]] /
  * [[NearestCentroid]].
  *
  * Deliberately NON-foldable: ConstantFolding would evaluate it at plan
  * time and inline the result right back into the source as a literal.
  * Each loop step must construct fresh instances over a fresh array
  * snapshot (the instance is serialized into task binaries; mutating a
  * shared array between EAGER jobs would be safe but fragile).
  */
case class RefDouble(values: Array[Double], idx: Int) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "ref_double"

  /** Public for the generated code. */
  def value(): Double = values(idx)

  override def eval(input: InternalRow): Any = values(idx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refDouble", this,
      classOf[RefDouble].getName)
    ExprCode(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.expression(s"$ref.value()", DoubleType))
  }
}
