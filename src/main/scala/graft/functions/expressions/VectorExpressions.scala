package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per row — fine for thousands of rows, ruinous for the O(n·|Q|)
  * or O(n²) pair loops in similarity search / embedding dedup. These
  * expressions generate a tight primitive loop inside whole-stage codegen
  * (`doGenCode`), with an interpreted `nullSafeEval` fallback.
  *
  * Semantics are identical to the higher-order version and to the DuckDB
  * oracle: sequential left-to-right fold in double precision. Null elements
  * are skipped (none occur in the test tables); mismatched dimensions throw
  * rather than silently truncating — a wrong-dim embedding must fail loudly.
  */
object VectorExpressions {

  private[expressions] def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private[expressions] def toDouble(arr: ArrayData, i: Int, dt: DataType): Double =
    dt match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType   => arr.getLong(i).toDouble
      case other => throw new IllegalArgumentException(
        s"unsupported vector element type $other")
    }
}

/** dot(a, b) in double precision over numeric-array columns. */
case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elementType(left), elementType(right))
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"vector_dot: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += toDouble(x, i, lt) * toDouble(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elementType(left)
      val rt = elementType(right)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = CodeGenerator.getValue(a, lt, i)
      val yv = CodeGenerator.getValue(b, rt, i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: dimension mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double)($xv) * (double)($yv);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm in double precision over a numeric-array column. */
case class VectorL2Norm(child: Expression)
    extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dt = elementType(child)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = toDouble(x, i, dt)
        acc += v * v
      }
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dt = elementType(child)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val xv = CodeGenerator.getValue(a, dt, i)
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = (double)($xv);
         |    $acc += $v * $v;
         |  }
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
