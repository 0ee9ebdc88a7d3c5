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

/** Nearest-centroid cell id for a DRIVER-HELD k-means model: per row, the
  * argmin over k cells of the L2 proxy score |c|²−2⟨a,c⟩ (the |a|² term is
  * constant per row and dropped), ties to the lower cell index — bitwise
  * identical to the former `least(struct(score, cid), …)` formulation
  * (same sequential double fold, commuted multiply, same `s − 2·dot`).
  *
  * The model crosses into generated code as REFERENCE OBJECTS
  * (`ctx.addReferenceObj`), not inlined literals. The `least(struct(…))`
  * version embedded each centroid's norm as a primitive literal in the
  * generated source, so every distinct model — every Lloyd pass, every
  * dataset — produced new source and a fresh janino compile (~0.5 s per
  * pass at k=16·dim=64). Here the source is model-independent: one compile
  * for the whole training loop, and the per-row work is a tight k×dim
  * primitive loop instead of k chained struct comparisons. */
case class NearestCentroid(
    child: Expression,
    cids: Array[Int],
    centroids: Array[Array[Double]])
  extends UnaryExpression {
  import VectorExpressions._

  require(cids.length == centroids.length && cids.nonEmpty,
    "nearest_centroid: model must be non-empty with one cid per centroid")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  /** |c|² per cell, same sequential fold the driver used to build the old
    * literal scores. Recomputed lazily per JVM — never serialized. */
  @transient private lazy val norms: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dt = elementType(child)
    val n = x.numElements()
    var best = 0
    var bestScore = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      if (cen.length != n) throw new IllegalArgumentException(
        s"nearest_centroid: dimension mismatch ${cen.length} vs $n")
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i)) dot += cen(i) * toDouble(x, i, dt)
        i += 1
      }
      val score = norms(c) - 2.0 * dot
      if (score < bestScore) { bestScore = score; best = c }
      c += 1
    }
    cids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dt = elementType(child)
      val cen = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val nrm = ctx.addReferenceObj("cnorms", norms, "double[]")
      val cid = ctx.addReferenceObj("cids", cids, "int[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cc = ctx.freshName("cc")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val xv = CodeGenerator.getValue(a, dt, i)
      s"""
         |int $n = $a.numElements();
         |int $best = 0;
         |double $bestScore = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < ${centroids.length}; $c++) {
         |  double[] $cc = $cen[$c];
         |  if ($cc.length != $n) {
         |    throw new IllegalArgumentException(
         |      "nearest_centroid: dimension mismatch " + $cc.length + " vs " + $n);
         |  }
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $dot += $cc[$i] * (double)($xv);
         |    }
         |  }
         |  double $score = $nrm[$c] - 2.0 * $dot;
         |  if ($score < $bestScore) { $bestScore = $score; $best = $c; }
         |}
         |${ev.value} = $cid[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
