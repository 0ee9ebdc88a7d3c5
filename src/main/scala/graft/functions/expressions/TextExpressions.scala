package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a string-array column.
  *
  * Equivalent to `array_distinct(transform(sequence(1, size-(n-1)),
  * i -> concat_ws(' ', toks[i..i+n-1])))` but as one compiled Scala loop —
  * the interpreted higher-order chain costs ~2 ms/row, which dominates any
  * corpus-scale dedup job. Keeps first-occurrence order (same as
  * `array_distinct`). Documents with fewer than `n` tokens yield an empty
  * array. CodegenFallback: the eval itself is compiled; only whole-stage
  * fusion is broken at this node, which is irrelevant under `explode`.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  // fail at analysis, not with a runtime ClassCastException, when handed
  // raw text instead of a token array (the SQL surface makes this easy)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"word_shingles needs array<string> (tokenized text), got $t")
    }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String](sz * 2)
      var i = 0
      while (i <= sz - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
